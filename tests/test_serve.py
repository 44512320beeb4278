"""Persistent serve CLI: drain-once mode on a synthetic inbox."""
import json
import os

import numpy as np

from util_synthetic import make_brats_case


def test_serve_once_drains_inbox(tmp_path, rng):
    from pointunet_tpu.cli import serve
    from pointunet_tpu.data import nifti

    inbox = tmp_path / "in"
    outbox = tmp_path / "out"
    for cid in ("case_101", "case_102"):
        make_brats_case(str(inbox), cid, shape=(32, 32, 16), rng=rng)

    args = [
        "--inbox", str(inbox), "--outbox", str(outbox),
        "--n_point", "1024", "--roi", "16", "16", "16", "--once",
    ]
    served = serve.main(args)
    assert served == 2
    for cid in ("case_101", "case_102"):
        rec = json.loads((outbox / f"{cid}.json").read_text())
        assert rec["case"] == cid and rec["latency_s"] > 0
        img = nifti.load(str(outbox / f"{cid}.nii.gz"))
        labels = np.asarray(img.get_fdata())
        assert labels.shape == (32, 32, 16)
        assert set(np.unique(labels)) <= {0, 1, 2, 4}

    # idempotent: a second drain serves nothing new
    assert serve.main(args) == 0


def test_serve_pancreas_inbox(tmp_path, rng):
    from pointunet_tpu.cli import serve
    from pointunet_tpu.data import nifti
    import numpy as np

    inbox = tmp_path / "in"
    outbox = tmp_path / "out"
    inbox.mkdir()
    ct = rng.uniform(-200, 300, (32, 32, 16)).astype(np.float32)
    nifti.save(ct, str(inbox / "PANCREAS_0001.nii.gz"))

    served = serve.main([
        "--inbox", str(inbox), "--outbox", str(outbox),
        "--dataset", "pancreas", "--n_point", "1024", "--once",
    ])
    assert served == 1
    img = nifti.load(str(outbox / "PANCREAS_0001.nii.gz"))
    assert np.asarray(img.get_fdata()).shape == (32, 32, 16)


def test_serve_contains_per_case_failures(tmp_path, rng):
    """A malformed case (missing modality) must not kill the service or
    block other cases; it is retried up to 3 polls, never recorded."""
    from pointunet_tpu.cli import serve

    inbox = tmp_path / "in"
    outbox = tmp_path / "out"
    make_brats_case(str(inbox), "case_ok", shape=(32, 32, 16), rng=rng)
    bad = inbox / "case_bad"
    bad.mkdir()
    (bad / "case_bad_t1ce.nii.gz").write_bytes(b"not a nifti")

    args = [
        "--inbox", str(inbox), "--outbox", str(outbox),
        "--n_point", "1024", "--roi", "16", "16", "16", "--once",
    ]
    served = serve.main(args)
    assert served == 1
    assert (outbox / "case_ok.json").exists()
    assert not (outbox / "case_bad.json").exists()
