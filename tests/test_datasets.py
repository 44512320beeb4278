import os

import numpy as np

from pointunet_tpu.core import brats_pointseg_config, pancreas_pointseg_config
from pointunet_tpu.data.datasets import BraTSPointDataset, PancreasPointDataset
from pointunet_tpu.data import write_ply

from util_synthetic import make_point_tree


def test_brats_dataset_iteration(tmp_path, rng):
    root = make_point_tree(str(tmp_path), ["case_a", "case_b", "case_c"], rng=rng)
    cfg = brats_pointseg_config(num_points=512)
    ds = BraTSPointDataset(
        root, train_ids=["case_a", "case_b"], val_ids=["case_c"], config=cfg
    )
    assert ds.num_train() == 2 and ds.num_val() == 1

    batches = list(ds.train_iter())
    assert len(batches) == 2
    xyz, feats, labels = batches[0]
    assert xyz.shape == (1, 512, 3)
    assert feats.shape == (1, 512, 7)   # xyz + 4 modalities
    assert labels.shape == (1, 512)
    # all tumor points kept by the context-aware sampler
    np.testing.assert_allclose(feats[0, :, :3], xyz[0])

    tests = list(ds.test_iter())
    name, xyz, feats, labels, origin = tests[0]
    assert name == "case_c"
    assert origin.shape == (512, 3)
    assert origin.dtype == np.int32


def test_pancreas_dataset_fold_split(tmp_path, rng):
    orig = tmp_path / "original_ply"
    sub = tmp_path / "input0.01"
    orig.mkdir(); sub.mkdir()
    cfg = pancreas_pointseg_config(num_points=256)
    for cid in ["0001", "0002", "0003", "0004"]:
        for loop in range(2):
            n = 256
            xyz = rng.uniform(0, 1, (n, 3)).astype(np.float32)
            write_ply(
                str(orig / f"{cid}_loop_{loop}.ply"),
                (
                    xyz,
                    rng.standard_normal((n, 1)).astype(np.float32),
                    rng.integers(0, 2, n).astype(np.uint8),
                ),
                ["x", "y", "z", "value", "class"],
            )
            np.save(
                str(sub / f"{cid}_xyz_origin_loop_{loop}.npy"),
                (xyz * 32).astype(np.uint16),
            )
    ds = PancreasPointDataset(str(tmp_path), fold=3, config=cfg)
    # int("0003") % 4 == 3 -> validation
    assert ds.num_val() == 2
    assert ds.num_train() == 6
    xyz, feats, labels = next(iter(ds.val_iter()))
    assert feats.shape == (1, 256, 4)  # xyz + value
    name, _, _, _, origin = next(iter(ds.test_iter()))
    assert name.startswith("0003_loop_")
    assert origin.shape == (256, 3)
