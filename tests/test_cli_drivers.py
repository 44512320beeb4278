"""End-to-end smoke tests for the main reference-parity drivers:
data_prepare_brats -> run_brats (train + test), data_prepare_pancreas ->
run_pancreas, and train_attention flag wiring (trainer stubbed — the real
trainer is covered by test_saliency_unet/test_prefetch)."""
import os

import numpy as np
import pytest

from pointunet_tpu.data import nifti

from util_synthetic import make_brats_case


def test_data_prepare_then_run_brats(tmp_path, rng):
    # ---- stage 2 prep: cases -> point-cloud tree ----
    from pointunet_tpu.cli import data_prepare_brats, run_brats

    data3d = tmp_path / "brats"
    for cid in ("case_001", "case_002"):
        make_brats_case(str(data3d), cid, rng=rng)
    pc_root = tmp_path / "pc"
    data_prepare_brats.main([
        "--data_3D_path", str(data3d),
        "--outPC_path", str(pc_root),
        "--n_point", "512",
    ])
    assert (pc_root / "original_ply" / "case_001.ply").exists()
    assert (pc_root / "input0.01" / "case_001_xyz_origin.npy").exists()

    # ---- stage 3: train one epoch, then test mode ----
    (pc_root / "train.txt").write_text("case_001\n")
    (pc_root / "val.txt").write_text("case_002\n")
    logdir = tmp_path / "logs"
    results = tmp_path / "npy"
    common = [
        "--data_PC_path", str(pc_root),
        "--train_ids", str(pc_root / "train.txt"),
        "--val_ids", str(pc_root / "val.txt"),
        "--logdir", str(logdir),
        "--n_point", "512",
    ]
    run_brats.main(["--mode", "train", "--n_epoch", "1"] + common)
    snaps = logdir / "snapshots"
    assert snaps.exists() and any(snaps.iterdir())

    run_brats.main(
        ["--mode", "test", "--results_path", str(results),
         "--volume_shape", "32", "32", "20"] + common
    )
    out = np.load(results / "case_002.npy")
    assert out.shape == (20, 32, 32, 4)
    assert (logdir / "train_summary.txt").exists()


def test_data_prepare_then_run_pancreas(tmp_path, rng):
    from pointunet_tpu.cli import data_prepare_pancreas, run_pancreas

    ct_dir = tmp_path / "ct"
    lab_dir = tmp_path / "label"
    os.makedirs(ct_dir)
    os.makedirs(lab_dir)
    shape = (24, 24, 16)
    for cid in ("0001", "0002", "0003"):
        vol = rng.uniform(-100, 240, shape).astype(np.float32)
        seg = np.zeros(shape, np.uint8)
        seg[8:16, 8:16, 6:10] = 1
        nifti.save(vol, str(ct_dir / f"PANCREAS_{cid}.nii.gz"))
        nifti.save(seg, str(lab_dir / f"label{cid}.nii.gz"))

    pc_root = tmp_path / "pc"
    data_prepare_pancreas.main([
        "--data_3D_path", str(ct_dir),
        "--label_path", str(lab_dir),
        "--outPC_path", str(pc_root),
        "--n_point", "512",
    ])
    loops = list((pc_root / "original_ply").glob("0001_loop_*.ply"))
    assert len(loops) == 8  # reference: 8 sampling loops per volume

    logdir = tmp_path / "logs"
    results = tmp_path / "res"
    common = [
        "--data_PC_path", str(pc_root),
        "--logdir", str(logdir),
        "--n_point", "512",
        "--fold", "3",  # int("0003") % 4 == 3 -> case 0003 validates
    ]
    run_pancreas.main(["--mode", "train", "--n_epoch", "1"] + common)
    snaps = logdir / "fold3"  # per-fold checkpoint dirs
    assert snaps.exists() and any(snaps.iterdir())

    run_pancreas.main(
        ["--mode", "test", "--results_path", str(results),
         "--data_3D_path", str(ct_dir)] + common
    )
    outs = list(results.glob("0003_loop_0.npy"))
    assert outs, list(results.iterdir())


class _StubTrainer:
    """Records calls; returns deterministic tiny outputs."""

    calls = []

    def __init__(self, cfg, tcfg=None, **kw):
        self.cfg = cfg
        type(self).calls.append(("init",))

    def init_state(self):
        return {"step": np.asarray(0, np.int32)}

    def fit(self, state, batches, eval_records=None, checkpointer=None,
            log=print, max_steps=None, metrics=None):
        type(self).calls.append(("fit",))
        if metrics is not None:
            metrics.log(1, loss=0.5)
        if checkpointer is not None:
            checkpointer.save(state, 1, 0.5)
        return state

    def evaluate(self, state, records, log=print):
        type(self).calls.append(("evaluate", len(records)))
        return 0.5

    def predict_volume(self, state, vol):
        type(self).calls.append(("predict", tuple(vol.shape)))
        return np.zeros(tuple(vol.shape[:3]) + (2,), np.float32)

    def predict_volume_tta(self, state, vol, direction="axial",
                           test_flip=False):
        type(self).calls.append(("predict_tta", direction))
        return self.predict_volume(state, np.asarray(vol))


def test_train_attention_wiring(tmp_path, rng, monkeypatch):
    from pointunet_tpu.cli import train_attention

    _StubTrainer.calls = []
    monkeypatch.setattr(train_attention, "SaliencyTrainer", _StubTrainer)

    basedir = tmp_path / "brats"
    make_brats_case(str(basedir), "case_001", rng=rng)
    logdir = tmp_path / "logs"

    train_attention.main([
        "--dataset", "brats", "--basedir", str(basedir),
        "--logdir", str(logdir), "--max_epoch", "1",
    ])
    assert ("fit",) in _StubTrainer.calls
    # the CLI wires a scalar sink into fit (reference tf.summary parity)
    from pointunet_tpu.core.metrics_sink import read_scalars

    rows = read_scalars(str(logdir / "scalars.jsonl"))
    assert rows and rows[0]["loss"] == 0.5

    # predict path reads the checkpoint the stub's fit saved
    maps = tmp_path / "maps"
    train_attention.main([
        "--dataset", "brats", "--basedir", str(basedir),
        "--logdir", str(logdir), "--predict",
        "--outPros_path", str(maps),
    ])
    assert any(c[0] == "predict" for c in _StubTrainer.calls)
    out = np.load(maps / "case_001.npy")
    assert out.ndim == 4 and out.shape[-1] == 2
