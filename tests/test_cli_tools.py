"""Tests for the remaining offline tools: cvt_ct, kfold, fold_cv, overlays."""
import os
import pickle

import numpy as np

from pointunet_tpu.cli.cvt_ct import convert_case
from pointunet_tpu.cli.fold_cv_report import main as fold_cv_main
from pointunet_tpu.cli.generate_kfold import make_folds
from pointunet_tpu.cli.oversampling_analysis import dilation_over_truth
from pointunet_tpu.cli.visualize import save_colored_cloud, save_slice_overlays
from pointunet_tpu.data import nifti, read_ply, write_ply


def test_cvt_ct_resamples_z(tmp_path, rng):
    ct = rng.uniform(-500, 500, (16, 16, 10)).astype(np.float32)
    img = nifti.Nifti1Image(ct, spacing=(1.0, 1.0, 2.5))
    path = str(tmp_path / "PANCREAS_0001.nii.gz")
    nifti.save(img, path)
    loaded = nifti.load(path)
    assert abs(loaded.spacing[2] - 2.5) < 1e-6

    out_ct, out_seg, out_spacing = convert_case(
        path, None, slice_thickness=1.0
    )
    # z axis (first array axis after transpose) scaled by 2.5x
    assert out_ct.shape[0] == 25
    assert out_ct.max() <= 240.0 and out_ct.min() >= -100.0
    assert out_seg is None
    assert out_spacing == (1.0, 1.0, 1.0)  # resampled voxel size survives


def test_make_folds_partition():
    cases = [f"case{i}" for i in range(23)]
    folds = make_folds(cases, 5, seed=1)
    all_members = [c for m in folds.values() for c in m]
    assert sorted(all_members) == sorted(cases)
    sizes = [len(m) for m in folds.values()]
    assert max(sizes) - min(sizes) <= 1


def test_dilation_over_truth():
    pred = np.zeros((10, 10, 10), np.uint8)
    pred[4:6, 4:6, 4:6] = 1
    truth = np.zeros_like(pred)
    truth[8, 8, 8] = 1
    out = dilation_over_truth(pred, truth)
    assert out[8, 8, 8]                  # truth unioned in
    assert out[3, 4, 4]                  # dilated by one voxel
    assert out.sum() > pred.sum()


def test_fold_cv_report(tmp_path, capsys, rng):
    pred_dir = tmp_path / "pred"; pred_dir.mkdir()
    orig_dir = tmp_path / "orig"; orig_dir.mkdir()
    n = 100
    xyz = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.uint8)
    write_ply(str(orig_dir / "c1.ply"), (xyz, labels), ["x", "y", "z", "class"])
    write_ply(str(pred_dir / "c1.ply"), (xyz, labels), ["x", "y", "z", "pred"])
    fold_cv_main(
        ["--pred_path", str(pred_dir), "--original_path", str(orig_dir)]
    )
    out = capsys.readouterr().out
    assert "eval accuracy: 1.0000" in out
    assert "mean IOU: 1.0000" in out


def test_save_colored_cloud(tmp_path, rng):
    xyz = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 50)
    path = str(tmp_path / "cloud.ply")
    save_colored_cloud(path, xyz, labels, num_classes=4)
    data = read_ply(path)
    assert len(data) == 50
    assert {"red", "green", "blue"} <= set(data.dtype.names)


def test_save_slice_overlays(tmp_path, rng):
    vol = rng.uniform(0, 1, (12, 12, 4)).astype(np.float32)
    truth = np.zeros((12, 12, 4), np.int32)
    truth[4:8, 4:8, :] = 2
    save_slice_overlays(vol, truth, truth, str(tmp_path / "ov"), stride=2)
    files = sorted(os.listdir(tmp_path / "ov"))
    assert files == ["slice_000.png", "slice_002.png"]
