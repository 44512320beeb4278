"""Glue-tool CLI tests: binary map, segmentation conversion, evaluation."""
import os

import numpy as np

from pointunet_tpu.cli.evaluation import evaluate_brats, evaluate_pancreas
from pointunet_tpu.cli.gen_binary_map import main as gen_binary_main
from pointunet_tpu.cli.gen_segmentation import main_brats, main_pancreas
from pointunet_tpu.data import nifti


def test_gen_binary_map_cli(tmp_path, rng):
    probs_dir = tmp_path / "probs"
    out_dir = tmp_path / "binary"
    probs_dir.mkdir()
    prob = rng.uniform(size=(8, 8, 6, 2)).astype(np.float32)
    prob[2:4, 2:4, 2:4, 1] = 0.95
    np.save(str(probs_dir / "case1.npy"), prob)

    gen_binary_main(
        [
            "--inPros_path", str(probs_dir),
            "--outBinary_path", str(out_dir),
            "--threshold", "0.9",
        ]
    )
    mask = nifti.load(str(out_dir / "case1.nii.gz")).get_fdata()
    assert mask.shape == (8, 8, 6)
    expected = (prob[..., 1] >= 0.9).sum()
    assert mask.sum() == expected


def test_gen_segmentation_brats(tmp_path):
    probs_dir = tmp_path / "npy"
    out_dir = tmp_path / "nii"
    probs_dir.mkdir()
    # (Z, Y, X, C) with class 3 winning at one voxel
    prob = np.zeros((5, 6, 7, 4), np.float32)
    prob[..., 0] = 0.9
    prob[2, 3, 4] = [0.0, 0.0, 0.0, 1.0]
    np.save(str(probs_dir / "caseA.npy"), prob)
    main_brats(
        ["--inPros_path", str(probs_dir), "--outSegment_path", str(out_dir)]
    )
    seg = nifti.load(str(out_dir / "caseA.nii.gz")).get_fdata()
    assert seg.shape == (7, 6, 5)      # transposed to (X, Y, Z)
    assert seg[4, 3, 2] == 4           # label 3 -> 4 remap
    assert seg.sum() == 4


def test_gen_segmentation_pancreas_only_loop0(tmp_path):
    probs_dir = tmp_path / "npy"
    out_dir = tmp_path / "nii"
    probs_dir.mkdir()
    prob = np.zeros((4, 4, 4, 2), np.float32)
    prob[1:3, 1:3, 1:3, 1] = 0.8
    np.save(str(probs_dir / "0001_loop_0.npy"), prob)
    np.save(str(probs_dir / "0001_loop_1.npy"), prob)
    main_pancreas(
        [
            "--inPros_path", str(probs_dir),
            "--outSegment_path", str(out_dir),
            "--threshold", "0.5",
        ]
    )
    files = sorted(os.listdir(out_dir))
    assert files == ["0001.nii.gz"]
    seg = nifti.load(str(out_dir / "0001.nii.gz")).get_fdata()
    assert seg.sum() == 8


def test_evaluate_brats_roundtrip(tmp_path):
    truth_dir = tmp_path / "truth" / "caseX"
    pred_dir = tmp_path / "pred"
    truth_dir.mkdir(parents=True)
    pred_dir.mkdir()
    seg = np.zeros((10, 10, 8), np.uint8)
    seg[2:6, 2:6, 2:5] = 2
    seg[3:5, 3:5, 3:4] = 4
    nifti.save(seg, str(truth_dir / "caseX_seg.nii.gz"))
    nifti.save(seg, str(pred_dir / "caseX.nii.gz"))
    means = evaluate_brats(
        str(tmp_path / "truth"), str(pred_dir),
        str(tmp_path / "report.csv"), with_hd95=True,
    )
    assert means["WT"] == 1.0 and means["TC"] == 1.0 and means["ET"] == 1.0
    assert means["HD95_WT"] == 0.0
    assert os.path.exists(tmp_path / "report.csv")


def test_evaluate_pancreas(tmp_path):
    truth_dir = tmp_path / "truth"
    pred_dir = tmp_path / "pred"
    truth_dir.mkdir(); pred_dir.mkdir()
    seg = np.zeros((8, 8, 8), np.uint8)
    seg[2:5, 2:5, 2:5] = 1
    nifti.save(seg, str(truth_dir / "label0001.nii.gz"))
    pred = seg.copy()
    pred[2] = 0  # drop one slab
    nifti.save(pred, str(pred_dir / "0001.nii.gz"))
    mean = evaluate_pancreas(
        str(truth_dir), str(pred_dir), str(tmp_path / "r.csv")
    )
    assert 0.5 < mean < 1.0
