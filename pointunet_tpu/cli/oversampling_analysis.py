"""Size the point budget: max |dilate(pred) OR truth| over a dataset.

Parity CLI for reference PointSegment/utils/over_sampling.py:58-101 — an
offline analysis that dilates each predicted binary map, unions it with
ground truth, and reports the largest voxel count (the safe --n_point for
context-aware sampling).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy import ndimage

from ..data import nifti


def dilation_over_truth(pred: np.ndarray, truth: np.ndarray) -> np.ndarray:
    pred = ndimage.binary_dilation(pred > 0)
    return np.logical_or(pred, truth > 0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pred_path", type=str, required=True,
                        help="dir of predicted binary nii.gz maps")
    parser.add_argument("--truth_path", type=str, required=True,
                        help="dir of ground-truth label nii.gz volumes")
    parser.add_argument("--dilations", type=int, default=1)
    args = parser.parse_args(argv)

    n_point = 0
    worst = None
    for fname in sorted(os.listdir(args.truth_path)):
        if ".nii" not in fname:
            continue
        case_id = fname.replace("label", "").split(".nii")[0]
        pred_file = os.path.join(
            args.pred_path, f"PANCREAS_{case_id}.nii.gz"
        )
        if not os.path.exists(pred_file):
            pred_file = os.path.join(args.pred_path, f"{case_id}.nii.gz")
        if not os.path.exists(pred_file):
            print(f"skip {fname}: no prediction")
            continue
        pred = nifti.load(pred_file).get_fdata()
        truth = nifti.load(os.path.join(args.truth_path, fname)).get_fdata()
        mask = pred > 0
        for _ in range(args.dilations):
            mask = ndimage.binary_dilation(mask)
        mask = np.logical_or(mask, truth > 0)
        n = int(mask.sum())
        if n > n_point:
            n_point, worst = n, case_id
            print(f"{case_id}: {n}")
    print(f"max point budget: {n_point} (case {worst})")


if __name__ == "__main__":
    main()
