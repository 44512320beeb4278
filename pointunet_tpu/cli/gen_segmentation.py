"""Convert scattered probability volumes into final nii.gz segmentations.

Parity CLIs for reference utils/genSegmentationBraTS.py (argmax, label
3 -> 4) and utils/genSegmentationPancreas.py (salient channel >= threshold,
only *loop_0.npy processed). Input .npy volumes are (Z, Y, X, C) as written
by run_brats/run_pancreas test mode; output nii.gz volumes are stored
(X, Y, Z) to align with the source modalities (deviation from the
reference's rot90+affine convention, documented).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import nifti


def brats_labels_from_probs(prob_zyxc: np.ndarray) -> np.ndarray:
    """argmax -> 3 -> 4 remap -> (X, Y, Z) (reference
    genSegmentationBraTS.py:67-78)."""
    seg = prob_zyxc.argmax(-1).astype(np.uint8)
    seg[seg == 3] = 4
    return np.transpose(seg, (2, 1, 0))


def pancreas_labels_from_probs(
    prob_zyxc: np.ndarray, threshold: float
) -> np.ndarray:
    """salient channel >= threshold (reference
    genSegmentationPancreas.py:67-77)."""
    seg = (prob_zyxc[..., 1] >= threshold).astype(np.uint8)
    return np.transpose(seg, (2, 1, 0))


def main_brats(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--inPros_path", type=str, required=True)
    parser.add_argument("--outSegment_path", type=str, required=True)
    args = parser.parse_args(argv)
    os.makedirs(args.outSegment_path, exist_ok=True)
    for fname in sorted(os.listdir(args.inPros_path)):
        if not fname.endswith(".npy"):
            continue
        case_id = fname[: -len(".npy")]
        seg = brats_labels_from_probs(
            np.load(os.path.join(args.inPros_path, fname))
        )
        nifti.save(
            seg, os.path.join(args.outSegment_path, f"{case_id}.nii.gz")
        )
        print(f"{case_id}: labels {np.unique(seg)}")


def main_pancreas(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--inPros_path", type=str, required=True)
    parser.add_argument("--outSegment_path", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args(argv)
    os.makedirs(args.outSegment_path, exist_ok=True)
    for fname in sorted(os.listdir(args.inPros_path)):
        # only the first loop contributes (reference
        # genSegmentationPancreas.py:100)
        if not fname.endswith("loop_0.npy"):
            continue
        case_id = fname.split("_loop_")[0]
        seg = pancreas_labels_from_probs(
            np.load(os.path.join(args.inPros_path, fname)), args.threshold
        )
        nifti.save(
            seg, os.path.join(args.outSegment_path, f"{case_id}.nii.gz")
        )
        print(f"{case_id}: {int(seg.sum())} foreground voxels")


if __name__ == "__main__":
    import sys

    if "--pancreas" in sys.argv:
        sys.argv.remove("--pancreas")
        main_pancreas()
    else:
        main_brats()
