"""Threshold attention probability maps into binary sampling masks.

Parity CLI for reference utils/genBinaryMap.py (flags --inPros_path
--outBinary_path --threshold, default 0.9): loads per-case .npy probability
maps, takes the salient channel (index 1), thresholds, writes uint8 nii.gz.

Convention note (deviation, documented): this framework stores probability
maps as (X, Y, Z, C) float32 — aligned with the modality volumes — and
writes binary masks in the same (X, Y, Z) orientation, so no rot90/affine
gymnastics are needed downstream (the reference saved [z, y, x] arrays and
compensated with rotated affines, genBinaryMap.py:30-64).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import nifti


def gen_binary_map(prob: np.ndarray, threshold: float) -> np.ndarray:
    """(..., C) probs or (...) salient-prob -> uint8 binary mask."""
    if prob.ndim == 4:
        prob = prob[..., 1]
    return (prob >= threshold).astype(np.uint8)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--inPros_path", type=str, required=True)
    parser.add_argument("--outBinary_path", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=0.9)
    args = parser.parse_args(argv)

    os.makedirs(args.outBinary_path, exist_ok=True)
    for fname in sorted(os.listdir(args.inPros_path)):
        if not fname.endswith(".npy"):
            continue
        case_id = fname[: -len(".npy")]
        prob = np.load(os.path.join(args.inPros_path, fname))
        binary = gen_binary_map(prob, args.threshold)
        nifti.save(
            binary, os.path.join(args.outBinary_path, f"{case_id}.nii.gz")
        )
        print(f"{case_id}: {int(binary.sum())} salient voxels")


if __name__ == "__main__":
    main()
