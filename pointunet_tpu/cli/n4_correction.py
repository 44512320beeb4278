"""N4 bias-field correction over BraTS modalities.

Parity CLI for reference SaliencyAttention/preprocess.py:11-71, which shells
out to ANTs' N4BiasFieldCorrection for every modality except flair/seg.
This port does the same when the ANTs binary is present; without it, it
falls back to a polynomial (order-3) log-domain bias fit — a lightweight
approximation adequate for already-curated BraTS data — or skips with
--skip_without_ants.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess

import numpy as np

from ..data import nifti

CORRECT = ("t1ce", "t1", "t2")   # reference skips flair and seg


def polynomial_bias_correct(volume: np.ndarray, order: int = 3) -> np.ndarray:
    """Fit a low-order polynomial to log intensities over the foreground
    and divide it out."""
    vol = np.asarray(volume, np.float32)
    mask = vol > 0
    if mask.sum() < 100:
        return vol
    coords = np.argwhere(mask).astype(np.float32)
    coords = coords / np.asarray(vol.shape, np.float32) - 0.5
    logv = np.log(vol[mask] + 1e-3)

    feats = [np.ones(len(coords), np.float32)]
    for o in range(1, order + 1):
        for ax in range(3):
            feats.append(coords[:, ax] ** o)
    a = np.stack(feats, axis=1)
    coef, *_ = np.linalg.lstsq(a, logv, rcond=None)
    # remove the smooth field but keep the global mean (coef[0])
    field = a[:, 1:] @ coef[1:]
    corrected = np.exp(logv - field)
    out = vol.copy()
    out[mask] = corrected
    return out


def correct_file(in_path: str, out_path: str, use_ants: bool) -> str:
    if use_ants:
        subprocess.run(
            ["N4BiasFieldCorrection", "-i", in_path, "-o", out_path],
            check=True,
        )
        return "ants"
    img = nifti.load(in_path)
    nifti.save(
        nifti.Nifti1Image(
            polynomial_bias_correct(img.get_fdata()).astype(np.float32),
            img.affine,
            img.spacing,
        ),
        out_path,
    )
    return "polyfit"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_3D_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--skip_without_ants", action="store_true")
    args = parser.parse_args(argv)

    use_ants = shutil.which("N4BiasFieldCorrection") is not None
    # --skip_without_ants: without ANTs, pass volumes through uncorrected
    # instead of applying the polynomial fallback
    skip_correction = not use_ants and args.skip_without_ants

    from ..data.loader import BRATS_MODALITIES, find_brats_cases

    for case_dir in find_brats_cases(args.data_3D_path):
        case_id = os.path.basename(case_dir)
        out_case = os.path.join(args.out_path, case_id)
        os.makedirs(out_case, exist_ok=True)
        for mod in BRATS_MODALITIES + ("seg",):
            src = os.path.join(case_dir, f"{case_id}_{mod}.nii.gz")
            if not os.path.exists(src):
                continue
            dst = os.path.join(out_case, f"{case_id}_{mod}.nii.gz")
            if mod in CORRECT and not skip_correction:
                how = correct_file(src, dst, use_ants)
                print(f"{case_id}_{mod}: corrected ({how})")
            else:
                shutil.copyfile(src, dst)


if __name__ == "__main__":
    main()
