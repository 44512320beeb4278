"""Segmentation postprocessing (host, scipy morphology).

Mirrors reference SaliencyAttention/eval.py:20-55 (ADVANCE_POSTPROCESSING):
binary closing on the whole-tumor mask, keep the largest one or two
connected components, and suppress tiny enhancing-tumor predictions
(< 100 voxels -> relabel to necrotic core), plus the fill-holes used in
segment_one_image (eval.py:355-411).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def fill_holes(mask: np.ndarray) -> np.ndarray:
    return ndimage.binary_fill_holes(mask > 0)


def largest_components(mask: np.ndarray, keep: int = 2, min_ratio: float = 0.1):
    """Keep the largest component, plus the second if it is at least
    ``min_ratio`` of the first (reference eval.py:27-44)."""
    labeled, n = ndimage.label(mask > 0)
    if n == 0:
        return mask > 0
    sizes = ndimage.sum(mask > 0, labeled, range(1, n + 1))
    order = np.argsort(sizes)[::-1]
    out = labeled == (order[0] + 1)
    if keep >= 2 and n > 1 and sizes[order[1]] >= min_ratio * sizes[order[0]]:
        out |= labeled == (order[1] + 1)
    return out


def postprocess_pancreas(labels: np.ndarray) -> np.ndarray:
    """Binary CT cleanup: fill holes, keep the largest component.

    The reference applies NO pancreas postprocessing (its
    utils/genSegmentationPancreas.py is a plain argmax->nii writer);
    this is the CT analog of the BraTS cleanup below — the pancreas is
    one connected organ, so scattered false-positive islands are pure
    HD95 damage and can be dropped without touching the main mass.
    """
    mask = largest_components(np.asarray(labels) > 0, keep=1)
    return fill_holes(mask).astype(np.uint8)


def postprocess_brats(labels: np.ndarray, et_min_voxels: int = 100) -> np.ndarray:
    """Full BraTS cleanup on a label volume with original labels {0,1,2,4}."""
    labels = np.asarray(labels).copy()
    wt = labels > 0
    wt = ndimage.binary_closing(wt)
    wt = largest_components(wt, keep=2)
    labels[~wt] = 0
    # enhancing tumor too small -> it is probably necrosis (eval.py:46-55)
    et = labels == 4
    if 0 < et.sum() < et_min_voxels:
        labels[et] = 1
    return labels
