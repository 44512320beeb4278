"""Volume <-> point cloud conversion and context-aware sampling.

The core of Point-Unet's stage 2: turn a volume (optionally gated by an
attention map) into a fixed-budget point cloud keeping ALL salient/tumor
voxels and randomly filling with background voxels.

Reference semantics:
  * volume -> points: every voxel with any nonzero modality becomes a point
    with integer coords, per-modality intensities and a label
    (dataPrepareBraTS.py:75-91 — there a pure-Python triple loop; here
    vectorized numpy, ~1000x faster).
  * context-aware sampling: tumor + random background fill to n_points
    (runBraTS.py:105-110, dataPreparePancreas.py:154-169).

Deviations (documented): the reference crashes when foreground exceeds the
budget or background is insufficient; we subsample foreground / duplicate
background (the duplication mirrors DP.data_aug, helper_tool.py:96-107).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class PointCloud(NamedTuple):
    xyz: np.ndarray          # (N, 3) float32, coords normalized by dims
    features: np.ndarray     # (N, C) float32 modality intensities
    labels: np.ndarray       # (N,) int32
    xyz_origin: np.ndarray   # (N, 3) int32 original voxel coords


def volume_to_points(
    modalities: np.ndarray,       # (C, X, Y, Z) normalized intensities
    labels: Optional[np.ndarray] = None,   # (X, Y, Z) int
    mask: Optional[np.ndarray] = None,     # (X, Y, Z) restrict to mask>0
) -> PointCloud:
    """All voxels with any nonzero modality (optionally inside ``mask``)."""
    modalities = np.asarray(modalities, dtype=np.float32)
    nz = (modalities != 0).any(axis=0)
    if mask is not None:
        nz &= np.asarray(mask) > 0
    coords = np.argwhere(nz)                       # (N, 3) int
    dims = np.asarray(modalities.shape[1:], np.float32)
    xyz = coords.astype(np.float32) / dims
    feats = modalities[:, coords[:, 0], coords[:, 1], coords[:, 2]].T
    if labels is None:
        labs = np.zeros(coords.shape[0], np.int32)
    else:
        labs = np.asarray(labels)[
            coords[:, 0], coords[:, 1], coords[:, 2]
        ].astype(np.int32)
    return PointCloud(
        xyz.astype(np.float32),
        np.ascontiguousarray(feats, dtype=np.float32),
        labs,
        coords.astype(np.int32),
    )


def context_aware_sample(
    labels: np.ndarray,
    num_points: int,
    rng: np.random.Generator,
    foreground: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Indices: all foreground + random background fill, shuffled.

    ``foreground`` defaults to labels > 0 (training); pass an attention-mask
    boolean for inference (reference dataPrepareBraTS.py:67-70).
    """
    labels = np.asarray(labels)
    fg_mask = labels > 0 if foreground is None else np.asarray(foreground) > 0
    fg = np.flatnonzero(fg_mask)
    bg = np.flatnonzero(~fg_mask)

    if fg.size >= num_points:
        idx = rng.choice(fg, size=num_points, replace=False)
    else:
        need = num_points - fg.size
        if bg.size >= need:
            fill = rng.choice(bg, size=need, replace=False)
        elif bg.size + fg.size == 0:
            return np.zeros(num_points, np.int64)
        else:
            pool = bg if bg.size else fg
            fill = rng.choice(pool, size=need, replace=True)
        idx = np.concatenate([fg, fill])
    rng.shuffle(idx)
    return idx


def sample_cloud(
    cloud: PointCloud,
    num_points: int,
    rng: np.random.Generator,
    foreground: Optional[np.ndarray] = None,
) -> PointCloud:
    """Context-aware fixed-budget sampling of a full cloud."""
    idx = context_aware_sample(cloud.labels, num_points, rng, foreground)
    return PointCloud(
        cloud.xyz[idx], cloud.features[idx], cloud.labels[idx],
        cloud.xyz_origin[idx],
    )
