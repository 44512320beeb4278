"""Volume preprocessing utilities (host-side numpy).

Mirrors reference SaliencyAttention/utils.py and the normalization in
PointSegment/utils/dataPrepareBraTS.py:33-49. These run on the host feeding
the device pipeline; they are cheap relative to the model.
"""
from __future__ import annotations

import numpy as np


def intensity_normalize_nonzero(volume: np.ndarray) -> np.ndarray:
    """Z-score over nonzero voxels; zero voxels stay zero
    (reference dataPrepareBraTS.py:33-49, utils.py:80-91)."""
    volume = np.asarray(volume, dtype=np.float32)
    pixels = volume[volume > 0]
    if pixels.size == 0:
        return np.zeros_like(volume)
    out = (volume - pixels.mean()) / max(float(pixels.std()), 1e-8)
    out[volume == 0] = 0.0
    return out


def intensity_normalize_full(volume: np.ndarray) -> np.ndarray:
    """Z-score over the full volume (Pancreas prep,
    reference dataPreparePancreas.py normalization)."""
    volume = np.asarray(volume, dtype=np.float32)
    return (volume - volume.mean()) / max(float(volume.std()), 1e-8)


def rescale_pancreas_hu(volume: np.ndarray, low=-100.0, high=240.0) -> np.ndarray:
    """Clip HU to [low, high] and scale to [0, 1]
    (reference utils.py:351-360 load_pancreas_img)."""
    v = np.clip(np.asarray(volume, np.float32), low, high)
    return (v - low) / (high - low)


def nonzero_bbox(mask: np.ndarray, margin: int = 5):
    """Bounding box of nonzero voxels with a margin, clipped to the volume
    (reference utils.py:30-60 crop_brain_region)."""
    coords = np.nonzero(mask)
    if coords[0].size == 0:
        return tuple((0, s) for s in mask.shape)
    bbox = []
    for axis, c in enumerate(coords):
        lo = max(int(c.min()) - margin, 0)
        hi = min(int(c.max()) + 1 + margin, mask.shape[axis])
        bbox.append((lo, hi))
    return tuple(bbox)


def crop_brain_region(
    modalities: np.ndarray, label: np.ndarray | None = None, margin: int = 5
):
    """Crop to the brain bbox and z-score each modality over its nonzero
    region. Returns (cropped_mods (C, d, h, w), weight mask, cropped label,
    bbox). Reference utils.py:30-60."""
    modalities = np.asarray(modalities, dtype=np.float32)
    union = (modalities != 0).any(axis=0)
    bbox = nonzero_bbox(union, margin)
    sl = tuple(slice(lo, hi) for lo, hi in bbox)
    cropped = np.stack(
        [intensity_normalize_nonzero(m[sl]) for m in modalities]
    )
    weight = (modalities[(slice(None),) + sl] != 0).any(axis=0).astype(
        np.float32
    )
    lab = None if label is None else np.asarray(label)[sl]
    return cropped, weight, lab, bbox


def extract_roi(volume: np.ndarray, center, patch_size) -> np.ndarray:
    """Extract a zero-padded ROI centered at ``center``
    (reference utils.py:423-452)."""
    patch_size = tuple(patch_size)
    out = np.zeros(patch_size, dtype=volume.dtype)
    src, dst = [], []
    for ax, (c, p, s) in enumerate(zip(center, patch_size, volume.shape)):
        lo = c - p // 2
        src_lo, src_hi = max(lo, 0), min(lo + p, s)
        dst_lo = src_lo - lo
        dst_hi = dst_lo + (src_hi - src_lo)
        src.append(slice(src_lo, src_hi))
        dst.append(slice(dst_lo, dst_hi))
    out[tuple(dst)] = volume[tuple(src)]
    return out


def insert_roi(volume: np.ndarray, patch: np.ndarray, center) -> np.ndarray:
    """Write a patch back at ``center`` (reference utils.py:233-273)."""
    out = volume.copy()
    src, dst = [], []
    for ax, (c, p, s) in enumerate(zip(center, patch.shape, volume.shape)):
        lo = c - p // 2
        dst_lo, dst_hi = max(lo, 0), min(lo + p, s)
        src_lo = dst_lo - lo
        src_hi = src_lo + (dst_hi - dst_lo)
        dst.append(slice(dst_lo, dst_hi))
        src.append(slice(src_lo, src_hi))
    out[tuple(dst)] = patch[tuple(src)]
    return out
