"""Random 3-D patch sampling for saliency-net training.

Mirrors reference SaliencyAttention/data_sampler.py: random PATCH_SIZE
crops (sampler3d, data_sampler.py:169-214) and the custom BatchData
positivity policies (data_sampler.py:68-101):

  random       — any crops
  one_positive — at least one crop per batch contains tumor
  all_positive — every crop contains tumor

Volumes are (C, D, H, W) channels-first on the host; emitted batches are
channels-last (B, D, H, W, C) ready for the flax conv nets.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np

from .volume import extract_roi


class VolumeRecord:
    """One training case: modalities + weight + label, [z, y, x] layout."""

    def __init__(self, image: np.ndarray, weight: np.ndarray, label: np.ndarray):
        self.image = np.asarray(image, np.float32)     # (C, D, H, W)
        self.weight = np.asarray(weight, np.float32)   # (D, H, W)
        self.label = np.asarray(label, np.int32)       # (D, H, W)


# direction -> (D, H, W) axis permutation (reference utils.py:80-103
# transpose_volumes, applied to every training sample inside sampler3d,
# data_sampler.py:174-198 — this is how the sagittal/coronal models of the
# MULTI_VIEW ensemble are trained)
_DIRECTION_PERM = {
    "axial": (0, 1, 2),
    "sagittal": (2, 0, 1),
    "coronal": (1, 0, 2),
}


def transpose_record(record: VolumeRecord, direction: str) -> VolumeRecord:
    """View-transposed copy of a record for direction-specific training."""
    perm = _DIRECTION_PERM[direction]
    if perm == (0, 1, 2):
        return record
    return VolumeRecord(
        np.ascontiguousarray(
            np.transpose(record.image, (0,) + tuple(p + 1 for p in perm))
        ),
        np.ascontiguousarray(np.transpose(record.weight, perm)),
        np.ascontiguousarray(np.transpose(record.label, perm)),
    )


def random_patch(
    record: VolumeRecord,
    patch_size: Sequence[int],
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random center crop; volume smaller than the patch is zero-padded
    (reference get_random_roi_sampling_center, utils.py:390-421)."""
    shape = record.label.shape
    center = []
    for s, p in zip(shape, patch_size):
        if s <= p:
            center.append(s // 2)
        else:
            center.append(int(rng.integers(p // 2, s - p + p // 2 + 1)))
    img = np.stack(
        [extract_roi(c, center, patch_size) for c in record.image]
    )
    weight = extract_roi(record.weight, center, patch_size)
    label = extract_roi(record.label, center, patch_size)
    return img, weight, label


def patch_batches(
    records: List[VolumeRecord],
    patch_size: Sequence[int],
    batch_size: int,
    rng: np.random.Generator,
    sampling: str = "one_positive",
    max_resample: int = 25,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Infinite iterator of (B, D, H, W, C) image, (B, D, H, W) weight/label."""
    if not records:
        raise ValueError("no records")
    while True:
        imgs, weights, labels = [], [], []
        batch_has_positive = False
        for b in range(batch_size):
            rec = records[int(rng.integers(len(records)))]
            img, w, lab = random_patch(rec, patch_size, rng)
            need_positive = sampling == "all_positive" or (
                sampling == "one_positive"
                and b == batch_size - 1
                and not batch_has_positive
            )
            tries = 0
            while need_positive and lab.max() <= 0 and tries < max_resample:
                rec = records[int(rng.integers(len(records)))]
                img, w, lab = random_patch(rec, patch_size, rng)
                tries += 1
            batch_has_positive |= lab.max() > 0
            imgs.append(np.moveaxis(img, 0, -1))
            weights.append(w)
            labels.append(lab)
        yield (
            np.stack(imgs),
            np.stack(weights),
            np.stack(labels),
        )


def mixup_batches(batch_iter, num_classes: int, rng, alpha: float = 0.2):
    """Beta-mixup over consecutive patch batches (reference utils.py:511-541):
    images mix linearly; labels become mixed one-hot targets."""
    prev = None
    for images, weights, labels in batch_iter:
        onehot = np.eye(num_classes, dtype=np.float32)[labels]
        if prev is None:
            prev = (images, weights, onehot)
            continue
        lam = float(rng.beta(alpha, alpha))
        pi, pw, po = prev
        yield (
            lam * images + (1 - lam) * pi,
            np.maximum(weights, pw),
            lam * onehot + (1 - lam) * po,
        )
        prev = (images, weights, onehot)
