"""Evaluation metrics: Dice, IoU, HD95, BraTS composite regions.

Mirrors the reference's scattered metric code in one place:
  * IoU from confusion matrices — reference helper_tool.py:145-170 and the
    eval loop RandLANet.py:208-264;
  * binary / per-class Dice — reference testBraTS.py:19-29,
    testPancreas.py:19-26;
  * WT/TC/ET decomposition — reference utils/evaluationBraTS.py:28-36
    (WT = labels {1,2,4}, TC = {1,4}, ET = {4});
  * HD95 — listed in the reference README results (README.md:212-223) but
    never computed in its code; implemented here via scipy EDT.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def confusion_matrix(
    labels: np.ndarray, preds: np.ndarray, num_classes: int
) -> np.ndarray:
    """(C, C) with rows = truth, cols = prediction."""
    labels = np.asarray(labels).reshape(-1)
    preds = np.asarray(preds).reshape(-1)
    idx = labels * num_classes + preds
    return np.bincount(idx, minlength=num_classes * num_classes).reshape(
        num_classes, num_classes
    )


def iou_from_confusion(conf: np.ndarray) -> np.ndarray:
    """Per-class IoU from a (..., C, C) confusion stack
    (reference DP.IoU_from_confusions, helper_tool.py:145-170)."""
    conf = np.asarray(conf, dtype=np.float64)
    tp = np.diagonal(conf, axis1=-2, axis2=-1)
    tp_fn = conf.sum(axis=-1)
    tp_fp = conf.sum(axis=-2)
    iou = tp / (tp_fp + tp_fn - tp + 1e-6)
    mask = tp_fn < 1e-3
    counts = np.sum(1 - mask, axis=-1, keepdims=True)
    miou = np.sum(iou, axis=-1, keepdims=True) / (counts + 1e-6)
    return iou + mask * miou


def mean_iou(labels, preds, num_classes: int) -> float:
    conf = confusion_matrix(labels, preds, num_classes)
    tp = np.diagonal(conf).astype(np.float64)
    denom = conf.sum(0) + conf.sum(1) - tp
    return float(np.mean(tp / np.maximum(denom, 1e-6)))


def binary_dice(pred: np.ndarray, truth: np.ndarray) -> float:
    """2|A∩B| / (|A|+|B|); returns 1.0 when both are empty
    (reference testPancreas.py:19-26)."""
    pred = np.asarray(pred) > 0
    truth = np.asarray(truth) > 0
    denom = pred.sum() + truth.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * np.logical_and(pred, truth).sum() / denom)


def per_class_dice(
    pred: np.ndarray, truth: np.ndarray, num_classes: int
) -> np.ndarray:
    return np.asarray(
        [binary_dice(pred == c, truth == c) for c in range(num_classes)]
    )


# BraTS composite tumor regions over ORIGINAL labels {0, 1, 2, 4}
# (reference evaluationBraTS.py:28-36).
_BRATS_REGIONS = {
    "WT": (1, 2, 4),
    "TC": (1, 4),
    "ET": (4,),
}


def brats_region_dice(pred: np.ndarray, truth: np.ndarray) -> Dict[str, float]:
    """WT/TC/ET Dice over original BraTS labels (4 = enhancing)."""
    out = {}
    for name, labs in _BRATS_REGIONS.items():
        p = np.isin(pred, labs)
        t = np.isin(truth, labs)
        out[name] = binary_dice(p, t)
    return out


def hausdorff95(pred: np.ndarray, truth: np.ndarray, spacing=None) -> float:
    """95th-percentile symmetric surface distance via distance transforms.

    Returns 0.0 if both masks empty, inf if exactly one is empty (the BraTS
    convention).
    """
    from scipy import ndimage

    pred = np.asarray(pred) > 0
    truth = np.asarray(truth) > 0
    if not pred.any() and not truth.any():
        return 0.0
    if not pred.any() or not truth.any():
        return float("inf")

    def surface(mask):
        eroded = ndimage.binary_erosion(mask)
        return mask & ~eroded

    sp = surface(pred)
    st = surface(truth)
    dt_truth = ndimage.distance_transform_edt(~st, sampling=spacing)
    dt_pred = ndimage.distance_transform_edt(~sp, sampling=spacing)
    d_pred_to_truth = dt_truth[sp]
    d_truth_to_pred = dt_pred[st]
    all_d = np.concatenate([d_pred_to_truth, d_truth_to_pred])
    return float(np.percentile(all_d, 95))


def brats_region_hd95(pred: np.ndarray, truth: np.ndarray) -> Dict[str, float]:
    out = {}
    for name, labs in _BRATS_REGIONS.items():
        out[name] = hausdorff95(np.isin(pred, labs), np.isin(truth, labs))
    return out
