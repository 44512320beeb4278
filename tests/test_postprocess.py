"""Postprocessing unit tests (pipeline/postprocess.py).

Covers the reference-mirrored BraTS cleanup (SaliencyAttention/eval.py:20-55:
closing + largest-1-or-2 components + small-ET suppression) and the CT
analog for pancreas. Host-side scipy; no device needed.
"""
import numpy as np

from pointunet_tpu.pipeline.postprocess import (
    fill_holes,
    largest_components,
    postprocess_brats,
    postprocess_pancreas,
)


def _blob(shape, lo, hi, value=1):
    out = np.zeros(shape, np.uint8)
    out[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = value
    return out


def test_largest_components_keeps_two_when_comparable():
    m = _blob((48, 48, 48), (2, 2, 2), (12, 12, 12))
    m |= _blob((48, 48, 48), (30, 30, 30), (39, 39, 39))   # ~73% of first
    out = largest_components(m, keep=2, min_ratio=0.1)
    assert out[5, 5, 5] and out[35, 35, 35]


def test_largest_components_drops_tiny_second():
    m = _blob((48, 48, 48), (2, 2, 2), (20, 20, 20))
    m[40, 40, 40] = 1                                      # single voxel
    out = largest_components(m, keep=2, min_ratio=0.1)
    assert out[5, 5, 5] and not out[40, 40, 40]


def test_postprocess_brats_removes_satellites_and_small_et():
    lab = _blob((64, 64, 64), (10, 10, 10), (30, 30, 30), value=2)
    lab[15:18, 15:18, 15:18] = 4                           # 27 vox ET < 100
    lab[55, 55, 55] = 2                                    # satellite island
    out = postprocess_brats(lab)
    assert out[55, 55, 55] == 0                            # island dropped
    assert (out == 4).sum() == 0                           # tiny ET -> 1
    assert (out[15:18, 15:18, 15:18] == 1).all()
    assert out[12, 12, 12] == 2                            # main mass kept


def test_postprocess_brats_keeps_large_et():
    lab = _blob((64, 64, 64), (10, 10, 10), (30, 30, 30), value=2)
    lab[12:22, 12:22, 12:22] = 4                           # 1000 vox ET
    out = postprocess_brats(lab)
    assert (out == 4).sum() == 1000


def test_postprocess_pancreas_fills_and_keeps_largest():
    lab = _blob((40, 40, 40), (10, 10, 10), (20, 20, 20))
    lab[15, 15, 15] = 0                                    # interior hole
    lab[35, 35, 35] = 1                                    # island
    out = postprocess_pancreas(lab)
    assert out[15, 15, 15] == 1 and out[35, 35, 35] == 0
    assert out[12, 12, 12] == 1


def test_fill_holes_noop_on_solid():
    m = _blob((16, 16, 16), (4, 4, 4), (12, 12, 12))
    assert (fill_holes(m) == (m > 0)).all()
