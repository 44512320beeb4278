"""Pallas KNN kernel semantics on CPU via TPU interpret mode.

The default suite never executes the Pallas kernel itself (off-TPU,
``knn_pallas`` falls back to ``knn_cell_window``); the on-chip validation
lives in tests/test_tpu_kernels.py (-m tpu). This module closes the gap
for CI: ``pltpu.force_tpu_interpret_mode()`` emulates the kernel's DMAs,
semaphores, and VMEM scoreboard op-by-op on CPU, so the packed-key
min-extraction logic (ops/knn_pallas.py::_kernel_factory) is exercised —
including the value-carried knockout sweep — without a chip.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from pointunet_tpu.ops.knn_pallas import _knn_pallas_impl
from pointunet_tpu.ops.knn_window import _grid_resolution
from util_synthetic import distance_recall


def _params(ns, nq, k, alpha=1.8, tile=128, slack=4.0):
    """Mirror of knn_pallas()'s window sizing (kept in sync by this test
    failing if the entry point's policy drifts incompatibly)."""
    resolution = _grid_resolution(ns, alpha)
    per_cell = ns / float(resolution**3)
    exp_rows = tile * (ns / max(nq, 1)) + 2.0 * per_cell + 64.0
    window = 1 << max(7, math.ceil(math.log2(max(slack * exp_rows, 128))))
    window = min(window, 1 << math.ceil(math.log2(max(ns, 128))))
    return resolution, tile, window


@pytest.mark.parametrize("k", [1, 16])
def test_kernel_interpret_recall_voxel_cloud(rng, k):
    coords = np.unique(rng.integers(0, 20, (2000, 3)), axis=0)
    pts = (coords[rng.permutation(len(coords))[:512]] / 20.0).astype(
        np.float32
    )
    resolution, tile, window = _params(512, 512, k)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            _knn_pallas_impl(
                jnp.asarray(pts), jnp.asarray(pts), k, resolution, tile,
                window,
            )
        )
    assert got.shape == (512, k)
    assert got.min() >= 0 and got.max() < 512
    rec = distance_recall(pts, pts, k, got)
    assert rec > 0.97, (k, rec)


def test_kernel_interpret_density_split(rng):
    """Dual-launch path: a mixed dense-blob + sparse-background cloud at
    nt >= 8 and window > 512 exercises BOTH predicated kernels (the
    narrow 9-window board for sparse tiles, the full-width board for
    dense ones) and the per-tile class routing
    (ops/knn_pallas.py::_knn_pallas_impl)."""
    k = 8
    dense = rng.integers(0, 4, (400, 3)).astype(np.float32) + 30.0
    bg = rng.integers(0, 64, (880, 3)).astype(np.float32)
    pts = np.concatenate([dense, bg], 0) / 64.0
    rng.shuffle(pts)
    n = len(pts)                                   # 1280 -> nt = 10
    resolution, tile, window = _params(n, n, k)
    assert window > 512, "cloud too small to trigger the split"
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            _knn_pallas_impl(
                jnp.asarray(pts), jnp.asarray(pts), k, resolution, tile,
                window,
            )
        )
    assert got.shape == (n, k)
    assert got.min() >= 0 and got.max() < n
    rec = distance_recall(pts, pts, k, got)
    assert rec > 0.97, rec
