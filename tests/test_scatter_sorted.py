"""Host-side correctness of the sorted-scatter plan (ops/scatter_sorted.py).

The Pallas kernel itself is validated on-chip (tests/test_tpu_kernels.py
::test_sorted_scatter_add_grad_level0_scale); these tests pin the parts
that decide exactness and run anywhere:

* the per-tile window plan (exact extents + chunk counts + dedup
  thresholds) covers every flat (q, k) row whose index lands in the tile
  EXACTLY once — verified by a direct numpy simulation of the kernel's
  scan against the exact scatter;
* the custom-VJP front end matches jnp.take's gradient on the fallback
  path (CPU / small sizes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.ops.knn_window import _grid_resolution
from pointunet_tpu.ops.scatter_sorted import (
    S_TILE,
    _cells_at_level,
    _plan,
    sorted_gather,
)


def _sorted_contract_cloud(rng, n, k, clustered=False):
    """A cell-sorted cloud + per-query indices drawn from each query's
    27-cell window — the exact invariant the windowed search guarantees."""
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    if clustered:
        m = n // 3
        pts[:m] = 0.5 + rng.standard_normal((m, 3)).astype(np.float32) * 0.02
        pts = np.clip(pts, 0.0, 1.0)
    r0 = _grid_resolution(n, 1.8)
    lo = pts.min(0)
    span = np.maximum(pts.max(0) - lo, 1e-6)
    c3 = np.clip(
        np.floor((pts - lo) / span * r0).astype(np.int32), 0, r0 - 1
    )
    ids = (c3[:, 0] * r0 + c3[:, 1]) * r0 + c3[:, 2]
    order = np.argsort(ids, kind="stable")
    pts, c3, ids = pts[order], c3[order], ids[order]

    # row ranges per cell, then neighbors sampled from the 27-window
    starts = np.searchsorted(ids, np.arange(r0 * r0 * r0 + 1))
    idx = np.zeros((n, k), np.int64)
    for q in range(n):
        cand = []
        cq = c3[q]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = cq[0] + dx, cq[1] + dy
                if not (0 <= cx < r0 and 0 <= cy < r0):
                    continue
                z0 = max(cq[2] - 1, 0)
                z1 = min(cq[2] + 1, r0 - 1)
                base = (cx * r0 + cy) * r0
                cand.append(
                    np.arange(starts[base + z0], starts[base + z1 + 1])
                )
        cand = np.concatenate(cand)
        idx[q] = rng.choice(cand, size=k, replace=True)
    return pts, ids, idx, lo, span, r0


def _simulate_kernel_scan(w0, nc, thr, idx_flat, ct_flat, ns, chunk):
    """Numpy replica of the kernel's chunked scan: per tile, per window,
    per chunk — lanes below the window-relative threshold are skipped,
    matches accumulate."""
    nqk, c = ct_flat.shape
    pad = np.full((w0.max() + nc.max() * chunk + chunk,), -1, np.int64)
    idx_pad = np.concatenate([idx_flat, pad])
    grad = np.zeros((ns, c), np.float64)
    nt = w0.shape[0]
    for t in range(nt):
        rlo, rhi = t * S_TILE, min((t + 1) * S_TILE, ns)
        for g in range(w0.shape[1]):
            for cj in range(nc[t, g]):
                base = w0[t, g] + cj * chunk
                for lane in range(chunk):
                    if cj * chunk + lane < thr[t, g]:
                        continue           # covered by a previous window
                    p = base + lane
                    if p >= nqk:
                        continue
                    j = idx_pad[p]
                    if rlo <= j < rhi:
                        grad[j] += ct_flat[p]
    return grad


@pytest.mark.parametrize("clustered", [False, True])
def test_plan_scan_matches_exact_scatter(rng, clustered):
    n, k, c, chunk = 4096, 4, 3, 256
    pts, ids, idx, lo, span, r0 = _sorted_contract_cloud(
        rng, n, k, clustered
    )
    r = r0
    v = r * r * r
    counts = np.zeros(v + 1, np.int64)
    np.add.at(counts, ids + 1, 1)
    q_cell_start = np.cumsum(counts)

    nt = (n + S_TILE - 1) // S_TILE
    w0, nc, thr = jax.tree_util.tree_map(
        np.asarray,
        _plan(
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(q_cell_start, jnp.int32),
            nt, r, k, chunk,
        ),
    )

    ct = rng.standard_normal((n * k, c))
    got = _simulate_kernel_scan(w0, nc, thr, idx.reshape(-1), ct, n, chunk)
    want = np.zeros((n, c))
    np.add.at(want, idx.reshape(-1), ct)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_sorted_gather_vjp_matches_take(rng):
    n, k, c = 2048, 4, 5
    pts, ids, idx, lo, span, r0 = _sorted_contract_cloud(rng, n, k)
    table = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    idx_j = jnp.asarray(idx, jnp.int32)
    pts_j = jnp.asarray(pts)
    lo_j, span_j = jnp.asarray(lo), jnp.asarray(span)
    ct = jnp.asarray(rng.standard_normal((n, k, c)), jnp.float32)

    out, vjp = jax.vjp(
        lambda t: sorted_gather(
            t, idx_j, pts_j, pts_j, lo_j, span_j, r0, 0
        ),
        table,
    )
    ref_out, ref_vjp = jax.vjp(
        lambda t: jnp.take(t, idx_j, axis=0), table
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_allclose(
        np.asarray(vjp(ct)[0]), np.asarray(ref_vjp(ct)[0]), rtol=1e-6
    )


def test_cells_at_level_matches_pyramid_shift(rng):
    n = 3000
    pts = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    r0 = _grid_resolution(n, 1.8)
    lo = jnp.min(pts, axis=0)
    span = jnp.maximum(jnp.max(pts, axis=0) - lo, 1e-6)
    c3 = jnp.clip(
        jnp.floor((pts - lo) / span * r0).astype(jnp.int32), 0, r0 - 1
    )
    for level in (0, 1, 2):
        cc = c3 >> level
        r = ((r0 - 1) >> level) + 1
        want = (cc[:, 0] * r + cc[:, 1]) * r + cc[:, 2]
        got, r_got = _cells_at_level(pts, lo, span, r0, level)
        assert r_got == r
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
