"""Grid-bucketed approximate KNN — the TPU answer to a KD-tree.

Point-Unet's clouds come from voxel grids, so density is near-uniform and a
spatial hash prunes almost all of the brute-force work: bucket the support
points into a regular 3-D grid (sort by cell id), then for each query score
only the points in its 27 neighboring cells (bounded candidates per cell)
and take the top-k. Everything is static-shape: sort + searchsorted +
gathers + one small top-k per query row.

Cost at the BraTS level-0 scale (365k points, K=16): ~432 candidates/query
instead of 365k — a ~800x FLOP reduction over tiled brute force, at
recall@16 > 0.99 for volumetric clouds (see tests/test_knn_grid.py).

Exactness caveat (documented deviation from the reference's exact
nanoflann KD-tree, reference knn_.cxx): neighbors farther than one cell
away or beyond the per-cell candidate cap are missed. ``cell_size`` is
auto-scaled to the cloud density so that the k-NN radius stays inside the
27-cell neighborhood; RandLA-Net's attentive pooling is robust to this
(it averages over a local neighborhood, not exact ranks).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .knn import pad_k_columns


# single source for the cells-per-axis policy shared by all grid variants
from .knn_window import _grid_resolution  # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("k", "resolution", "capacity", "query_block"),
)
def _knn_grid_impl(
    support: jax.Array,      # (Ns, 3)
    query: jax.Array,        # (Nq, 3)
    k: int,
    resolution: int,
    capacity: int,
    query_block: int,
):
    ns = support.shape[0]
    nq = query.shape[0]
    r = resolution

    lo = jnp.min(support, axis=0)
    hi = jnp.max(support, axis=0)
    span = jnp.maximum(hi - lo, 1e-6)

    def cell_coords(pts):
        c = jnp.floor((pts - lo) / span * r).astype(jnp.int32)
        return jnp.clip(c, 0, r - 1)

    sc = cell_coords(support)                              # (Ns, 3)
    s_ids = (sc[:, 0] * r + sc[:, 1]) * r + sc[:, 2]
    order = jnp.argsort(s_ids)
    sorted_ids = s_ids[order]
    sorted_pts = support[order]

    num_cells = r * r * r
    cell_start = jnp.searchsorted(
        sorted_ids, jnp.arange(num_cells + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # 27-neighborhood offsets
    offs = jnp.asarray(
        np.stack(
            np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"),
            -1,
        ).reshape(27, 3),
        jnp.int32,
    )

    n_cand = 27 * capacity
    pad_q = (-nq) % query_block
    q_padded = jnp.pad(query, ((0, pad_q), (0, 0)))
    q_blocks = q_padded.reshape(-1, query_block, 3)

    def per_block(qb):
        qc = cell_coords(qb)                               # (Q, 3)
        ncoords = qc[:, None, :] + offs[None, :, :]        # (Q, 27, 3)
        in_bounds = jnp.all(
            (ncoords >= 0) & (ncoords < r), axis=-1
        )                                                  # (Q, 27)
        ncoords = jnp.clip(ncoords, 0, r - 1)
        nids = (
            ncoords[..., 0] * r + ncoords[..., 1]
        ) * r + ncoords[..., 2]                            # (Q, 27)
        starts = cell_start[nids]                          # (Q, 27)
        ends = cell_start[nids + 1]
        slot = jnp.arange(capacity, dtype=jnp.int32)
        cand = starts[..., None] + slot                    # (Q, 27, C)
        valid = (cand < ends[..., None]) & in_bounds[..., None]
        cand = jnp.where(valid, cand, 0).reshape(-1, n_cand)
        valid = valid.reshape(-1, n_cand)

        cpts = sorted_pts[cand]                            # (Q, n_cand, 3)
        diff = cpts - qb[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(valid, d2, jnp.inf)
        if k == 1:
            # pure min-reduce: no sorting network at all
            pos = jnp.argmin(d2, axis=1, keepdims=True)
            negd = -jnp.take_along_axis(d2, pos, axis=1)
        else:
            # TPU-optimized approximate top-k (bitonic-free); exactness is
            # already bounded by the grid pruning, so the tiny recall loss
            # here is free speed.
            negd, pos = jax.lax.approx_max_k(
                -d2, k, recall_target=0.95, aggregate_to_topk=True
            )
        idx = jnp.take_along_axis(cand, pos, axis=1)
        found = jnp.isfinite(negd)
        out = jnp.where(found, order[idx], -1)
        return out, found

    idx_blocks, found_blocks = jax.lax.map(per_block, q_blocks)
    idx = idx_blocks.reshape(-1, k)[:nq]
    found = found_blocks.reshape(-1, k)[:nq]
    # fallback for rows with < k candidates: repeat the nearest found
    # neighbor (always exists: the query's own cell is never empty when
    # query==support; otherwise clamp to first support point)
    first = jnp.where(idx[:, :1] >= 0, idx[:, :1], 0)
    idx = jnp.where(found & (idx >= 0), idx, first)
    return idx


def knn_grid(
    support: jax.Array,
    query: jax.Array,
    k: int,
    alpha: float = 1.8,
    capacity: int = 16,
    query_block: int = 8192,
) -> jax.Array:
    """Approximate KNN via spatial hashing. Args match ops.knn.knn.

    alpha scales the cell size relative to mean point spacing; larger
    alpha = fewer, fuller cells (more exact, more work).
    """
    support = support.astype(jnp.float32)
    query = query.astype(jnp.float32)
    k_req, k = k, min(k, support.shape[0])
    resolution = _grid_resolution(int(support.shape[0]), alpha)
    query_block = min(query_block, max(int(query.shape[0]), 1))
    return pad_k_columns(
        _knn_grid_impl(
            support, query, k, resolution, capacity, query_block
        ),
        k_req,
    )
