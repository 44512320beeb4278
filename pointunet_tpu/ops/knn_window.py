"""Cell-window KNN: gather-free grid search for TPU.

The KD-tree the reference uses (nanoflann via tf.py_func,
PointSegment/helper_tool.py:84-94) is pointer-chasing and host-bound. This
kernel replaces it with a fully-batched, static-shape search built from the
ops TPUs are good at — sort, contiguous DMA, small matmuls, fused partial
reductions:

1. support AND queries are sorted by raster cell id over a density-scaled
   grid (cx*r^2 + cy*r + cz);
2. for a tile of T consecutive sorted queries, the candidates for neighbor
   offset (dx, dy, *) live in ONE contiguous sorted-row window — the three
   dz cells are id-adjacent, so 27 neighbor cells collapse into 9 windows;
3. each window is a batched dynamic_slice (sequential DMA, no random
   gather); squared distances are one batched (T,3)x(3,W) matmul (MXU);
   validity is an exact decoded-coordinate check;
4. per-offset top-k comes from jax.lax.approx_max_k, whose fused reduction
   tracks argmax positions internally — no index gather on the wide axis;
   the 9 per-offset results (9k wide) merge in one final top-k.

All stages are batched over every tile at once: no sequential lax.map, no
long dependency chains, no HBM gathers. Measured on v5e at 365k points,
K=16: ~100x faster than the gather-based grid search and ~3 orders of
magnitude faster than tiled brute force.

Approximation contract (deviation from the reference's exact KD-tree,
documented): neighbors farther than one cell away are missed (cell size
auto-scales with density via ``alpha``), fixed-size windows can truncate
pathologically dense tiles (``slack`` controls headroom), and approx_max_k
trades a little recall for speed. Recall on volumetric clouds measured
> 0.98 (tests/test_knn_window.py). RandLA-Net's attentive pooling averages
over the neighborhood, so near-exact neighbor sets do not move Dice.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .knn import pad_k_columns


def _grid_resolution(n_support: int, alpha: float) -> int:
    r = int(math.ceil(n_support ** (1.0 / 3.0) / alpha))
    return max(r, 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("k", "resolution", "tile", "window"),
)
def _knn_window_impl(
    support: jax.Array,      # (Ns, 3)
    query: jax.Array,        # (Nq, 3)
    k: int,
    resolution: int,
    tile: int,
    window: int,
    support_valid: jax.Array | None = None,  # (Ns,) bool; None = all valid
):
    ns, nq = support.shape[0], query.shape[0]
    # per-axis resolutions: an int means an isotropic grid; a tuple keeps
    # cells cubic over anisotropic boxes (e.g. the x-slab a point-sharded
    # shard sees, ops/knn_sharded.py)
    if isinstance(resolution, int):
        rx = ry = rz = resolution
    else:
        rx, ry, rz = resolution
    ryz = ry * rz
    n_cells = rx * ryz
    rvec = jnp.asarray([rx, ry, rz], jnp.float32)
    rmax = jnp.asarray([rx - 1, ry - 1, rz - 1], jnp.int32)

    if support_valid is None:
        lo = jnp.min(support, axis=0)
        hi = jnp.max(support, axis=0)
    else:
        # invalid rows (e.g. sentinel halo fill in the sharded search)
        # must not warp the grid bbox
        v = support_valid[:, None]
        lo = jnp.min(jnp.where(v, support, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(v, support, -jnp.inf), axis=0)
    span = jnp.maximum(hi - lo, 1e-6)

    def cell_of(pts):
        c = jnp.clip(
            jnp.floor((pts - lo) / span * rvec).astype(jnp.int32), 0, rmax
        )
        return (c[:, 0] * ry + c[:, 1]) * rz + c[:, 2]

    s_ids = cell_of(support)
    if support_valid is not None:
        # same out-of-range id the window padding uses: decoded sx can
        # never equal any query cell + dx, so the row is exactly excluded
        s_ids = jnp.where(support_valid, s_ids, jnp.int32(2147480000))
    s_order = jnp.argsort(s_ids)
    s_ids_sorted = s_ids[s_order]
    s_pts_sorted = support[s_order]

    # cell -> first sorted row via scatter-count + cumsum
    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[s_ids_sorted + 1].add(1)
    cell_start = jnp.cumsum(counts)

    q_ids = cell_of(query)
    q_order = jnp.argsort(q_ids)
    q_ids_sorted = q_ids[q_order]
    q_pts_sorted = query[q_order]

    pad_q = (-nq) % tile
    qp = jnp.pad(q_pts_sorted, ((0, pad_q), (0, 0))).reshape(-1, tile, 3)
    qi = jnp.pad(
        q_ids_sorted, (0, pad_q), constant_values=n_cells - 1
    ).reshape(-1, tile)
    nt = qp.shape[0]

    sp_pad = jnp.pad(s_pts_sorted, ((0, window), (0, 0)))
    si_pad = jnp.pad(
        s_ids_sorted, (0, window), constant_values=jnp.int32(2147480000)
    )

    qz = qi % rz
    qy = (qi // rz) % ry
    qx = qi // ryz
    q_sq = jnp.sum(qp * qp, axis=-1)                    # (nt, T)
    c_lo = qi[:, 0]                                     # (nt,)

    all_negd = []
    all_idx = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            off = dx * ryz + dy * rz
            w0 = cell_start[jnp.clip(c_lo + off - 1, 0, n_cells - 1)]
            rows = jax.vmap(
                lambda s: jax.lax.dynamic_slice(sp_pad, (s, 0), (window, 3))
            )(w0)                                       # (nt, W, 3)
            rsid = jax.vmap(
                lambda s: jax.lax.dynamic_slice(si_pad, (s,), (window,))
            )(w0)                                       # (nt, W)
            sz = rsid % rz
            sy = (rsid // rz) % ry
            sx = rsid // ryz

            negd = 2.0 * jnp.einsum(
                "ntc,nwc->ntw",
                qp,
                rows,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            negd = negd - q_sq[..., None] - jnp.sum(rows * rows, -1)[:, None, :]
            # exact decoded-coordinate validity; pinning (dx, dy) keeps the
            # 9 windows disjoint (no duplicate neighbors after the merge)
            valid = (
                ((sx[:, None, :] - qx[..., None]) == dx)
                & ((sy[:, None, :] - qy[..., None]) == dy)
                & (jnp.abs(sz[:, None, :] - qz[..., None]) <= 1)
            )
            negd = jnp.where(valid, negd, -jnp.inf)

            kk = min(k, window)
            if kk == 1:
                pos = jnp.argmax(negd, axis=-1)[..., None]
                vals = jnp.take_along_axis(negd, pos, axis=-1)
            else:
                # fused partial reduction; positions tracked internally —
                # no wide-axis index gather
                vals, pos = jax.lax.approx_max_k(
                    negd, kk, recall_target=0.95, aggregate_to_topk=True
                )
            all_negd.append(vals)
            all_idx.append(w0[:, None, None] + pos)

    merged_negd = jnp.concatenate(all_negd, axis=-1)    # (nt, T, 9k)
    merged_idx = jnp.concatenate(all_idx, axis=-1)
    if k == 1:
        pos = jnp.argmax(merged_negd, axis=-1)[..., None]
        negd = jnp.take_along_axis(merged_negd, pos, axis=-1)
    else:
        negd, pos = jax.lax.top_k(merged_negd, k)
    idx = jnp.take_along_axis(merged_idx, pos, axis=-1)

    negd = negd.reshape(-1, k)[:nq]
    idx = idx.reshape(-1, k)[:nq]

    found = jnp.isfinite(negd)
    orig = jnp.where(found, s_order[jnp.clip(idx, 0, ns - 1)], -1)
    # rows with fewer than k in-range candidates backfill with their
    # nearest hit (self for self-KNN)
    first = jnp.where(orig[:, :1] >= 0, orig[:, :1], 0)
    orig = jnp.where(found & (orig >= 0), orig, first)

    # unsort to the caller's query order
    return jnp.zeros_like(orig).at[q_order].set(orig)


def knn_cell_window(
    support: jax.Array,
    query: jax.Array,
    k: int,
    alpha: float = 1.8,
    tile: int = 128,
    slack: float = 4.0,
    support_valid: jax.Array | None = None,
    resolution: int | tuple[int, int, int] | None = None,
) -> jax.Array:
    """Gather-free approximate KNN. Returns (Nq, k) int32 indices.

    Argument order matches the reference DP.knn_search (support first).
    slack 4.0 matches knn_pallas: sized for the voxel-cloud density bound
    (all-voxel tumor regions), where slack 2.0 truncated dense windows.
    ``support_valid`` masks support rows out exactly (sentinel cell id,
    excluded from the grid bbox); ``resolution`` may be a per-axis tuple
    to keep cells cubic over anisotropic boxes — both are used by the
    point-sharded halo search (ops/knn_sharded.py).
    """
    support = support.astype(jnp.float32)
    query = query.astype(jnp.float32)
    ns = int(support.shape[0])
    nq = int(query.shape[0])
    k_req, k = k, min(k, ns)
    if resolution is None:
        resolution = _grid_resolution(ns, alpha)
    n_cells = (
        resolution ** 3
        if isinstance(resolution, int)
        else resolution[0] * resolution[1] * resolution[2]
    )
    tile = min(tile, max(_round_up(nq, 8), 8))
    # expected window rows: the tile's span of support density + 2-cell halo
    per_cell = ns / float(n_cells)
    exp_rows = tile * (ns / max(nq, 1)) + 2.0 * per_cell + 64.0
    window = int(_round_up(int(slack * exp_rows), 128))
    window = min(window, _round_up(ns, 128) + 128)
    return pad_k_columns(
        _knn_window_impl(
            support, query, k, resolution, tile, window, support_valid
        ),
        k_req,
    )
