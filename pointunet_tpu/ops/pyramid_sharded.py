"""Point-sharded pyramid build — the integrated sequence-parallel path.

``build_pyramid`` (ops/pyramid.py) materializes the full cloud and its KNN
search temporaries on every device; at the BraTS contract (365k points,
K=16) the level-0 window search dominates per-device memory. Annotating the
point dim with a NamedSharding does not help — the global sort/argsort makes
GSPMD all-gather the cloud (measured r2: 350 vs 372 MB, no win). This module
shards the WORK of the big levels with ``shard_map`` + ``ppermute`` halo
exchange (the validated kernel design of ops/knn_sharded.py), while keeping
the pyramid's semantics bit-compatible with ``build_pyramid``:

* same fixed level-0 grid, same single cell sort, same ``order`` contract
  (cell-id order is lexicographic in (cx, cy, cz), so a contiguous shard of
  the sorted rows owns a contiguous x-slab of cells — exactly the slab
  layout the halo exchange needs);
* same prefix-rule decimation (original row < N_i/ratio — reference
  runBraTS.py:149 semantics);
* levels below ``shard_min`` run the identical dense search of
  ``build_pyramid`` (they are small; replicating that work is cheaper than
  the halo plumbing).

Per sharded level, each device sees ``N_l/P + 2*halo`` support rows instead
of ``N_l``: the window-search temporaries — the actual memory hog — shrink
by ~P (the query side) while the support side shrinks to slab+halos.

Reference parity: replaces DP.knn_search (nanoflann KD-tree,
/root/reference/PointSegment/helper_tool.py:84-94) inside the input pyramid
(runBraTS.py:137-163) for clouds too large for one device — a capability
the single-GPU reference does not have (SURVEY §5.7).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .knn import knn
from .knn_sharded import default_halo
from .knn_window import _grid_resolution, knn_cell_window
from .pyramid import GRID_THRESHOLD, Pyramid, _level_resolutions, _search_sorted


def _slab_resolution(
    n: int, n_local: int, halo: int, alpha: float
) -> Tuple[int, int, int]:
    """Anisotropic grid keeping cells cubic over a shard's x-slab support
    box (same derivation as ops/knn_sharded.py: an isotropic grid over a
    thin slab makes x-cells ~P/3x thinner than y/z cells and the +-1-cell
    window misses true neighbors)."""
    ns_local = n_local + 2 * halo
    # a multi-hop halo can make the support window larger than the cloud
    # (tiny levels): the support box is then the full cube, not a slab
    sx = min(1.0, ns_local / float(n))
    c = (ns_local / alpha**3 / max(sx, 1e-6)) ** (1.0 / 3.0)
    return (
        max(int(math.ceil(c * sx)), 1),
        max(int(math.ceil(c)), 2),
        max(int(math.ceil(c)), 2),
    )


def _self_knn_sharded(
    xb: jax.Array,            # (B, N, 3) cell-sorted, sharded (data, point)
    k: int,
    mesh: Mesh,
    data_axis: str,
    point_axis: str,
    halo: int,
    alpha: float,
    n_valid: int | None = None,
) -> jax.Array:
    """Halo-exchange self-KNN on the point axis. Returns (B, N, k) int32
    global (sorted-row) indices, sharded like the input.

    ``n_valid``: number of REAL rows when the point axis was padded to
    divisibility (r4, VERDICT item 5) — rows at or past it are copies of
    the last real row, masked out of every support window and clipped out
    of the returned indices."""
    n = int(xb.shape[1])
    p = mesh.shape[point_axis]
    n_local = n // p
    nv = n if n_valid is None else n_valid
    res = _slab_resolution(n, n_local, halo, alpha)
    fwd = [(i, (i + 1) % p) for i in range(p)]
    bwd = [(i, (i - 1) % p) for i in range(p)]
    # r4: a halo larger than one slab (deep levels, or dense-region slack
    # at level 1 of the 365k contract: 14.6k halo vs an 11.4k slab) is
    # fetched over MULTIPLE ppermute hops — the single-hop design silently
    # clamped the halo to the slab and dropped true cross-slab neighbors
    hops = max(1, -(-halo // n_local))

    def local(block):                       # (B_loc, n_local, 3)
        idx = jax.lax.axis_index(point_axis)
        lefts, rights = [], []
        lbuf = rbuf = block
        for _ in range(hops):
            lbuf = jax.lax.ppermute(lbuf, point_axis, fwd)
            rbuf = jax.lax.ppermute(rbuf, point_axis, bwd)
            lefts.append(lbuf)
            rights.append(rbuf)
        left = jnp.concatenate(lefts[::-1], axis=1)[:, -halo:]
        right = jnp.concatenate(rights, axis=1)[:, :halo]
        support = jnp.concatenate([left, block, right], axis=1)
        # circular wrap delivers wrong slabs to edge devices and padding
        # duplicates the last real row: both are masked EXACTLY by the
        # global row index (sentinel cell id inside the window search)
        grow = idx * n_local - halo + jnp.arange(n_local + 2 * halo)
        valid = (grow >= 0) & (grow < nv)
        lidx = jax.vmap(
            lambda s, q: knn_cell_window(
                s, q, k, alpha=alpha, support_valid=valid, resolution=res
            )
        )(support, block)
        # local support rows -> global sorted rows; only edge-device
        # sentinel backfills can leave [0, nv)
        return jnp.clip(lidx + (idx * n_local - halo), 0, nv - 1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(data_axis, point_axis),
        out_specs=P(data_axis, point_axis),
    )(xb)


def _up_sharded(
    qb: jax.Array,            # (B, N, 3) queries, sharded (data, point)
    sb: jax.Array,            # (B, M, 3) decimated support, point-replicated
    mesh: Mesh,
    data_axis: str,
    point_axis: str,
) -> jax.Array:
    """1-NN up-projection with sharded queries and a replicated (small)
    decimated level. Returns (B, N, 1) int32 in sub-level rows."""

    def local(qblock, sblock):
        return jax.vmap(lambda s, q: knn_cell_window(s, q, 1))(sblock, qblock)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, point_axis), P(data_axis)),
        out_specs=P(data_axis, point_axis),
    )(qb, sb)


def build_pyramid_sharded(
    xyz: jax.Array,                   # (B, N, 3)
    k: int,
    ratios: Tuple[int, ...],
    mesh: Mesh,
    *,
    data_axis: str = "data",
    point_axis: str = "point",
    shard_min: int = 32_768,
    alpha: float = 1.8,
) -> Pyramid:
    """Batched pyramid with point-sharded KNN at every level of at least
    ``shard_min`` points (and divisible by the point-axis size). Semantics
    match ``build_pyramid_batch``; only the work placement differs.

    The entry sort and the decimation bookkeeping are global ops on small
    arrays (3 floats + 2 ints per point — ~9 MB at 365k, vs the ~0.5 GB
    window-search temporaries this module shards)."""
    b, n0, _ = xyz.shape
    p = mesh.shape[point_axis]
    dp = mesh.shape[data_axis]
    if b % dp != 0:
        raise ValueError(f"batch {b} not divisible by data axis {dp}")

    rows_sharded = NamedSharding(mesh, P(data_axis, point_axis))

    r0 = _grid_resolution(n0, alpha)
    rs = _level_resolutions(r0, len(ratios))

    xyz = xyz.astype(jnp.float32)
    lo = jnp.min(xyz, axis=1, keepdims=True)
    span = jnp.maximum(jnp.max(xyz, axis=1, keepdims=True) - lo, 1e-6)
    c3 = jnp.clip(
        jnp.floor((xyz - lo) / span * r0).astype(jnp.int32), 0, r0 - 1
    )
    ids0 = (c3[..., 0] * r0 + c3[..., 1]) * r0 + c3[..., 2]
    order = jnp.argsort(ids0, axis=-1).astype(jnp.int32)          # (B, N)

    cur_x = jnp.take_along_axis(xyz, order[..., None], axis=1)
    cur_c3 = jnp.take_along_axis(c3, order[..., None], axis=1)
    cur_ord = order

    def shifted(cells3, lvl):
        s, r = lvl, rs[lvl]
        cc = cells3 >> s
        ids = (cc[..., 0] * r + cc[..., 1]) * r + cc[..., 2]
        return cc, ids

    xyzs, neighs, subs, ups = [], [], [], []
    for i, ratio in enumerate(ratios):
        ns_i = int(cur_x.shape[1])
        n_sub = ns_i // ratio
        lvl_sharded = ns_i >= shard_min
        if lvl_sharded:
            # pad-to-divisible (r4, VERDICT item 5): a level whose row
            # count does not divide the point axis (e.g. 91,250 @ p=8)
            # previously fell back to the dense search. Padding with
            # copies of the LAST row keeps cell-sortedness; the copies
            # are masked out of every support window (n_valid) and their
            # query outputs are sliced off below.
            pad = (-ns_i) % p
            ns_pad = ns_i + pad
            # cap at (p-1) slabs: beyond that the halo IS the rest of the
            # cloud (multi-hop exchange in _self_knn_sharded covers
            # halos larger than one slab)
            halo = min(
                default_halo(ns_i, alpha), ns_pad - ns_pad // p
            )
            if pad:
                cur_xp = jnp.concatenate(
                    [cur_x, jnp.broadcast_to(cur_x[:, -1:], (b, pad, 3))],
                    axis=1,
                )
            else:
                cur_xp = cur_x
            cur_xp = jax.lax.with_sharding_constraint(cur_xp, rows_sharded)
            neigh = _self_knn_sharded(
                cur_xp, k, mesh, data_axis, point_axis, halo, alpha,
                n_valid=ns_i if pad else None,
            )[:, :ns_i]
            if pad == 0:
                cur_x = cur_xp
        elif ns_i <= GRID_THRESHOLD:
            neigh = jax.vmap(lambda x: knn(x, x, k))(cur_x)
        else:
            cc, ids = shifted(cur_c3, i)
            neigh = jax.vmap(
                lambda sp, sc, si: _search_sorted(
                    sp, sc, si, sp, sc, si, k, rs[i]
                )
            )(cur_x, cc, ids)

        # prefix-rule decimation (original row < n_sub); compaction keeps
        # THIS level's sort order, exactly as in build_pyramid
        idx_rel = jax.vmap(
            lambda m: jnp.nonzero(m, size=n_sub, fill_value=0)[0]
        )(cur_ord < n_sub)
        sub_x = jnp.take_along_axis(cur_x, idx_rel[..., None], axis=1)
        sub_c3 = jnp.take_along_axis(cur_c3, idx_rel[..., None], axis=1)
        xyzs.append(cur_x)
        neighs.append(neigh)
        sub_neigh = jnp.take_along_axis(neigh, idx_rel[..., None], axis=1)

        if lvl_sharded:
            up = _up_sharded(
                cur_xp, sub_x, mesh, data_axis, point_axis
            )[:, :ns_i]
        elif ns_i <= GRID_THRESHOLD:
            up = jax.vmap(lambda s, q: knn(s, q, 1))(sub_x, cur_x)
        else:
            # cross-level 1-NN at the PARENT grid — both sides sorted
            # there (raster ids are not monotone under coarsening; see
            # ops/pyramid.py module docstring, r3 correction)
            scc, sids = shifted(sub_c3, i)
            qcc, qids = shifted(cur_c3, i)
            up = jax.vmap(
                lambda sp, sc, si, qp, qc, qi: _search_sorted(
                    sp, sc, si, qp, qc, qi, 1, rs[i]
                )
            )(sub_x, scc, sids, cur_x, qcc, qids)

        # re-sort the decimated level by its OWN grid's ids (bit-compatible
        # with build_pyramid's r3 ordering) and remap up values
        _, sids_next = shifted(sub_c3, i + 1)
        s_sort = jnp.argsort(sids_next, axis=-1, stable=True).astype(
            jnp.int32
        )
        inv = jax.vmap(
            lambda s: jnp.zeros((n_sub,), jnp.int32).at[s].set(
                jnp.arange(n_sub, dtype=jnp.int32)
            )
        )(s_sort)
        subs.append(jnp.take_along_axis(sub_neigh, s_sort[..., None], axis=1))
        ups.append(jnp.take_along_axis(inv, up[..., 0], axis=1)[..., None])
        cur_x = jnp.take_along_axis(sub_x, s_sort[..., None], axis=1)
        cur_c3 = jnp.take_along_axis(sub_c3, s_sort[..., None], axis=1)
        cur_ord = jnp.take_along_axis(
            jnp.take_along_axis(cur_ord, idx_rel, axis=1), s_sort, axis=1
        )

    xyzs.append(cur_x)
    return Pyramid(tuple(xyzs), tuple(neighs), tuple(subs), tuple(ups), order)
