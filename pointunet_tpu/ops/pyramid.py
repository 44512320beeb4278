"""Multi-level point pyramid construction — the input-graph work of the
reference's tf_map (reference PointSegment/runBraTS.py:137-163) done in one
jit on device.

Per level i (num_layers levels):
  * neigh_idx[i] : self-KNN (N_i, K) on the level's points
  * sub_points   : the level's points whose ORIGINAL row index is below
                   N_i // ratio[i] (the input is pre-shuffled, so this is
                   the same random decimation as the reference's prefix
                   slice, runBraTS.py:149)
  * pool_idx[i]  : neigh_idx rows of the kept points (N_{i+1}, K)
  * up_idx[i]    : 1-NN of every level-i point in the decimated set (N_i, 1),
                   used by the decoder's nearest interpolation.

All shapes derive from (num_points, ratios) and are static.

SORTED-PYRAMID CONTRACT (TPU-first redesign, r2; ordering corrected r3):
every level is stored in raster-cell-id order of ITS OWN grid (the level-0
resolution halved per level). The r2 design assumed one level-0 sort
serves all levels ("lexicographic order at the fine grid is sorted at
every coarser grid too") — that holds for Morton codes but NOT for raster
ids: (cx=0, cy=39) < (cx=1, cy=0) at the fine grid maps to (0, 19) > (0, 0)
at the half grid. Measured on a 65k uniform cloud the compacted level-1
ids had 264 order inversions — which silently shrank the Pallas search
windows at levels >= 1 (tile extents read the first/last id of each tile)
and would have dropped gradient in the sorted scatter kernel
(ops/scatter_sorted.py, whose on-chip exactness test exposed this). The
corrected build re-sorts each decimated level by its next grid's ids
(levels are 4-16x smaller than level 0, so the extra argsorts are cheap),
and the 1-NN up search runs at the PARENT level's grid, where both sides
are naturally sorted. The permutation is returned as ``Pyramid.order``
(sorted row -> original row): row-aligned per-point arrays (features,
labels, voxel origins) must be gathered with it — ``arr[pyramid.order]``
— before being zipped with pyramid indices. Decimation picks the same
random subset as before (original rows < N_{l+1}); only the STORAGE order
changed.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .knn import knn
from .knn_window import _grid_resolution, _round_up, knn_cell_window

# Above this support size, use the cell-window grid search: a fused Pallas
# kernel on TPU (ops/knn_pallas.py), the batched XLA formulation elsewhere
# (ops/knn_window.py). Brute force is O(Ns * Nq); the windowed grid is
# HBM-bandwidth bound — at the BraTS scale the difference between seconds
# and milliseconds per volume.
GRID_THRESHOLD = 16_384


class Pyramid(NamedTuple):
    xyz: Tuple[jax.Array, ...]        # (N_i, 3) per level, cell-sorted —
                                      #   num_layers + 1 entries (the last
                                      #   is the bottleneck level's coords)
    neigh_idx: Tuple[jax.Array, ...]  # (N_i, K)   level-i row space
    sub_idx: Tuple[jax.Array, ...]    # (N_{i+1}, K) values in level-i rows
    interp_idx: Tuple[jax.Array, ...] # (N_i, 1)   values in level-(i+1) rows
    order: jax.Array                  # (N_0,) sorted row -> original row


def _level_resolutions(r0: int, n_levels: int) -> Tuple[int, ...]:
    """Per-level grid: halve the level-0 resolution each level so cell
    coordinates coarsen by bit shift (cells_l = cells_0 >> l) and one
    lex sort covers every level."""
    return tuple(max(((r0 - 1) >> l) + 1, 1) for l in range(n_levels + 1))


def _search_sorted(
    sp, sc3_shifted, s_ids, qp, qc3_shifted, q_ids, k, r, slack=4.0
):
    """Windowed KNN on pre-sorted clouds (TPU Pallas core; XLA cell-window
    fallback elsewhere, which re-sorts internally — CPU is the test path)."""
    if jax.default_backend() != "tpu":
        return knn_cell_window(sp, qp, k)
    from .knn_pallas import knn_pallas_core

    ns, nq = sp.shape[0], qp.shape[0]
    counts = jnp.zeros((r * r * r + 1,), jnp.int32).at[s_ids + 1].add(1)
    cell_start = jnp.cumsum(counts)
    tile = min(128, max(_round_up(nq, 8), 8))
    per_cell = ns / float(r ** 3)
    exp_rows = tile * (ns / max(nq, 1)) + 2.0 * per_cell + 64.0
    window = 1 << max(7, math.ceil(math.log2(max(slack * exp_rows, 128))))
    window = min(window, 1 << math.ceil(math.log2(max(ns, 128))))
    return knn_pallas_core(
        sp, sc3_shifted, cell_start, qp, qc3_shifted, q_ids,
        k, r, tile, window,
    )


@functools.partial(jax.jit, static_argnames=("k", "ratios", "exact"))
def build_pyramid(
    xyz: jax.Array, k: int, ratios: Tuple[int, ...], exact: bool = False
) -> Pyramid:
    """Build the decimation pyramid for one (pre-shuffled) cloud (N, 3).

    exact=True forces tiled brute-force KNN at every level (testing /
    parity studies); the default uses grid-bucketed search for levels
    above GRID_THRESHOLD points. Levels are returned cell-sorted — see
    the module docstring for the ``order`` contract.
    """
    n = xyz.shape[0]
    for i, r_ in enumerate(ratios):
        n //= r_
        if n < 1:
            raise ValueError(
                f"num_points={xyz.shape[0]} empties the pyramid at level "
                f"{i} (ratios {tuple(ratios)}); need at least "
                f"{math.prod(ratios)} points"
            )

    n0 = xyz.shape[0]
    r0 = _grid_resolution(n0, 1.8)
    rs = _level_resolutions(r0, len(ratios))

    xyz = xyz.astype(jnp.float32)
    lo = jnp.min(xyz, axis=0)
    span = jnp.maximum(jnp.max(xyz, axis=0) - lo, 1e-6)
    c3 = jnp.clip(
        jnp.floor((xyz - lo) / span * r0).astype(jnp.int32), 0, r0 - 1
    )
    ids0 = (c3[:, 0] * r0 + c3[:, 1]) * r0 + c3[:, 2]
    order = jnp.argsort(ids0).astype(jnp.int32)

    cur_x = xyz[order]
    cur_c3 = c3[order]
    cur_ord = order

    def shifted(cells3, lvl):
        s, r = lvl, rs[lvl]
        cc = cells3 >> s
        ids = (cc[:, 0] * r + cc[:, 1]) * r + cc[:, 2]
        return cc, ids

    xyzs, neighs, subs, ups = [], [], [], []
    for i, ratio in enumerate(ratios):
        ns_i = cur_x.shape[0]
        n_sub = ns_i // ratio
        if exact or ns_i <= GRID_THRESHOLD:
            neigh = knn(cur_x, cur_x, k)
        else:
            cc, ids = shifted(cur_c3, i)
            neigh = _search_sorted(
                cur_x, cc, ids, cur_x, cc, ids, k, rs[i]
            )
        # decimation: the kept subset is "original row < n_sub" — the same
        # random prefix as the reference; compaction keeps THIS level's
        # sort order (the re-sort to the next grid happens below)
        idx_rel = jnp.nonzero(cur_ord < n_sub, size=n_sub, fill_value=0)[0]
        sub_x = cur_x[idx_rel]
        sub_c3 = cur_c3[idx_rel]
        xyzs.append(cur_x)
        neighs.append(neigh)
        sub_neigh = neigh[idx_rel]
        if exact or ns_i <= GRID_THRESHOLD:
            up = knn(sub_x, cur_x, 1)
        else:
            # cross-level 1-NN at the PARENT level's grid: the compacted
            # sub cloud and the queries are both sorted there (raster ids
            # are NOT monotone under coarsening — see module docstring)
            scc, sids = shifted(sub_c3, i)
            qcc, qids = shifted(cur_c3, i)
            up = _search_sorted(
                sub_x, scc, sids, cur_x, qcc, qids, 1, rs[i]
            )
        # re-sort the decimated level by its OWN grid's ids so the next
        # level's search (and the gather-VJP reverse windows) see sorted
        # cells; up values are remapped into the re-sorted row space
        _, sids_next = shifted(sub_c3, i + 1)
        s_sort = jnp.argsort(sids_next, stable=True).astype(jnp.int32)
        inv = jnp.zeros((n_sub,), jnp.int32).at[s_sort].set(
            jnp.arange(n_sub, dtype=jnp.int32)
        )
        subs.append(sub_neigh[s_sort])
        ups.append(inv[up])
        cur_x = sub_x[s_sort]
        cur_c3 = sub_c3[s_sort]
        cur_ord = cur_ord[idx_rel][s_sort]
    # bottleneck coords: levels are no longer prefixes of each other, so
    # the model can't slice them out of the parent level
    xyzs.append(cur_x)
    return Pyramid(tuple(xyzs), tuple(neighs), tuple(subs), tuple(ups), order)


def build_pyramid_batch(
    xyz: jax.Array, k: int, ratios: Tuple[int, ...], exact: bool = False
) -> Pyramid:
    """Batched pyramid build: (B, N, 3) -> Pyramid with leading batch dims.

    B == 1 bypasses vmap: batching the sort/scatter plumbing around the
    Pallas KNN costs ~134 ms/volume at the BraTS scale (measured v5e,
    347 ms vmapped vs 213 ms plain), and batch 1 is the inference path.
    """
    if xyz.shape[0] == 1:
        p = build_pyramid(xyz[0], k, ratios, exact)
        return jax.tree_util.tree_map(lambda a: a[None], p)
    return jax.vmap(lambda x: build_pyramid(x, k, ratios, exact))(xyz)


def take_level0(pyramid: Pyramid, *arrays):
    """Gather row-aligned per-point arrays into the pyramid's level-0
    (cell-sorted) order: ``arr[pyramid.order]``, batched if needed."""
    order = pyramid.order
    if order.ndim == 2:   # batched pyramid
        out = tuple(
            jnp.take_along_axis(
                a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
            )
            for a in arrays
        )
    else:
        out = tuple(a[order] for a in arrays)
    return out if len(out) != 1 else out[0]
