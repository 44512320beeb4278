"""Multi-level point pyramid construction — the input-graph work of the
reference's tf_map (reference PointSegment/runBraTS.py:137-163) done in one
jit on device.

Per level i (num_layers levels):
  * neigh_idx[i] : self-KNN (N_i, K) on the level's points
  * sub_points   : first N_i // ratio[i] points (input is pre-shuffled, so
                   slicing is random decimation — reference runBraTS.py:149)
  * pool_idx[i]  : neigh_idx rows of the kept points (N_{i+1}, K)
  * up_idx[i]    : 1-NN of every level-i point in the decimated set (N_i, 1),
                   used by the decoder's nearest interpolation.

All shapes derive from (num_points, ratios) and are static.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .knn import knn
from .knn_window import knn_cell_window

# Above this support size, use the cell-window grid search: a fused Pallas
# kernel on TPU (ops/knn_pallas.py), the batched XLA formulation elsewhere
# (ops/knn_window.py). Brute force is O(Ns * Nq); the windowed grid is
# HBM-bandwidth bound — at the BraTS scale the difference between seconds
# and milliseconds per volume.
GRID_THRESHOLD = 16_384


def _search(support, query, k, exact):
    if exact or support.shape[0] <= GRID_THRESHOLD:
        return knn(support, query, k)
    import jax

    if jax.default_backend() == "tpu":
        from .knn_pallas import knn_pallas

        return knn_pallas(support, query, k)
    return knn_cell_window(support, query, k)


class Pyramid(NamedTuple):
    xyz: Tuple[jax.Array, ...]        # (N_i, 3) per level
    neigh_idx: Tuple[jax.Array, ...]  # (N_i, K)
    sub_idx: Tuple[jax.Array, ...]    # (N_{i+1}, K)
    interp_idx: Tuple[jax.Array, ...] # (N_i, 1)


@functools.partial(jax.jit, static_argnames=("k", "ratios", "exact"))
def build_pyramid(
    xyz: jax.Array, k: int, ratios: Tuple[int, ...], exact: bool = False
) -> Pyramid:
    """Build the decimation pyramid for one (pre-shuffled) cloud (N, 3).

    exact=True forces tiled brute-force KNN at every level (testing /
    parity studies); the default uses grid-bucketed search for levels
    above GRID_THRESHOLD points.
    """
    xyzs, neighs, subs, ups = [], [], [], []
    cur = xyz.astype(jnp.float32)
    for i, r in enumerate(ratios):
        n_sub = cur.shape[0] // r
        if n_sub < 1:
            import math

            raise ValueError(
                f"num_points={xyz.shape[0]} empties the pyramid at level "
                f"{i} (ratios {tuple(ratios)}); need at least "
                f"{math.prod(ratios)} points"
            )
        neigh = _search(cur, cur, k, exact)
        sub_points = cur[:n_sub]
        xyzs.append(cur)
        neighs.append(neigh)
        subs.append(neigh[:n_sub])
        ups.append(_search(sub_points, cur, 1, exact))
        cur = sub_points
    return Pyramid(tuple(xyzs), tuple(neighs), tuple(subs), tuple(ups))


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
