"""Halo-exchange KNN over a point-sharded cloud (shard_map + ppermute).

Why this exists: annotating the point dim with a NamedSharding and calling
the dense KNN does NOT scale — the cell-window search opens with a global
``argsort`` over all points, so GSPMD all-gathers the whole cloud onto
every device (measured: dp4xsp2 inserts 80 all-gathers incl. the full
point dim, per-device temp memory 350 MB vs 372 MB unsharded — no win).
This module is the real sequence-parallel path (SURVEY §5.7): no device
ever materializes the full cloud.

Design (TPU-native, ICI-only collectives):

1. contract: the cloud is sorted by x coordinate and sharded contiguously
   along the point axis — each device owns one x-slab of ``n_local`` rows
   (``sort_by_x`` produces the layout; its own cost is O(N) memory in
   3 floats/point, tiny next to KNN temp);
2. each device ``ppermute``s its first/last ``halo`` rows to its x-axis
   neighbors (two ICI neighbor hops, no all-gather). Edge devices fill the
   missing halo via a validity mask: masked rows get the window search's
   out-of-range sentinel cell id, so they are excluded exactly and never
   touch the local grid bbox;
3. each device runs the existing gather-free cell-window KNN
   (ops/knn_window.py) on [left-halo | own slab | right-halo] support with
   its own slab as queries — all static shapes;
4. local indices shift to global sorted-order rows by
   ``axis_index * n_local - halo``; sentinel/backfill rows clamp into the
   own slab, so every returned index is a valid global row.

Approximation contract: exact iff every true k-neighbor of a slab point
lies within ``halo`` sorted rows of the slab boundary. One grid-cell layer
in x holds ~alpha * N^(2/3) points on the uniform-density bound, so the
default halo = slack * alpha * N^(2/3) mirrors the forward-window sizing
(ops/knn_window.py). Recall is asserted on the voxel contract in
tests/test_knn_sharded.py, alongside a per-device memory_analysis
comparison vs the dense path.

Reference parity: replaces DP.knn_search (nanoflann KD-tree,
/root/reference/PointSegment/helper_tool.py:84-94) for clouds too large
for one device — a capability the reference does not have at all.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .knn_window import knn_cell_window, _round_up


def default_halo(n: int, alpha: float = 1.8, slack: float = 4.0) -> int:
    """Rows in one grid-cell x-layer on the density bound, with slack.

    slack 4.0 matches the forward cell-window sizing (ops/knn_pallas.py):
    the on-chip exactness sweep showed 2.0 truncates windows in dense
    all-voxel tumor regions (recall 0.989 there) — a halo sized with the
    same 2.0 would drop true cross-boundary neighbors for shards whose
    edge lands inside such a region."""
    return _round_up(int(slack * alpha * float(n) ** (2.0 / 3.0)) + 128, 128)


def sort_by_x(xyz: jax.Array):
    """Sort a cloud by x; returns (sorted_xyz, order) so callers can map
    sharded-KNN indices back to their own row order via ``order``."""
    order = jnp.argsort(xyz[:, 0])
    return xyz[order], order


def knn_point_sharded(
    xyz_sorted: jax.Array,     # (N, 3) sorted by x, sharded on point axis
    k: int,
    mesh: Mesh,
    axis: str = "point",
    halo: int | None = None,
    alpha: float = 1.8,
) -> jax.Array:
    """Self-KNN of an x-sorted, point-sharded cloud.

    Returns (N, k) int32 global indices (rows of ``xyz_sorted``), sharded
    like the input. No device materializes more than
    ``N/P + 2*halo`` support rows.
    """
    n = int(xyz_sorted.shape[0])
    p = mesh.shape[axis]
    if n % p != 0:
        raise ValueError(f"point count {n} not divisible by mesh axis {p}")
    n_local = n // p
    if halo is None:
        halo = default_halo(n, alpha)
    halo = min(halo, n_local)

    # per-axis grid for the local search: a shard's support box is an
    # x-slab of aspect ~ (slab+2 halos)/p : 1 : 1, and an isotropic grid
    # over it makes x-cells ~p/3x thinner than y/z cells — true neighbors
    # then sit >= 2 x-cells away and the +-1-cell window misses them
    # (measured: recall 0.947 isotropic -> 0.997 cubic on the voxel
    # contract). Choose resolutions so cells are cubic assuming uniform
    # slab widths.
    ns_local = n_local + 2 * halo
    sx = (n_local + 2 * halo) / (n * 1.0)     # slab x-extent, fraction
    c = (ns_local / alpha**3 / max(sx, 1e-6)) ** (1.0 / 3.0)
    res = (
        max(int(math.ceil(c * sx)), 1),
        max(int(math.ceil(c)), 2),
        max(int(math.ceil(c)), 2),
    )

    def local_knn(block):                     # (n_local, 3) per device
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % p) for i in range(p)]
        bwd = [(i, (i - 1) % p) for i in range(p)]
        # receive the left neighbor's tail / right neighbor's head
        left = jax.lax.ppermute(block[-halo:], axis, fwd)
        right = jax.lax.ppermute(block[:halo], axis, bwd)
        support = jnp.concatenate([left, block, right], axis=0)
        # the circular wrap delivers the wrong slab to the edge devices;
        # mask those rows out exactly (sentinel cell id inside the window
        # search — their coordinates never touch the grid bbox)
        ones = jnp.ones((halo,), bool)
        valid = jnp.concatenate(
            [ones & (idx > 0), jnp.ones((n_local,), bool),
             ones & (idx < p - 1)]
        )
        lidx = knn_cell_window(
            support, block, k, alpha=alpha, support_valid=valid,
            resolution=res,
        )
        gidx = lidx + (idx * n_local - halo)
        # halo hits are legitimate rows of the neighbor slab and pass
        # through untouched; only edge-device sentinel hits (possible when
        # a query has < k in-range candidates) can fall outside [0, n)
        gidx = jnp.clip(gidx, 0, n - 1)
        return gidx

    sharded = shard_map(
        local_knn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )
    return sharded(xyz_sorted)
