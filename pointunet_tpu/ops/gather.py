"""Point-cloud gather/pool primitives.

TPU-native replacements for the reference's tf.batch_gather-based helpers
(reference PointSegment/RandLANet.py:345-386). All operate on unbatched
arrays; use jax.vmap for a batch axis. Shapes are static, which lets XLA
lower the gathers to efficient dynamic-gather HLO and fuse the surrounding
elementwise work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_neighbour(features: jax.Array, neighbor_idx: jax.Array) -> jax.Array:
    """Gather neighbor features. (N, d), (M, K) -> (M, K, d).

    Analog of Network.gather_neighbour (reference RandLANet.py:377-386).
    """
    return jnp.take(features, neighbor_idx, axis=0)


def max_pool_neighbours(features: jax.Array, pool_idx: jax.Array) -> jax.Array:
    """Max over K gathered neighbors. (N, d), (M, K) -> (M, d).

    Analog of Network.random_sample (reference RandLANet.py:345-360): the
    "random" part is that pool_idx rows correspond to a random subset of
    points (the input cloud is pre-shuffled and sliced).
    """
    gathered = jnp.take(features, pool_idx, axis=0)  # (M, K, d)
    return jnp.max(gathered, axis=1)


def nearest_interpolation(features: jax.Array, interp_idx: jax.Array) -> jax.Array:
    """1-NN upsampling gather. (N, d), (M,) or (M, 1) -> (M, d).

    Analog of Network.nearest_interpolation (reference RandLANet.py:362-375).
    """
    idx = interp_idx.reshape(-1)
    return jnp.take(features, idx, axis=0)


def relative_pos_encoding(xyz: jax.Array, neigh_idx: jax.Array) -> jax.Array:
    """Local spatial encoding: (N, 3), (N, K) -> (N, K, 10).

    Concat of [distance, relative_xyz, tiled_xyz, neighbor_xyz]
    (reference RandLANet.py:337-343).
    """
    neighbor_xyz = gather_neighbour(xyz, neigh_idx)          # (N, K, 3)
    return encode_neighbor_xyz(xyz, neighbor_xyz)


def encode_neighbor_xyz(xyz: jax.Array, neighbor_xyz: jax.Array) -> jax.Array:
    """The encode half of relative_pos_encoding, on pre-gathered neighbor
    coords: (N, 3), (N, K, 3) -> (N, K, 10).

    Split out so callers that already gathered neighbor rows (e.g. the LFA
    block's combined [xyz | feature] gather) pay the per-row gather cost
    once — on TPU the cost is ~6 ns/row regardless of row width, so one
    wide gather beats two narrow ones outright.
    """
    xyz_tile = jnp.broadcast_to(
        xyz[:, None, :], neighbor_xyz.shape
    )                                                        # (N, K, 3)
    relative_xyz = xyz_tile - neighbor_xyz
    relative_dis = jnp.sqrt(
        jnp.sum(relative_xyz * relative_xyz, axis=-1, keepdims=True)
    )
    return jnp.concatenate(
        [relative_dis, relative_xyz, xyz_tile, neighbor_xyz], axis=-1
    )
