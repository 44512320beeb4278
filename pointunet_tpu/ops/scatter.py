"""Scattering per-point predictions back into the voxel grid.

Replaces the pure-Python voxel loops in the reference
(testBraTS.py:83-112 point2prod/point2volume) with jit scatters.

Axis convention (matching the reference exactly): point coordinates are
original volume indices (x, y, z) in (X, Y, Z)-shaped modality space; the
output probability volume is indexed [z, y, x] — the reference writes
volume[z][x][y] then moveaxis(1, 2) (testBraTS.py:88-92).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("shape",))
def scatter_probs_to_volume(
    probs: jax.Array,        # (N, C) per-point class probabilities
    xyz: jax.Array,          # (N, 3) int voxel coords in (x, y, z) order
    shape: tuple,            # (Z, Y, X)
) -> jax.Array:
    """Scatter per-point probabilities into a (Z, Y, X, C) volume.

    Duplicate points (the sampler pads with duplicates) resolve by
    last-write-wins, matching the reference's sequential assignment.
    """
    z, y, x = xyz[:, 2], xyz[:, 1], xyz[:, 0]
    vol = jnp.zeros(shape + (probs.shape[-1],), probs.dtype)
    return vol.at[z, y, x].set(probs)


@functools.partial(jax.jit, static_argnames=("shape",))
def scatter_labels_to_volume(
    labels: jax.Array,       # (N,) int predicted labels
    xyz: jax.Array,          # (N, 3) int voxel coords (x, y, z)
    shape: tuple,            # (Z, Y, X)
) -> jax.Array:
    """Scatter per-point labels into a (Z, Y, X) volume (background 0)."""
    z, y, x = xyz[:, 2], xyz[:, 1], xyz[:, 0]
    vol = jnp.zeros(shape, labels.dtype)
    return vol.at[z, y, x].set(labels)
