"""Sliding-window (overlapping-tile) volumetric inference.

Replaces the reference's host loop that fed one window at a time to the GPU
(reference SaliencyAttention/eval.py:103-193 overlapping_inference, strides
xstep=48, ystep=zstep=118): here the whole tiling is ONE jit — a lax.scan
over the static window-position list with dynamic-slice accumulation, so
XLA pipelines the model over windows without host round-trips.

Numerics match the reference: windows extending past the volume see
zero-padding, accumulated probabilities are divided by the per-voxel cover
count, and only the valid region is returned.
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_positions(size: int, patch: int, step: int) -> np.ndarray:
    """Start offsets along one axis (reference eval.py:141-143)."""
    return np.arange(0, max(1, size - patch + step), step)


def sliding_window_inference(
    volume: jax.Array,                     # (D, H, W, C_in)
    model_fn: Callable[[jax.Array], jax.Array],  # (1, pd, ph, pw, C_in) -> (1, ..., C_out)
    patch: Sequence[int],
    steps: Sequence[int],
    num_classes: int,
) -> jax.Array:
    """Averaged per-voxel class scores (D, H, W, C_out)."""
    d, h, w, _ = volume.shape
    pd, ph, pw = patch
    pos = [
        window_positions(s, p, st)
        for s, p, st in zip((d, h, w), patch, steps)
    ]
    grid = np.stack(
        np.meshgrid(*pos, indexing="ij"), axis=-1
    ).reshape(-1, 3)

    pad_d = int(pos[0].max()) + pd
    pad_h = int(pos[1].max()) + ph
    pad_w = int(pos[2].max()) + pw
    padded = jnp.zeros((pad_d, pad_h, pad_w, volume.shape[-1]), volume.dtype)
    padded = jax.lax.dynamic_update_slice(padded, volume, (0, 0, 0, 0))

    def body(carry, start):
        acc, count = carry
        window = jax.lax.dynamic_slice(
            padded,
            (start[0], start[1], start[2], 0),
            (pd, ph, pw, volume.shape[-1]),
        )
        pred = model_fn(window[None])[0].astype(jnp.float32)
        acc_patch = jax.lax.dynamic_slice(
            acc, (start[0], start[1], start[2], 0), (pd, ph, pw, num_classes)
        )
        acc = jax.lax.dynamic_update_slice(
            acc, acc_patch + pred, (start[0], start[1], start[2], 0)
        )
        cnt_patch = jax.lax.dynamic_slice(
            count, (start[0], start[1], start[2]), (pd, ph, pw)
        )
        count = jax.lax.dynamic_update_slice(
            count, cnt_patch + 1.0, (start[0], start[1], start[2])
        )
        return (acc, count), None

    acc0 = jnp.zeros((pad_d, pad_h, pad_w, num_classes), jnp.float32)
    cnt0 = jnp.zeros((pad_d, pad_h, pad_w), jnp.float32)
    (acc, count), _ = jax.lax.scan(
        body, (acc0, cnt0), jnp.asarray(grid, jnp.int32)
    )
    out = acc / jnp.maximum(count[..., None], 1.0)
    return out[:d, :h, :w]
