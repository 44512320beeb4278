"""Spatial and channel-wise 3D attention gates.

Re-designs of reference SaliencyAttention/attention.py:79-174. Layout is
channels-last (B, D, H, W, C) throughout; separable large-kernel convs map
well onto XLA's conv tiling.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .fastconv import FastConv
from .norms import NormRelu

_CONV_INIT = nn.initializers.glorot_uniform()


class SpatialAttention3D(nn.Module):
    """Three separable k=9 conv pairs summed -> sigmoid -> broadcast over C
    (reference attention.py:79-154)."""

    channels: int            # C of the input (gate is tiled to this)
    instance_norm: bool = True
    axis_name: Optional[str] = None
    kernel: int = 9
    dtype: object = None
    # broadcast=False returns the raw (B, D, H, W, 1) gate instead of
    # tiling it over C — used by the strided-gate perf mode, where the
    # gate is computed at reduced resolution and resized before the
    # multiply (tiling first would resize C times the data)
    broadcast: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        c = self.channels

        def branch(pair_a, pair_b):
            h = FastConv(
                c // 2, pair_a, padding="SAME", kernel_init=_CONV_INIT,
                dtype=self.dtype,
            )(x)
            h = NormRelu(
                self.instance_norm, dtype=self.dtype,
                axis_name=self.axis_name,
            )(h, train)
            h = FastConv(
                1, pair_b, padding="SAME", kernel_init=_CONV_INIT,
                dtype=self.dtype,
            )(h)
            return NormRelu(
                self.instance_norm, dtype=self.dtype,
                axis_name=self.axis_name,
            )(h, train)

        a1 = branch((1, k, k), (k, 1, 1))
        a2 = branch((k, 1, k), (1, k, 1))
        a3 = branch((k, k, 1), (1, 1, k))
        gate = nn.sigmoid(a1 + a2 + a3)                     # (B, D, H, W, 1)
        if not self.broadcast:
            return gate
        return jnp.broadcast_to(gate, x.shape[:-1] + (c,))


class ChannelWiseAttention3D(nn.Module):
    """GAP -> dense(C/4, relu) -> dense(C, sigmoid) -> multiply
    (reference attention.py:166-174)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        att = jnp.mean(x, axis=(1, 2, 3))                  # (B, C)
        att = nn.relu(nn.Dense(c // 4, kernel_init=_CONV_INIT)(att))
        att = nn.sigmoid(nn.Dense(c, kernel_init=_CONV_INIT)(att))
        return x * att[:, None, None, None, :]


class SpatialAttention2D(nn.Module):
    """2-D variant: two separable k=9 branches summed -> sigmoid gate tiled
    over C (reference attention.py:53-67; unused by the 3-D pipeline but
    part of the reference layer surface)."""

    channels: int
    kernel: int = 9
    instance_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, c = self.kernel, self.channels

        def branch(pair_a, pair_b):
            h = nn.Conv(c // 2, pair_a, padding="SAME",
                        kernel_init=_CONV_INIT)(x)
            h = NormRelu(self.instance_norm)(h, train)
            h = nn.Conv(1, pair_b, padding="SAME", kernel_init=_CONV_INIT)(h)
            return NormRelu(self.instance_norm)(h, train)

        a1 = branch((1, k), (k, 1))
        a2 = branch((k, 1), (1, k))
        gate = nn.sigmoid(a1 + a2)                          # (B, H, W, 1)
        return jnp.broadcast_to(gate, x.shape[:-1] + (c,))


class ChannelWiseAttention2D(nn.Module):
    """2-D channel gate (reference attention.py:69-77)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        att = jnp.mean(x, axis=(1, 2))                      # (B, C)
        att = nn.relu(nn.Dense(c // 4, kernel_init=_CONV_INIT)(att))
        att = nn.sigmoid(nn.Dense(c, kernel_init=_CONV_INIT)(att))
        return x * att[:, None, None, :]
