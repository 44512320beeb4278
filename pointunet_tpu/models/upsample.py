"""Volumetric upsampling utilities.

``bilinear_upsample_3d`` reimplements the reference's functional
BilinearUpsampling3D (reference SaliencyAttention/bilinear_upsampling.py:
130-141): a stride-k conv3d_transpose with a constant-ones (k,k,k,C,C)
filter followed by a ones/k^3 smoothing conv. Note the reference's ones
filters intentionally sum over channels (each output channel receives the
channel-sum), which we reproduce exactly. Dormant in the reference (all
call sites are commented, model.py:245-279) but part of its layer surface.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_upsample_3d(x: jax.Array, scale: int) -> jax.Array:
    """(B, D, H, W, C) -> (B, D*s, H*s, W*s, C), reference semantics.

    Equivalent closed form of ones-deconv + mean-smoothing: nearest
    upsampling of the channel sum, box-averaged over a (s, s, s) window.
    """
    b, d, h, w, c = x.shape
    s = scale
    # stride-s ones-deconv == channel-summed nearest upsample
    y = jnp.sum(x, axis=-1, keepdims=True)                   # (B,D,H,W,1)
    for axis in (1, 2, 3):
        y = jnp.repeat(y, s, axis=axis)                      # (B,sD,sH,sW,1)
    # ones/s^3 smoothing conv (SAME): the literal smoothing also sums the
    # deconv's C equal channels, contributing an extra factor of C
    kernel = jnp.full((s, s, s, 1, 1), float(c) / (s ** 3), y.dtype)
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return jnp.broadcast_to(y, y.shape[:-1] + (c,))
