"""TPU-fast 3-D convolution via depth-batched 2-D convolutions.

XLA's native 3-D convolution on TPU underperforms its (heavily tuned) 2-D
path at this workload's shapes — measured on v5e at the (160, 240, 240)
whole-volume window:

    kernel (1,9,9)  64->32:  143 ms native 3-D  ->   46 ms 2-D-batched
    kernel (3,3,3)  64->64:   38 ms             ->   29 ms depth-sum
    kernel (3,3,3) 128->64:   64 ms             ->   52 ms depth-sum

The identity used: a (kd, kh, kw) conv along (D, H, W) decomposes into kd
2-D (kh, kw) convs with the depth dimension folded into the XLA batch
dimension, summed with depth shifts:

    out[d] = sum_i  conv2d(x[d + i - kd//2], w[i])

When some kernel axis has size 1 no shifts are needed at all; when an axis
has size 1 or 3 we permute that axis into the fold position. Larger fold
sizes fall back to the native 3-D path (the decomposition's shift/sum
overhead grows linearly while native conv cost is flat).

``FastConv`` is a drop-in replacement for ``flax.linen.Conv`` restricted to
3-D channels-last inputs: same parameter names ("kernel", "bias"), same
shapes, same initializer contract — checkpoints are interchangeable. The
class is renamed to "Conv" for flax auto-naming so swapping it in does not
move parameters. Strided / dilated / grouped convs fall back to the exact
``lax.conv_general_dilated`` call flax makes.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.linen import initializers


def _triple(v, n=3):
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _decomposition_mode() -> str:
    """Which kernels to decompose: "all", "fold1" (only kernels with a
    size-1 axis — zero shift/sum overhead), "pallas" (route eligible
    3x3x3 convs through the fused VMEM-resident tap kernel,
    ops/conv_pallas.py), or "off".

    XLA:CPU compiles the expansion pathologically slowly (minutes per
    model) with no runtime benefit, so anything but TPU is "off".
    Overridable via POINTUNET_FASTCONV for tests and profiling."""
    import os

    force = os.environ.get("POINTUNET_FASTCONV", "")
    if force in ("all", "1"):
        return "all"
    if force in ("off", "0"):
        return "off"
    if force in ("fold1", "k9", "pallas"):
        return force
    return "all" if jax.default_backend() == "tpu" else "off"


def _decomposable(kernel: Tuple[int, int, int]) -> int | None:
    """Pick the kernel axis to fold into the batch dim, or None.

    Prefer a size-1 axis (zero shift/sum overhead), else a size-3 axis
    (three shifted 2-D convs still beat one native 3-D conv).
    """
    for size in (1, 3):
        for ax in range(3):
            if kernel[ax] == size:
                return ax
    return None


def fused_upsample_conv3d(
    x: jax.Array,          # (B, D, H, W, Cin) COARSE input
    w: jax.Array,          # (3, 3, 3, Cin, Cout) full-res kernel
    scale: int,
) -> jax.Array:
    """Exactly ``conv3d_SAME(w, nearest_upsample(x, scale))`` computed at
    coarse resolution — 8/27 of the full-resolution FLOPs.

    Identity: with output index o = scale*j + q written with phases
    q in [1, scale], every full-res tap x_up[o + d] (d in {-1,0,1}) reads
    x[j + floor((q+d)/scale)] and floor((q+d)/scale) is always 0 or 1 —
    each phase is a 2-tap coarse conv whose taps are re-bucketed sums of
    the original 3 weights. One VALID 2x2x2 conv over the 1-padded coarse
    input emits all scale^3 phases as channels; depth-to-space + a
    (scale-1)-offset crop reassembles the full-res result. Mathematically
    exact; floats differ only by weight pre-summation reassociation
    (ulp-level — asserted tight in tests/test_fastconv.py).

    Measured (v5e, whole-volume saliency at (160,240,240)): the two
    full-res UpsampleConvs are ~4 TFLOP of the forward's ~10 and this
    cuts them 3.375x — yet end-to-end it is perf-NEUTRAL (740 vs 732 ms
    fwd; 741 vs 732 ms train step): the decoder is HBM-bandwidth-bound,
    and the depth-to-space transpose re-spends the saved bytes. Hence
    opt-in via POINTUNET_FUSED_UPSAMPLE=1 (see _fused_upsample_enabled).
    """
    assert w.shape[:3] == (3, 3, 3), "phase decomposition assumes k=3"
    s = scale
    cin, cout = w.shape[3], w.shape[4]
    # per-axis tap matrix T[q-1, t, k] = [floor((q + k - 1)/s) == t]
    q = np.arange(1, s + 1)[:, None, None]
    t = np.arange(2)[None, :, None]
    k = np.arange(3)[None, None, :]
    T = jnp.asarray(((q + k - 1) // s == t), w.dtype)       # (s, 2, 3)
    # W2[a,b,c, i, q,r,p, o]: coarse 2x2x2 kernel for each phase triple
    w2 = jnp.einsum("qak,rbl,pcm,klmio->abciqrpo", T, T, T, w)
    w2 = w2.reshape(2, 2, 2, cin, s * s * s * cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w2, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )                                     # (B, D+1, H+1, W+1, s^3*Cout)
    b, d1, h1, w1 = y.shape[:4]
    y = y.reshape(b, d1, h1, w1, s, s, s, cout)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    y = y.reshape(b, d1 * s, h1 * s, w1 * s, cout)
    d, h, wd = x.shape[1:4]
    return y[:, s - 1 : s - 1 + d * s,
             s - 1 : s - 1 + h * s,
             s - 1 : s - 1 + wd * s]


def _nearest_upsample(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor repeat along D, H, W (keras UpSampling3D)."""
    for axis in (1, 2, 3):
        x = jnp.repeat(x, scale, axis=axis)
    return x


def _fused_upsample_enabled() -> bool:
    """Opt-in (POINTUNET_FUSED_UPSAMPLE=1): measured perf-NEUTRAL on v5e
    (saliency fwd (160,240,240): 740 vs 732 ms; train step 741 vs 732 ms)
    because the decoder is HBM-bandwidth-bound — the 3.375x FLOP cut buys
    nothing and the depth-to-space transpose adds a full-res pass. Kept
    for compute-bound shapes (small volumes / larger batch)."""
    import os

    return os.environ.get("POINTUNET_FUSED_UPSAMPLE", "0") == "1"


def fast_conv3d(
    x: jax.Array,          # (B, S0, S1, S2, Cin)
    w: jax.Array,          # (k0, k1, k2, Cin, Cout)
    fold_axis: int,
) -> jax.Array:
    """SAME, stride-1, dilation-1 3-D conv as depth-batched 2-D convs."""
    ks = w.shape[:3]
    a = fold_axis
    rest = [i for i in range(3) if i != a]
    # spatial permutation putting the fold axis first
    x_t = jnp.transpose(x, (0, 1 + a, 1 + rest[0], 1 + rest[1], 4))
    w_t = jnp.transpose(w, (a, rest[0], rest[1], 3, 4))
    b, d, h, wd, cin = x_t.shape
    kd = ks[a]
    cout = w.shape[-1]
    xb = x_t.reshape(b * d, h, wd, cin)

    def conv2d(inp, ker):
        return jax.lax.conv_general_dilated(
            inp, ker, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    pad = kd // 2
    out = None
    for i in range(kd):
        y = conv2d(xb, w_t[i]).reshape(b, d, h, wd, cout)
        off = i - pad                   # out[d] += y[d + off]
        if off > 0:
            zeros = jnp.zeros_like(y[:, :off])
            y = jnp.concatenate([y[:, off:], zeros], axis=1)
        elif off < 0:
            zeros = jnp.zeros_like(y[:, off:])
            y = jnp.concatenate([zeros, y[:, :off]], axis=1)
        out = y if out is None else out + y

    inv = np.argsort([a] + rest)
    out = jnp.transpose(out, (0,) + tuple(1 + inv) + (4,))
    # CRITICAL: without this barrier, XLA fuses a following normalization's
    # spatial reduction into the decomposed conv graph and the whole chain
    # runs ~140x slower (measured v5e: conv->instancenorm->conv at
    # (160,240,240,64) is 8.5 s fused vs 60 ms barriered). The barrier
    # costs one materialization the chain needed anyway.
    return jax.lax.optimization_barrier(out)


class FastConv(nn.Module):
    """Drop-in ``nn.Conv`` for 3-D channels-last inputs (see module doc)."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "SAME"
    kernel_dilation: Union[int, Sequence[int]] = 1
    # upsample > 1: compute conv(nearest_upsample(x, upsample)) — via the
    # exact coarse-resolution phase decomposition when eligible (k=3,
    # stride 1, SAME), else explicit repeat + conv. The kernel parameter
    # is the full-resolution kernel either way (checkpoint-identical).
    upsample: int = 1
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Any = initializers.lecun_normal()
    bias_init: Any = initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5, "FastConv expects (B, D, H, W, C)"
        kernel_size = _triple(self.kernel_size)
        strides = _triple(self.strides)
        dilation = _triple(self.kernel_dilation)
        cin = x.shape[-1]

        kernel = self.param(
            "kernel",
            self.kernel_init,
            kernel_size + (cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )

        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            if bias is not None:
                bias = bias.astype(self.dtype)
        else:
            dt = jnp.promote_types(x.dtype, kernel.dtype)
            x, kernel = x.astype(dt), kernel.astype(dt)
            if bias is not None:
                bias = bias.astype(dt)

        if self.upsample > 1:
            if (
                kernel_size == (3, 3, 3)
                and strides == (1, 1, 1)
                and dilation == (1, 1, 1)
                and self.padding == "SAME"
                and _fused_upsample_enabled()
            ):
                y = fused_upsample_conv3d(x, kernel, self.upsample)
                if bias is not None:
                    y = y + bias
                return y
            x = _nearest_upsample(x, self.upsample)

        mode = _decomposition_mode()
        if (
            mode == "pallas"
            and kernel_size == (3, 3, 3)
            and strides == (1, 1, 1)
            and dilation == (1, 1, 1)
            and self.padding == "SAME"
            and jax.default_backend() == "tpu"
        ):
            from ..ops.conv_pallas import conv3d_3x3_pallas_batched

            y = conv3d_3x3_pallas_batched(x, kernel)
            if bias is not None:
                y = y + bias
            return jax.lax.optimization_barrier(y)
        fold = _decomposable(kernel_size)
        if mode == "fold1" and fold is not None and kernel_size[fold] != 1:
            fold = None
        if mode == "k9" and max(kernel_size) < 9:
            fold = None
        if (
            strides == (1, 1, 1)
            and dilation == (1, 1, 1)
            and self.padding == "SAME"
            and fold is not None
            and mode != "off"
        ):
            y = fast_conv3d(x, kernel, fold)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                strides,
                self.padding,
                rhs_dilation=dilation,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if bias is not None:
            y = y + bias
        return y


# flax auto-names module instances by class name; keep the parameter tree
# byte-identical to nn.Conv so FastConv swaps in without moving checkpoints
FastConv.__name__ = "Conv"
