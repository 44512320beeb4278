"""Saliency-attention 3D U-Net (stage 1 of Point-Unet).

TPU-first rebuild of reference SaliencyAttention/model.py:

* ``SaliencyUNet`` — the attention variant (unet3d_attention, model.py:177-314):
  residual encoder with filter growth, CFE atrous context blocks (rates
  3/5/7) on the three deepest scales, channel attention on the fused
  high-level features, spatial attention gating the low-level features.
* ``UNet3D`` — the plain variant with deep supervision (unet3d,
  model.py:21-119).

Layout is channels-last (B, D, H, W, C); convs are XLA 3-D convolutions that
tile onto the MXU. ``remat`` wraps encoder blocks to trade FLOPs for HBM at
the (64,160,160) patch size. Upsampling is nearest-repeat + conv (the
reference's keras UpSampling3D + conv, model.py:316-364).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import SaliencyConfig
from .attention3d import ChannelWiseAttention3D, SpatialAttention3D
from .fastconv import FastConv, _nearest_upsample
from .norms import NormRelu

_CONV_INIT = nn.initializers.glorot_uniform()


class ConvNormRelu(nn.Module):
    features: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = (1, 1, 1)
    dilation: tuple = (1, 1, 1)
    instance_norm: bool = True
    dtype: object = None
    axis_name: Optional[str] = None
    use_bias: bool = True
    upsample: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = FastConv(
            self.features,
            self.kernel,
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding="SAME",
            upsample=self.upsample,
            use_bias=self.use_bias,
            kernel_init=_CONV_INIT,
            dtype=self.dtype,
        )(x)
        return NormRelu(
            self.instance_norm, dtype=self.dtype, axis_name=self.axis_name
        )(x, train)


class UNetBlock(nn.Module):
    """Two 3x3x3 convs with optional residual add (reference
    model.py:374-390 Unet3dBlock)."""

    features: int
    residual: bool = True
    instance_norm: bool = True
    axis_name: Optional[str] = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(2):
            h = ConvNormRelu(
                self.features,
                instance_norm=self.instance_norm,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )(h, train)
        return x + h if self.residual else h


class CFE3D(nn.Module):
    """Context feature extraction: 1x1 conv + three atrous 3x3x3 convs
    (rates 3, 5, 7), concatenated (reference model.py:154-174)."""

    features: int = 32
    instance_norm: bool = True
    axis_name: Optional[str] = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [
            ConvNormRelu(
                self.features, kernel=(1, 1, 1), use_bias=False,
                instance_norm=self.instance_norm, dtype=self.dtype,
                axis_name=self.axis_name,
            )(x, train)
        ]
        for rate in (3, 5, 7):
            outs.append(
                ConvNormRelu(
                    self.features,
                    dilation=(rate, rate, rate),
                    use_bias=False,
                    instance_norm=self.instance_norm,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                )(x, train)
            )
        return jnp.concatenate(outs, axis=-1)


class UpsampleConv(nn.Module):
    """Nearest upsample + 3x3x3 conv (reference UnetUpsample, model.py:340-364).

    The upsample is expressed as ``FastConv(upsample=scale)``: an exact
    coarse-resolution phase decomposition at 8/27 of the full-res FLOPs
    (fastconv.fused_upsample_conv3d, opt-in — measured HBM-bound-neutral
    on v5e) or the default nearest-repeat + conv. Parameter tree and
    checkpoint layout are unchanged either way."""

    scale: int
    features: int
    instance_norm: bool = True
    axis_name: Optional[str] = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvNormRelu(
            self.features,
            upsample=self.scale,
            instance_norm=self.instance_norm,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )(x, train)


def _maybe_remat(cls, enable):
    """Checkpoint a block's activations for the backward pass (arg 2 =
    ``train`` is static). The wrapped class keeps the original __name__ so
    flax auto-naming — and therefore the param tree — is identical whether
    remat is active (train) or not (inference)."""
    if not enable:
        return cls
    wrapped = nn.remat(cls, static_argnums=(2,))
    wrapped.__name__ = cls.__name__
    return wrapped


class _Encoder(nn.Module):
    """Shared encoder: init conv + depth x (block, strided downsample)."""

    config: SaliencyConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        inorm, ax = cfg.instance_norm, self.axis_name
        dt = jnp.bfloat16 if cfg.use_bfloat16 else None
        Block = _maybe_remat(UNetBlock, cfg.remat and train)
        CNR = _maybe_remat(ConvNormRelu, cfg.remat and train)
        x = CNR(
            cfg.base_filter, instance_norm=inorm, dtype=dt, axis_name=ax
        )(x, train)
        down = []
        for d in range(cfg.depth):
            filters = (
                cfg.base_filter * (2 ** d) if cfg.filter_grow else cfg.base_filter
            )
            block = Block(
                filters,
                residual=cfg.residual,
                instance_norm=inorm,
                axis_name=ax,
                dtype=dt,
            )
            if cfg.residual and x.shape[-1] != filters:
                # residual add needs matching channels; the reference
                # guarantees this via the strided conv's filters*2
                x = CNR(
                    filters, kernel=(1, 1, 1), instance_norm=inorm,
                    dtype=dt, axis_name=ax,
                )(x, train)
            x = block(x, train)
            down.append(x)
            if d != cfg.depth - 1:
                x = CNR(
                    filters * 2,
                    strides=(2, 2, 2),
                    instance_norm=inorm,
                    dtype=dt,
                    axis_name=ax,
                )(x, train)
        return down


class SaliencyUNet(nn.Module):
    """unet3d_attention (reference model.py:177-314)."""

    config: SaliencyConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        inorm, ax = cfg.instance_norm, self.axis_name
        dt = jnp.bfloat16 if cfg.use_bfloat16 else None
        CNR = _maybe_remat(ConvNormRelu, cfg.remat and train)
        CFE = _maybe_remat(CFE3D, cfg.remat and train)
        Up = _maybe_remat(UpsampleConv, cfg.remat and train)
        SA = _maybe_remat(SpatialAttention3D, cfg.remat and train)

        down = _Encoder(cfg, axis_name=ax)(x, train)

        # low-level features
        c1 = CNR(64, instance_norm=inorm, dtype=dt, axis_name=ax)(
            down[0], train
        )
        c2 = CNR(64, instance_norm=inorm, dtype=dt, axis_name=ax)(
            down[1], train
        )

        # high-level context features at 1/4, 1/8, 1/16 -> all to 1/4
        c3 = CFE(32, inorm, ax, dt)(down[2], train)
        c4 = CFE(32, inorm, ax, dt)(down[3], train)
        c5 = CFE(32, inorm, ax, dt)(down[4], train)
        c5 = Up(4, 128, inorm, ax, dt)(c5, train)
        c4 = Up(2, 128, inorm, ax, dt)(c4, train)
        c345 = jnp.concatenate([c3, c4, c5], axis=-1)

        if cfg.ca_attention:
            c345 = ChannelWiseAttention3D()(c345)
        c345 = CNR(
            64, kernel=(1, 1, 1), instance_norm=inorm, dtype=dt, axis_name=ax
        )(c345, train)
        c345 = Up(4, 64, inorm, ax, dt)(c345, train)

        if cfg.sa_attention:
            s = cfg.sa_gate_stride
            if s > 1:
                # perf mode (config.py sa_gate_stride): gate convs on a
                # pooled input, raw 1-ch gate resized back to full res;
                # the (B,D,H,W,1) gate broadcasts against c12 in the
                # multiply below. Params identical to the s=1 path.
                g_in = nn.avg_pool(
                    c345, (s, s, s), strides=(s, s, s), padding="VALID"
                )
                sa = SA(64, inorm, ax, dtype=dt, broadcast=False)(
                    g_in, train
                )
                sa = jax.image.resize(
                    sa, sa.shape[:1] + c345.shape[1:4] + (1,), "trilinear"
                )
            else:
                sa = SA(64, inorm, ax, dtype=dt)(c345, train)

        c2 = Up(2, 64, inorm, ax, dt)(c2, train)
        c12 = jnp.concatenate([c1, c2], axis=-1)
        c12 = CNR(64, instance_norm=inorm, dtype=dt, axis_name=ax)(
            c12, train
        )
        if cfg.sa_attention:
            c12 = sa.astype(c12.dtype) * c12

        fea = jnp.concatenate([c12, c345], axis=-1)
        # dtype=dt: without it the f32 kernel promotes the whole 128-ch
        # full-res feature map to f32 (a multi-GB materialization at the
        # whole-volume window) before an f32 conv; logits still emit f32
        logits = FastConv(
            cfg.num_class, (3, 3, 3), padding="SAME",
            kernel_init=_CONV_INIT, dtype=dt,
        )(fea)
        return logits.astype(jnp.float32)


class UNet3D(nn.Module):
    """Plain 3D U-Net with deep supervision (reference model.py:21-119)."""

    config: SaliencyConfig
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        inorm, ax = cfg.instance_norm, self.axis_name
        dt = jnp.bfloat16 if cfg.use_bfloat16 else None
        filters = [
            cfg.base_filter * (2 ** d) if cfg.filter_grow else cfg.base_filter
            for d in range(cfg.depth)
        ]

        CNR = _maybe_remat(ConvNormRelu, cfg.remat and train)
        Up = _maybe_remat(UpsampleConv, cfg.remat and train)
        down = _Encoder(cfg, axis_name=ax)(x, train)
        layer = down[-1]

        deep_supervision = None
        for d in range(cfg.depth - 2, -1, -1):
            layer = Up(2, filters[d], inorm, ax, dt)(layer, train)
            layer = jnp.concatenate([layer, down[d]], axis=-1)
            layer = CNR(
                filters[d], instance_norm=inorm, dtype=dt, axis_name=ax
            )(layer, train)
            layer = CNR(
                filters[d], kernel=(1, 1, 1), instance_norm=inorm,
                dtype=dt, axis_name=ax,
            )(layer, train)
            if cfg.deep_supervision and 0 < d < 3:
                pred = FastConv(
                    cfg.num_class, (1, 1, 1), kernel_init=_CONV_INIT,
                    dtype=dt,
                )(layer)
                if deep_supervision is None:
                    deep_supervision = pred
                else:
                    deep_supervision = deep_supervision + pred
                deep_supervision = _nearest_upsample(deep_supervision, 2)

        logits = FastConv(
            cfg.num_class, (1, 1, 1), kernel_init=_CONV_INIT, dtype=dt,
        )(layer)
        if cfg.deep_supervision and deep_supervision is not None:
            logits = logits + deep_supervision
        return logits.astype(jnp.float32)


def init_saliency_unet(
    rng: jax.Array,
    config: SaliencyConfig,
    patch_size: Optional[tuple] = None,
    axis_name: Optional[str] = None,
    attention: bool = True,
):
    """Initialize variables (jitted, on a minimal patch).

    Conv parameter shapes don't depend on spatial extent, so init runs at
    the smallest patch the depth-5 downsampling allows (16 per axis, with
    32 in-plane so the k=9 attention convs stay sensible) rather than the
    full (64, 160, 160) training patch.
    """
    patch = tuple(patch_size) if patch_size is not None else (16, 32, 32)
    cls = SaliencyUNet if attention else UNet3D
    model = cls(config, axis_name=axis_name)
    x = jnp.zeros((1,) + patch + (config.in_channels,), jnp.float32)

    @jax.jit
    def _init(rng, x):
        return model.init({"params": rng}, x, train=False)

    return model, _init(rng, x)
