"""Stage-wise wall-clock breakdown of the fused pipeline's attention path.

Times each sub-graph of the SaliencyUNet at the bench ROI shape to locate
the cost inside the ~330 ms attention stage (docs/ablate_attention.py).
Sub-graphs are jitted separately with random inputs at the exact
intermediate shapes, so their sum over-counts fusion wins slightly — this
is a locator, not an accounting identity.

Run on the TPU chip:  PYTHONPATH=. python docs/profile_attention_stage.py
"""
import statistics
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointunet_tpu.core.config import brats_saliency_config
from pointunet_tpu.models.attention3d import (
    ChannelWiseAttention3D,
    SpatialAttention3D,
)
from pointunet_tpu.models.saliency_unet import (
    CFE3D,
    ConvNormRelu,
    UpsampleConv,
    _Encoder,
    init_saliency_unet,
)

DT = jnp.bfloat16
ZP, YP, XP = 160, 208, 192   # padded ROI window (Z, Y, X)


def sync(x):
    # block_until_ready is not a reliable barrier over the axon relay;
    # a 4-byte scalar fetch is (same convention as bench.py)
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def bench(name, fn, *args, iters=6):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:48s} {min(times):8.1f} ms "
          f"(med {statistics.median(times):.1f})")
    return min(times)


def timed_module(name, mod, shape, key, in_dtype=DT):
    # in_dtype=f32 for the entry stage: the real pipeline feeds float32
    # that the first conv casts (pipeline/fused.py), so the encoder's
    # timing must include that cast
    x = jax.random.normal(key, (1,) + shape, in_dtype)
    v = mod.init(key, x[:, :16, :16, :16], train=False)
    f = jax.jit(lambda p, a: mod.apply(p, a, train=False))
    return bench(name, f, v, x)


def main():
    print("backend:", jax.default_backend())
    cfg = brats_saliency_config(use_bfloat16=True)
    key = jax.random.PRNGKey(0)

    # whole net at ROI shape for reference
    model, variables = init_saliency_unet(key, cfg)
    x = jax.random.normal(key, (1, ZP, YP, XP, 4), jnp.float32)
    whole = jax.jit(
        lambda v, a: model.apply(v, a, train=False)
    )
    bench("WHOLE SaliencyUNet (ROI padded)", whole, variables, x)

    # encoder — fed f32 like the real pipeline (first conv casts to bf16)
    timed_module(
        "encoder (init conv + 5 blocks + 4 downs)",
        _Encoder(cfg), (ZP, YP, XP, 4), key, in_dtype=jnp.float32,
    )
    # full-res pieces
    timed_module("c1 = CNR(64) @ full-res 16ch in",
                 ConvNormRelu(64, dtype=DT), (ZP, YP, XP, 16), key)
    timed_module("c2 = CNR(64) @ 1/2-res 32ch in",
                 ConvNormRelu(64, dtype=DT),
                 (ZP // 2, YP // 2, XP // 2, 32), key)
    timed_module("CFE(32) @ 1/4-res 64ch",
                 CFE3D(32, dtype=DT), (ZP // 4, YP // 4, XP // 4, 64), key)
    timed_module("CFE(32) @ 1/8-res 128ch",
                 CFE3D(32, dtype=DT), (ZP // 8, YP // 8, XP // 8, 128), key)
    timed_module("CFE(32) @ 1/16-res 256ch",
                 CFE3D(32, dtype=DT),
                 (ZP // 16, YP // 16, XP // 16, 256), key)
    timed_module("Up(4,128) 1/16->1/4",
                 UpsampleConv(4, 128, dtype=DT),
                 (ZP // 16, YP // 16, XP // 16, 128), key)
    timed_module("Up(2,128) 1/8->1/4",
                 UpsampleConv(2, 128, dtype=DT),
                 (ZP // 8, YP // 8, XP // 8, 128), key)
    class CAWrap(nn.Module):
        @nn.compact
        def __call__(self, a, train=False):
            return ChannelWiseAttention3D()(a)

    timed_module("CA(384) @ 1/4-res (channel attention on c345)",
                 CAWrap(), (ZP // 4, YP // 4, XP // 4, 384), key)
    timed_module("CNR(64,1x1) @ 1/4 384ch",
                 ConvNormRelu(64, kernel=(1, 1, 1), dtype=DT),
                 (ZP // 4, YP // 4, XP // 4, 384), key)
    timed_module("Up(4,64) c345 1/4->full",
                 UpsampleConv(4, 64, dtype=DT),
                 (ZP // 4, YP // 4, XP // 4, 64), key)
    timed_module("SA(64) @ full-res",
                 SpatialAttention3D(64, dtype=DT), (ZP, YP, XP, 64), key)
    timed_module("Up(2,64) c2 1/2->full",
                 UpsampleConv(2, 64, dtype=DT),
                 (ZP // 2, YP // 2, XP // 2, 64), key)
    timed_module("c12 = CNR(64) @ full-res 128ch in",
                 ConvNormRelu(64, dtype=DT), (ZP, YP, XP, 128), key)

    class FinalConv(nn.Module):
        @nn.compact
        def __call__(self, a, train=False):
            from pointunet_tpu.models.fastconv import FastConv
            return FastConv(2, (3, 3, 3), padding="SAME", dtype=DT)(a)

    timed_module("final conv 128->2 @ full-res",
                 FinalConv(), (ZP, YP, XP, 128), key)


if __name__ == "__main__":
    main()
