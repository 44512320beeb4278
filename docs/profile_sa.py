"""Profile the SpatialAttention3D hotspot at the fused-pipeline shape.

The round-2 ablation (docs/DESIGN.md) showed sa_attention=False cuts the
whole-volume attention stage from ~740 ms to ~320 ms on v5e. This script
times SA's sub-ops in isolation at the exact stage shape to locate the
cost: (1, 160, 240, 240, 64) bf16 inputs (pipeline/fused.py:54-67).

Run on the TPU chip:  python docs/profile_sa.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointunet_tpu.models.attention3d import SpatialAttention3D
from pointunet_tpu.models.fastconv import FastConv
from pointunet_tpu.models.norms import NormRelu

SHAPE = (1, 160, 208, 192, 64)   # ROI window (Z, Y, X) padded
DT = jnp.bfloat16


def sync(x):
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).reshape(-1)[0].astype(jnp.float32)), x
    )


def bench(name, fn, *args, iters=6):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:42s} {min(times):8.1f} ms (med {sorted(times)[len(times)//2]:.1f})")
    return min(times)


class FirstConvs(nn.Module):
    @nn.compact
    def __call__(self, x):
        k = 9
        outs = []
        for pair in ((1, k, k), (k, 1, k), (k, k, 1)):
            outs.append(FastConv(32, pair, padding="SAME", dtype=DT)(x))
        return sum(o.sum() for o in outs)


class FirstConvNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        k = 9
        outs = []
        for pair in ((1, k, k), (k, 1, k), (k, k, 1)):
            h = FastConv(32, pair, padding="SAME", dtype=DT)(x)
            outs.append(NormRelu(True, dtype=DT)(h, False))
        return sum(o.sum() for o in outs)


class SecondConvs(nn.Module):
    @nn.compact
    def __call__(self, h):
        k = 9
        outs = []
        for pair in ((k, 1, 1), (1, k, 1), (1, 1, k)):
            g = FastConv(1, pair, padding="SAME", dtype=DT)(h)
            outs.append(NormRelu(True, dtype=DT)(g, False))
        return sum(o.sum() for o in outs)


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, SHAPE, DT)
    h = jax.random.normal(key, SHAPE[:-1] + (32,), DT)

    sa = SpatialAttention3D(64, instance_norm=True, dtype=DT)
    v = sa.init(key, x[:, :16, :16, :16], train=False)
    f_sa = jax.jit(lambda p, a: (sa.apply(p, a, train=False) * a).sum())
    bench("SA full (gate*x, sum)", f_sa, v, x)

    m1 = FirstConvs()
    v1 = m1.init(key, x[:, :16, :16, :16])
    bench("3x first conv (64->32, 81-tap)", jax.jit(m1.apply), v1, x)

    m1n = FirstConvNorm()
    v1n = m1n.init(key, x[:, :16, :16, :16])
    bench("3x first conv + inorm-relu", jax.jit(m1n.apply), v1n, x)

    m2 = SecondConvs()
    v2 = m2.init(key, h[:, :16, :16, :16])
    bench("3x second conv (32->1, 9-tap) + inorm", jax.jit(m2.apply), v2, h)


if __name__ == "__main__":
    main()
