"""Probe: XLA:TPU row-gather cost vs table dtype/width at the 365k contract.

The pointseg locator (docs/profile_pointseg_stage.py) showed the L0
combined [xyz|feature] gather (w=11, f32 — feature is cast UP to xyz's
f32) costing ~47 ms more than the same-index w=8 bf16 gather. This probe
maps the (dtype, width) cost surface with the REAL pyramid indices to
pick the forward-gather redesign, and times a null dispatch to subtract
the axon-relay per-call overhead (~25-30 ms) from every reading.

Run: PYTHONPATH=.:/root/.axon_site python docs/probe_gather_variants.py
"""
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.ops.pyramid import build_pyramid_batch
from pointunet_tpu.ops.sampling import sample_cloud_device

N = 365_000
K = 16
SHAPE = (240, 240, 155)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def bench(name, fn, *args, iters=8, base=0.0):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    t = min(times)
    print(f"{name:52s} {t:8.2f} ms  (-overhead {t - base:7.2f}) "
          f"med {statistics.median(times):.2f}")
    return t


def make_cloud():
    rng = np.random.default_rng(0)
    x, y, z = SHAPE
    xx, yy, zz = np.meshgrid(
        np.arange(x), np.arange(y), np.arange(z), indexing="ij"
    )
    brain = (
        ((xx - 120.0) / 75.0) ** 2
        + ((yy - 122.0) / 88.0) ** 2
        + ((zz - 76.0) / 70.0) ** 2
    ) < 1.0
    d2 = (xx - 140.0) ** 2 + (yy - 100.0) ** 2 + ((zz - 70.0) * 1.5) ** 2
    tumor = d2 < 30.0 ** 2
    mods = rng.standard_normal((4, x, y, z)).astype(np.float32) * 0.2
    mods[:, brain] += 1.0
    mods[:, ~brain] = 0.0
    return sample_cloud_device(
        jnp.asarray(mods), jnp.asarray(tumor & brain),
        jax.random.PRNGKey(0), N,
    )


def main():
    print("backend:", jax.default_backend())
    cloud = make_cloud()
    pyr = build_pyramid_batch(cloud.xyz[None], K, (4, 4, 4, 4, 2))
    sync(pyr)
    idx = pyr.neigh_idx[0][0]                      # (N, K) real L0 indices
    xyz = pyr.xyz[0][0]

    # null dispatch: measures the per-call relay overhead floor
    null = jax.jit(lambda a: a + 1.0)
    base = bench("null dispatch (overhead floor)", null,
                 jnp.ones((8, 128), jnp.float32))

    g = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))

    def table(w, dt):
        cols = [xyz.astype(dt)] if w >= 3 else []
        used = 3 if w >= 3 else 0
        if w > used:
            cols.append(jnp.ones((N, w - used), dt))
        return jnp.concatenate(cols, -1) if len(cols) > 1 else cols[0]

    for w, dt, label in [
        (11, jnp.float32, "w=11 f32 (current combined)"),
        (8, jnp.float32, "w=8  f32"),
        (3, jnp.float32, "w=3  f32 (xyz only)"),
        (16, jnp.float32, "w=16 f32"),
        (8, jnp.bfloat16, "w=8  bf16"),
        (14, jnp.bfloat16, "w=14 bf16 (2xyz_bf16 + 8 feat)"),
        (16, jnp.bfloat16, "w=16 bf16"),
        (32, jnp.bfloat16, "w=32 bf16"),
        (64, jnp.bfloat16, "w=64 bf16"),
    ]:
        bench(f"L0 gather {label}", g, table(w, dt), idx, base=base)

    # packed: 3 f32 xyz + 8 bf16 feats bitcast into 7 f32 lanes
    feats8 = jnp.ones((N, 8), jnp.bfloat16)
    packed = jnp.concatenate(
        [xyz, jax.lax.bitcast_convert_type(
            feats8.reshape(N, 4, 2), jnp.float32)],
        axis=-1,
    )                                              # (N, 7) f32
    bench("L0 gather w=7 f32 (bit-packed xyz+bf16 feats)", g, packed, idx,
          base=base)

    # gather + unpack fused (what the model would actually run)
    @jax.jit
    def gather_unpack(t, ix):
        got = jnp.take(t, ix, axis=0)              # (N, K, 7)
        nxyz = got[..., :3]
        nf = jax.lax.bitcast_convert_type(
            got[..., 3:], jnp.bfloat16
        ).reshape(N, K, 8)
        return nxyz, nf
    bench("L0 gather w=7 packed + unpack", gather_unpack, packed, idx,
          base=base)

    # f32 via two bf16 lanes (double-bf16): exactness check + cost
    hi = xyz.astype(jnp.bfloat16)
    lo = (xyz - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    err = float(jnp.max(jnp.abs(
        hi.astype(jnp.float32) + lo.astype(jnp.float32) - xyz
    )))
    print(f"double-bf16 xyz reconstruction max err: {err:.2e} "
          f"(grid cell ~{1.0 / 128:.4f})")
    dbl = jnp.concatenate([hi, lo, feats8], -1)     # (N, 14) bf16

    @jax.jit
    def gather_dbl(t, ix):
        got = jnp.take(t, ix, axis=0)
        nxyz = (got[..., :3].astype(jnp.float32)
                + got[..., 3:6].astype(jnp.float32))
        return nxyz, got[..., 6:]
    bench("L0 gather w=14 double-bf16 + reconstruct", gather_dbl, dbl, idx,
          base=base)

    # sorted vs random indices: how much does the sorted contract buy XLA?
    ridx = jnp.asarray(
        np.random.default_rng(1).integers(0, N, (N, K)), jnp.int32
    )
    bench("L0 gather w=8 bf16 RANDOM idx", g, table(8, jnp.bfloat16), ridx,
          base=base)
    bench("L0 gather w=11 f32 RANDOM idx", g, table(11, jnp.float32), ridx,
          base=base)


if __name__ == "__main__":
    main()
