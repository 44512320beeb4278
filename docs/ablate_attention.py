"""One-shot on-chip measurement queue for the r2 attention-stage work.

Times, at bench shapes with randomly-initialized weights:
  1. attention_mask: full padded volume vs brain-ROI window
  2. e2e segment_device with ROI (the bench configuration)
  3. knn_pallas level-0 365k (validates the fused selection sweep's win)

Run:  PYTHONPATH=. python docs/ablate_attention.py    (needs the TPU chip)

Recorded run (2026-08-18, single v5e via axon tunnel; min of 6, ms):

    attention_mask FULL (160,240,240)      460.1
    attention_mask ROI (160,208,192)       331.3
    e2e segment_device FULL                835.1
    e2e segment_device ROI                 712.2   <- bench.py config
    knn_pallas 365k x 16 (fused sweep)     164.9

bench.py --preset e2e recorded 715.19 ms median the same day.
"""
import time

import numpy as np


def sync_scalar(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def bench(name, fn, *args, iters=6):
    out = fn(*args)
    sync_scalar(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync_scalar(out)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:44s} {min(times):8.1f} ms "
          f"(med {sorted(times)[len(times) // 2]:.1f})")
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from pointunet_tpu.core.config import (
        brats_pointseg_config,
        brats_saliency_config,
    )
    from pointunet_tpu.models.randlanet import init_randlanet
    from pointunet_tpu.models.saliency_unet import init_saliency_unet
    from pointunet_tpu.pipeline.fused import FusedPointUnet

    print("backend:", jax.default_backend())
    scfg = brats_saliency_config(use_bfloat16=True)
    pcfg = brats_pointseg_config(use_bfloat16=True)
    rng = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(rng, scfg)
    pmodel, pvars = init_randlanet(rng, pcfg)

    key = jax.random.PRNGKey(1)
    mods = jax.random.normal(key, (4, 240, 240, 155), jnp.float32)
    xx, yy, zz = jnp.meshgrid(
        jnp.arange(240), jnp.arange(240), jnp.arange(155), indexing="ij"
    )
    brainmask = (
        ((xx - 120.0) / 75.0) ** 2
        + ((yy - 122.0) / 88.0) ** 2
        + ((zz - 76.0) / 70.0) ** 2
    ) < 1.0
    mods = mods * brainmask[None]
    mods = jax.device_put(mods)

    full = FusedPointUnet(smodel, svars, pmodel, pvars, scfg, pcfg)
    roi = FusedPointUnet(
        smodel, svars, pmodel, pvars, scfg, pcfg,
        roi_shape=(192, 208, 155),
    )
    bench("attention_mask FULL (160,240,240)", full._attention_mask, mods)
    bench("attention_mask ROI (160,208,192)", roi._attention_mask, mods)

    k1 = jax.random.PRNGKey(2)
    bench("e2e segment_device FULL", lambda m: full.segment_device(m, k1),
          mods)
    bench("e2e segment_device ROI", lambda m: roi.segment_device(m, k1),
          mods)

    from pointunet_tpu.ops.knn_pallas import knn_pallas

    pts = jax.random.uniform(key, (365_000, 3), jnp.float32)
    # voxel-like cloud: quantize to a 240-grid so density matches contract
    pts = jnp.round(pts * 240.0) / 240.0
    f = jax.jit(lambda p: jnp.sum(knn_pallas(p, p, 16)))
    bench("knn_pallas 365k x 16 (fused sweep)", f, pts)


if __name__ == "__main__":
    main()
