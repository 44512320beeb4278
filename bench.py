"""Benchmark: end-to-end Point-Unet point-segmentation latency per volume.

Measures the fused flagship path on one chip: on-device 5-level KNN pyramid
build + RandLA-Net forward + softmax + scatter-back for one BraTS-sized
cloud (365k points, K=16) — the per-volume device work of the reference's
`runBraTS.py --mode test` (which did its KNN on the host through py_func).

Prints ONE json line:
  {"metric": "brats_pointseg_volume_ms", "value": <median ms>,
   "unit": "ms", "vs_baseline": <north-star 2000 ms / value>}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline
compares against the BASELINE.json north star of 2 s/volume end-to-end.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=["full", "tiny"], default="full")
    parser.add_argument("--repeats", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pointunet_tpu.core.config import brats_pointseg_config
    from pointunet_tpu.models.randlanet import init_randlanet
    from pointunet_tpu.ops.pyramid import build_pyramid_batch
    from pointunet_tpu.ops.scatter import scatter_probs_to_volume

    n = 365_000 if args.preset == "full" else 8192
    cfg = brats_pointseg_config(num_points=n)
    model, variables = init_randlanet(
        jax.random.PRNGKey(0), cfg, num_points=n
    )

    # two XLA programs: fusing the KNN pyramid with the network makes XLA
    # pick gather-hostile layouts (~10x slower at 365k pts; measured v5e).
    @jax.jit
    def pyramid_fn(xyz):
        return build_pyramid_batch(xyz, cfg.k_n, cfg.sub_sampling_ratio)

    @jax.jit
    def forward_scatter(pyramid, feats, origin):
        logits = model.apply(variables, feats, pyramid, train=False)
        probs = jax.nn.softmax(logits[0], axis=-1)
        return scatter_probs_to_volume(probs, origin, (155, 240, 240))

    def volume_step(xyz, feats, origin):
        return forward_scatter(pyramid_fn(xyz), feats, origin)

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(0, 1, (1, n, 3)).astype(np.float32))
    mods = jnp.asarray(
        rng.standard_normal((1, n, cfg.num_features)).astype(np.float32)
    )
    feats = jnp.concatenate([xyz, mods], axis=-1)
    origin = jnp.asarray(
        np.stack(
            [
                rng.integers(0, 240, n),
                rng.integers(0, 240, n),
                rng.integers(0, 155, n),
            ],
            axis=-1,
        ).astype(np.int32)
    )

    # warmup/compile
    volume_step(xyz, feats, origin).block_until_ready()

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        volume_step(xyz, feats, origin).block_until_ready()
        times.append((time.perf_counter() - t0) * 1000)

    value = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "brats_pointseg_volume_ms",
                "value": round(value, 2),
                "unit": "ms",
                "vs_baseline": round(2000.0 / value, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
