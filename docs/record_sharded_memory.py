"""Record per-device memory of the point-sharded path at the 365k contract.

Regenerates docs/SHARDED_PYRAMID_365K.json on the virtual 8-device CPU
mesh (xla_force_host_platform_device_count): compiled per-device memory
(memory_analysis) of

  1. the dense pyramid build vs the sharded build (r3 artifact, re-recorded
     after the r4 pad-to-divisible + multi-hop-halo fixes), and
  2. the INTEGRATED sharded TRAIN step (pyramid + train core) vs the
     unsharded trainer — the r3 verdict item-5 artifact: evidence the
     sharded TRAINING path is memory-feasible at contract scale, not just
     the pyramid build.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=. python docs/record_sharded_memory.py
"""
import json
import os
import subprocess

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

from pointunet_tpu.core.config import (
    MeshConfig, TrainConfig, brats_pointseg_config,
)
from pointunet_tpu.ops.pyramid import build_pyramid_batch
from pointunet_tpu.ops.pyramid_sharded import build_pyramid_sharded
from pointunet_tpu.parallel.mesh import batch_point_sharding, make_mesh
from pointunet_tpu.train.pointseg import PointSegTrainer

N = 365_000
K = 16
RATIOS = (4, 4, 4, 4, 2)


def mb(x):
    return round(x / 2**20, 1)


def mem(compiled):
    ma = compiled.memory_analysis()
    return {
        "temp_mb": mb(ma.temp_size_in_bytes),
        "output_mb": mb(ma.output_size_in_bytes),
        "arg_mb": mb(ma.argument_size_in_bytes),
    }


def main():
    mesh = make_mesh(MeshConfig(data=1, point=8))
    x = jnp.zeros((1, N, 3), jnp.float32)

    print("compiling dense pyramid...", flush=True)
    dense_c = jax.jit(
        lambda a: build_pyramid_batch(a, K, RATIOS)
    ).lower(x).compile()
    dense = mem(dense_c)
    print("dense:", dense, flush=True)

    print("compiling sharded pyramid...", flush=True)
    x_sh = jax.device_put(x, batch_point_sharding(mesh))
    shard_c = jax.jit(
        lambda a: build_pyramid_sharded(a, K, RATIOS, mesh)
    ).lower(x_sh).compile()
    shard = mem(shard_c)
    print("sharded:", shard, flush=True)

    cfg = brats_pointseg_config(num_points=N)
    feats = jnp.zeros((1, N, 3 + cfg.num_features), jnp.float32)
    labels = jnp.zeros((1, N), jnp.int32)

    import jax.tree_util as jtu

    def train_mem(trainer, xs, fs, ls, ctx):
        with ctx:
            pyr_c = trainer.pyramid_fn.lower(xs).compile()
            # lower train_core from the compiled pyramid's OUTPUT
            # SHARDINGS via abstract args instead of executing the 365k
            # pyramid: on a single-core host the 8 virtual device threads
            # cannot all reach XLA:CPU's collective rendezvous inside its
            # hard-coded 40 s watchdog (serialized slab searches), and
            # the memory analysis only needs shapes + shardings
            pyr_shapes = jax.eval_shape(trainer.pyramid_fn, xs)
            pyr = jtu.tree_map(
                lambda s, sh: jax.ShapeDtypeStruct(
                    s.shape, s.dtype, sharding=sh
                ),
                pyr_shapes, pyr_c.output_shardings,
            )
            core_c = trainer._train_core.lower(
                trainer.init_state(), pyr, fs, ls
            ).compile()
        p, c = mem(pyr_c), mem(core_c)
        return {
            "pyramid": p, "train_core": c,
            "total_temp_mb": round(p["temp_mb"] + c["temp_mb"], 1),
        }

    import contextlib

    print("compiling unsharded train step...", flush=True)
    t_single = PointSegTrainer(
        cfg, TrainConfig(donate_state=False), num_points=N
    )
    single = train_mem(
        t_single, x, feats, labels, contextlib.nullcontext()
    )
    print("unsharded train:", single, flush=True)

    print("compiling sharded train step...", flush=True)
    t_shard = PointSegTrainer(
        cfg, TrainConfig(donate_state=False), mesh=mesh, num_points=N,
    )
    xs, fs, ls = t_shard.shard_batch(x, feats, labels)
    shard_tr = train_mem(t_shard, xs, fs, ls, mesh)
    print("sharded train:", shard_tr, flush=True)

    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "what": (
            "per-device memory at the BraTS contract (365000 points, k=16, "
            "ratios [4,4,4,4,2]) on the 8-device virtual CPU mesh, from "
            "compiled.memory_analysis(): pyramid build AND the integrated "
            "train step (VERDICT r3 item 5)"
        ),
        "commit": sha,
        "recorded": "2026-08-20",
        "dense_build_pyramid_batch": dense,
        "sharded_build_pyramid_sharded_p8": shard,
        "per_device_temp_reduction_x": round(
            dense["temp_mb"] / shard["temp_mb"], 2
        ),
        "train_step_unsharded": single,
        "train_step_sharded_p8": shard_tr,
        "train_temp_reduction_x": round(
            single["total_temp_mb"] / shard_tr["total_temp_mb"], 2
        ),
        "history": [
            {"commit": "61dcda0", "dense_temp_mb": 11995.0,
             "sharded_temp_mb": 3322.7, "reduction_x": 3.61,
             "note": "r3: level 1 ran dense (91,250 rows not divisible "
                     "by 8); single-hop halo clamped to the slab"},
            {"commit": "7dea53a", "dense_temp_mb": 11444.0,
             "sharded_temp_mb": 5652.5, "reduction_x": 2.02},
        ],
        "notes": [
            "r4: pad-to-divisible shards level 1 (91,250 -> padded 91,256); "
            "multi-hop ppermute fetches halos larger than one slab "
            "(level-1 halo 14,720 vs slab 11,407 -> 2 hops)",
            "halo size itself is bounded by worst-case x-layer occupancy "
            "under the contract's density skew — docs/SHARDED_HALO_ANALYSIS.md",
            "CPU-backend numbers: the dense XLA cell-window fallback, not "
            "the on-chip Pallas kernel; the RATIO is the claim, not the MB",
        ],
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SHARDED_PYRAMID_365K.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
