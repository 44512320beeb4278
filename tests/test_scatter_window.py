"""windowed_gather: forward identical to jnp.take, backward identical to
the exact scatter-add (CPU exercises the fallback; the TPU kernel path is
validated on-chip against the same references)."""
import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.ops.knn import knn
from pointunet_tpu.ops.scatter_window import (
    windowed_gather,
    windowed_scatter_add,
)


def _cloud(n, rng):
    return rng.uniform(0, 1, (n, 3)).astype(np.float32)


def test_forward_matches_take(rng):
    n, k, c = 2000, 8, 5
    xyz = jnp.asarray(_cloud(n, rng))
    table = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    idx = knn(xyz, xyz, k)
    got = windowed_gather(table, idx, xyz, xyz)
    want = jnp.take(table, idx, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_backward_matches_take_grad(rng):
    n, k, c = 1500, 8, 4
    xyz = jnp.asarray(_cloud(n, rng))
    table = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    idx = knn(xyz, xyz, k)
    w = jnp.asarray(rng.standard_normal((n, k, c)).astype(np.float32))

    def f_win(t):
        return jnp.sum(windowed_gather(t, idx, xyz, xyz) * w)

    def f_ref(t):
        return jnp.sum(jnp.take(t, idx, axis=0) * w)

    g_win = jax.grad(f_win)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(
        np.asarray(g_win), np.asarray(g_ref), rtol=1e-5, atol=1e-6
    )


def test_windowed_scatter_add_fallback_shape(rng):
    """Direct call goes through the kernel path only on TPU; on CPU the
    jitted impl still produces the exact sum via the same math? No — the
    direct function always runs the Pallas impl, so only invoke it through
    the VJP on CPU. Here: grads flow through jit."""
    n, k, c = 1200, 4, 3
    xyz = jnp.asarray(_cloud(n, rng))
    table = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    idx = knn(xyz, xyz, k)
    w = jnp.asarray(rng.standard_normal((n, k, c)).astype(np.float32))

    g = jax.jit(
        jax.grad(lambda t: jnp.sum(windowed_gather(t, idx, xyz, xyz) * w))
    )(table)
    assert g.shape == (n, c)
    assert np.isfinite(np.asarray(g)).all()


def test_randlanet_grads_with_windowed_gather(rng):
    """End-to-end gradient through the model's LFA blocks (fallback path
    on CPU) stays finite and matches loss descent expectations."""
    import dataclasses

    import optax

    from pointunet_tpu.core.config import brats_pointseg_config
    from pointunet_tpu.models.losses import weighted_cross_entropy
    from pointunet_tpu.models.randlanet import init_randlanet
    from pointunet_tpu.ops.pyramid import build_pyramid_batch

    cfg = brats_pointseg_config(num_points=512, k_n=8)
    xyz = jnp.asarray(rng.uniform(0, 1, (1, 512, 3)).astype(np.float32))
    feats = jnp.concatenate(
        [xyz, jnp.asarray(rng.standard_normal((1, 512, 4)).astype(np.float32))],
        -1,
    )
    labels = jnp.asarray(rng.integers(0, 4, (1, 512)).astype(np.int32))
    pyr = build_pyramid_batch(xyz, cfg.k_n, cfg.sub_sampling_ratio)
    model, variables = init_randlanet(jax.random.PRNGKey(0), cfg, num_points=512)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, pyr, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return weighted_cross_entropy(
            logits, labels, cfg.class_weights(), cfg.num_classes
        )

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
