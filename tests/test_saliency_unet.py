import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.core import brats_saliency_config, pancreas_saliency_config
from pointunet_tpu.models.saliency_unet import (
    UNet3D,
    SaliencyUNet,
    init_saliency_unet,
)
from pointunet_tpu.models import saliency_dice_loss

TINY_PATCH = (16, 32, 32)


def test_saliency_unet_shapes():
    cfg = pancreas_saliency_config(patch_size=TINY_PATCH, base_filter=4)
    model, variables = init_saliency_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1,) + TINY_PATCH + (cfg.in_channels,))
    logits = jax.jit(
        lambda v, a: model.apply(v, a, train=False)
    )(variables, x)
    assert logits.shape == (1,) + TINY_PATCH + (cfg.num_class,)
    assert np.isfinite(np.asarray(logits)).all()


def test_saliency_unet_brats_channels():
    cfg = brats_saliency_config(patch_size=TINY_PATCH, base_filter=4)
    model, variables = init_saliency_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1,) + TINY_PATCH + (4,))
    logits = jax.jit(
        lambda v, a: model.apply(v, a, train=False)
    )(variables, x)
    assert logits.shape == (1,) + TINY_PATCH + (2,)


def test_saliency_no_attention_toggles():
    cfg = pancreas_saliency_config(
        patch_size=TINY_PATCH, base_filter=4, ca_attention=False,
        sa_attention=False,
    )
    model, variables = init_saliency_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1,) + TINY_PATCH + (1,))
    logits = jax.jit(
        lambda v, a: model.apply(v, a, train=False)
    )(variables, x)
    assert logits.shape == (1,) + TINY_PATCH + (2,)


def test_plain_unet3d_deep_supervision():
    cfg = pancreas_saliency_config(patch_size=TINY_PATCH, base_filter=4)
    model, variables = init_saliency_unet(
        jax.random.PRNGKey(0), cfg, attention=False
    )
    x = jnp.ones((1,) + TINY_PATCH + (1,))
    logits = jax.jit(
        lambda v, a: model.apply(v, a, train=False)
    )(variables, x)
    assert logits.shape == (1,) + TINY_PATCH + (2,)


def test_saliency_dice_loss_perfect_prediction():
    labels = np.zeros((1, 4, 4, 4), np.int32)
    labels[0, 1:3, 1:3, 1:3] = 1
    logits = np.where(
        (labels == 1)[..., None],
        np.array([-20.0, 20.0]),
        np.array([20.0, -20.0]),
    ).astype(np.float32)
    weight = np.ones_like(labels, np.float32)
    loss = saliency_dice_loss(
        jnp.asarray(logits), jnp.asarray(weight), jnp.asarray(labels)
    )
    assert float(loss) < 1e-3

    # inverted prediction is maximally wrong
    loss_bad = saliency_dice_loss(
        jnp.asarray(-logits), jnp.asarray(weight), jnp.asarray(labels)
    )
    assert float(loss_bad) > 0.9


def test_saliency_train_step_grad_accum(rng):
    """Gradient-accumulated train step runs and reduces loss on a fixed
    batch (covers the scan-over-microbatches path)."""
    import jax
    from pointunet_tpu.core import TrainConfig
    from pointunet_tpu.train.saliency import SaliencyTrainer

    # the plain depth-3 U-Net keeps the XLA:CPU compile tractable (the
    # attention net's train-step compile runs >10 min on CPU); the
    # grad-accum scan being covered is model-independent
    cfg = pancreas_saliency_config(
        patch_size=TINY_PATCH, base_filter=4, batch_size=2,
        steps_per_epoch=5, base_lr=0.05, depth=3, remat=False,
        deep_supervision=False,
    )
    trainer = SaliencyTrainer(
        cfg, TrainConfig(donate_state=False), attention=False
    )
    state = trainer.init_state()
    imgs = rng.standard_normal((2,) + TINY_PATCH + (1,)).astype(np.float32)
    labels = np.zeros((2,) + TINY_PATCH, np.int32)
    labels[:, 4:10, 8:20, 8:20] = 1
    imgs[..., 0] += labels * 3.0
    weights = np.ones((2,) + TINY_PATCH, np.float32)
    losses = []
    for _ in range(8):
        state, m = trainer.train_step(
            state, jnp.asarray(imgs), jnp.asarray(weights), jnp.asarray(labels)
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_lr_schedule_values():
    """Stepped schedule must hit the configured absolute values (optax
    piecewise scales compose multiplicatively - regression for the
    cumulative-collapse bug)."""
    from pointunet_tpu.core import TrainConfig
    from pointunet_tpu.train.saliency import SaliencyTrainer

    cfg = pancreas_saliency_config(
        patch_size=TINY_PATCH, base_filter=4, depth=3, remat=False,
        deep_supervision=False, steps_per_epoch=10,
    )
    trainer = SaliencyTrainer(
        cfg, TrainConfig(donate_state=False), attention=False
    )
    sched = trainer._schedule
    for epoch, expect in cfg.lr_schedule:
        got = float(sched(epoch * cfg.steps_per_epoch + 1))
        assert abs(got - expect) / expect < 1e-5, (epoch, got, expect)


def test_sa_gate_stride_checkpoint_transfer():
    """sa_gate_stride=2 (strided-gate perf mode, config.py) must keep the
    exact param tree of the reference-exact stride-1 net — checkpoints
    transfer — and a stride-1 param set applied at stride 2 must produce
    finite full-resolution logits that stay close to the stride-1 output
    (the gate is a smooth sigmoid field; pooled-input gating is a
    documented approximation, not a different function)."""
    cfg1 = brats_saliency_config(patch_size=TINY_PATCH, base_filter=4)
    cfg2 = dataclasses.replace(cfg1, sa_gate_stride=2)
    model1, variables = init_saliency_unet(jax.random.PRNGKey(0), cfg1)
    model2 = SaliencyUNet(config=cfg2)

    tree1 = jax.tree_util.tree_structure(variables)
    shapes2 = jax.eval_shape(
        lambda: model2.init(
            jax.random.PRNGKey(0),
            jnp.ones((1,) + TINY_PATCH + (4,)),
            train=False,
        )
    )
    assert jax.tree_util.tree_structure(shapes2) == tree1
    for p1, p2 in zip(
        jax.tree_util.tree_leaves(variables),
        jax.tree_util.tree_leaves(shapes2),
    ):
        assert p1.shape == p2.shape

    x = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((1,) + TINY_PATCH + (4,))
        .astype(np.float32)
    )
    out1 = jax.jit(lambda v, a: model1.apply(v, a, train=False))(variables, x)
    out2 = jax.jit(lambda v, a: model2.apply(v, a, train=False))(variables, x)
    assert out2.shape == out1.shape
    a1, a2 = np.asarray(out1), np.asarray(out2)
    assert np.isfinite(a2).all()
    # same params, smoother gate: logits stay correlated and the argmax
    # map barely moves (random init; the on-chip Dice A/B is the real bar)
    agree = float((a1.argmax(-1) == a2.argmax(-1)).mean())
    assert agree > 0.95, agree
