"""Tests for the completeness batch: blocks prep, mixup, N4 fallback,
weighted dice, debug utilities."""
import numpy as np
import jax.numpy as jnp

from pointunet_tpu.cli.data_prepare_blocks import block_to_points
from pointunet_tpu.cli.n4_correction import polynomial_bias_correct
from pointunet_tpu.core import StepTimer, block64_pointseg_config, format_eta
from pointunet_tpu.data.sampler import VolumeRecord, mixup_batches, patch_batches
from pointunet_tpu.models.losses import (
    point_dice_weighted,
    saliency_dice_loss_mixup,
)


def test_block_to_points_budget(rng):
    vol = rng.standard_normal((4, 16, 16, 16)).astype(np.float32)
    weight = np.zeros((16, 16, 16), np.float32)
    weight[4:12, 4:12, 4:12] = 1.0
    label = np.zeros((16, 16, 16), np.int32)
    label[6:8, 6:8, 6:8] = 2
    xyz, feats, labels = block_to_points(vol, label, weight, 2048)
    assert xyz.shape == (2048, 3)
    assert feats.shape == (2048, 4)
    # every brain voxel appears (duplication pads to budget)
    assert len(np.unique(xyz, axis=0)) == 8 ** 3
    assert (labels == 2).sum() > 0


def test_block64_config():
    cfg = block64_pointseg_config()
    assert cfg.name == "BraTS_Block64"
    w = cfg.class_weights()
    assert w[0] < w[3]  # rare classes get bigger weights


def test_mixup_batches(rng):
    rec = VolumeRecord(
        rng.standard_normal((1, 16, 16, 16)).astype(np.float32),
        np.ones((16, 16, 16), np.float32),
        (rng.uniform(size=(16, 16, 16)) > 0.7).astype(np.int32),
    )
    base = patch_batches([rec], (8, 8, 8), 2, rng, sampling="random")
    mixed = mixup_batches(base, num_classes=2, rng=rng)
    images, weights, targets = next(mixed)
    assert targets.shape == (2, 8, 8, 8, 2)
    np.testing.assert_allclose(targets.sum(-1), 1.0, rtol=1e-5)
    assert not np.array_equal(targets, targets.round())  # actually mixed


def test_saliency_mixup_loss_perfect():
    target = np.zeros((1, 4, 4, 4, 2), np.float32)
    target[..., 0] = 1.0
    target[0, 1:3, 1:3, 1:3, 0] = 0.0
    target[0, 1:3, 1:3, 1:3, 1] = 1.0
    logits = np.where(target[..., 1:] > 0.5,
                      np.array([-20.0, 20.0]), np.array([20.0, -20.0]))
    weight = np.ones((1, 4, 4, 4), np.float32)
    loss = saliency_dice_loss_mixup(
        jnp.asarray(logits), jnp.asarray(weight), jnp.asarray(target)
    )
    assert float(loss) < 1e-3


def test_point_dice_weighted():
    logits = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    labels = jnp.asarray([0, 1])
    loss = point_dice_weighted(logits, labels)
    assert 0.0 <= float(loss) <= 1.0


def test_polynomial_bias_correct(rng):
    base = rng.uniform(50, 100, (24, 24, 24)).astype(np.float32)
    zz = np.linspace(-0.5, 0.5, 24)
    field = np.exp(0.8 * zz)[None, None, :]
    vol = (base * field).astype(np.float32)
    corrected = polynomial_bias_correct(vol)
    # the z-trend should shrink substantially
    def z_trend(v):
        prof = v.mean(axis=(0, 1))
        return prof.max() / prof.min()
    assert z_trend(corrected) < z_trend(vol) * 0.6


def test_step_timer():
    t = StepTimer(total_steps=100)
    out = t.tick(10)
    assert out["ms_per_batch"] >= 0
    assert out["eta_sec"] >= 0
    assert format_eta(3725) == "1:02:05"
