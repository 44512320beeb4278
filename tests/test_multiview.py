"""Direction-transposed training + MULTI_VIEW ensembling.

The reference trains three models (axial/sagittal/coronal) by transposing
every training sample by config.DIRECTION (reference data_sampler.py:174-198,
utils.py:80-103) and ensembles their predictions (train.py:202-219,
eval.py:222-258). Covers: transpose_record semantics, its consistency with
the inference-side view transposes, and a 3-direction train+ensemble run.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.core import TrainConfig, pancreas_saliency_config
from pointunet_tpu.data.sampler import (
    VolumeRecord,
    patch_batches,
    transpose_record,
)
from pointunet_tpu.train.saliency import SaliencyTrainer

VOL = (16, 20, 24)          # distinct dims catch permutation mistakes


def _record(rng):
    img = rng.standard_normal((1,) + VOL).astype(np.float32)
    lab = np.zeros(VOL, np.int32)
    lab[6:10, 8:12, 10:16] = 1
    img[0] += lab * 3.0
    w = np.ones(VOL, np.float32)
    return VolumeRecord(img, w, lab)


def test_transpose_record_permutes_voxels(rng):
    rec = _record(rng)
    sag = transpose_record(rec, "sagittal")      # (D,H,W) -> (W,D,H)
    cor = transpose_record(rec, "coronal")       # (D,H,W) -> (H,D,W)
    assert sag.label.shape == (VOL[2], VOL[0], VOL[1])
    assert cor.label.shape == (VOL[1], VOL[0], VOL[2])
    d, h, w = 7, 9, 11
    assert sag.label[w, d, h] == rec.label[d, h, w]
    assert cor.label[h, d, w] == rec.label[d, h, w]
    assert sag.image[0, w, d, h] == rec.image[0, d, h, w]
    # axial is the identity (same object, no copy)
    assert transpose_record(rec, "axial") is rec


def test_transpose_record_matches_inference_view(rng):
    """Training-side permutation == the inference-side forward transpose
    (SaliencyTrainer._DIR_FWD), so a direction model sees the same layout
    at train and test time."""
    rec = _record(rng)
    for direction in ("axial", "sagittal", "coronal"):
        fwd = SaliencyTrainer._DIR_FWD[direction]
        expect = np.transpose(rec.label, fwd)
        got = transpose_record(rec, direction).label
        assert got.shape == expect.shape
        np.testing.assert_array_equal(got, expect)
        # and the inverse transpose restores the original layout
        inv = SaliencyTrainer._DIR_INV[direction]
        np.testing.assert_array_equal(np.transpose(expect, inv), rec.label)


@pytest.mark.slow
def test_multiview_train_and_ensemble(rng):
    """Train three tiny direction models and ensemble them
    (reference MULTI_VIEW, train.py:202-219)."""
    # cubic patch -> one train-step compile serves all three directions
    cfg = pancreas_saliency_config(
        patch_size=(16, 16, 16), inference_patch_size=(16, 16, 16),
        base_filter=2, depth=2, remat=False, deep_supervision=False,
        batch_size=1, base_lr=0.05, steps_per_epoch=4,
        xstep=16, ystep=16, zstep=16,
    )
    records = [_record(rng) for _ in range(2)]
    states = []
    trainer = SaliencyTrainer(
        cfg, TrainConfig(donate_state=False), attention=False
    )
    for i, direction in enumerate(("axial", "sagittal", "coronal")):
        recs = [transpose_record(r, direction) for r in records]
        state = trainer.init_state(seed=i)
        batches = patch_batches(
            recs, cfg.patch_size, cfg.batch_size,
            np.random.default_rng(i), "one_positive",
        )
        for _, (im, w, lab) in zip(range(4), batches):
            state, _ = trainer.train_step(
                state, jnp.asarray(im), jnp.asarray(w), jnp.asarray(lab)
            )
        states.append(state)

    vol = np.moveaxis(records[0].image, 0, -1)       # (D, H, W, 1)
    probs = trainer.predict_volume_multiview(states, jnp.asarray(vol))
    assert probs.shape == VOL + (cfg.num_class,)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
