"""Full-pipeline learning test: train stage 1 + stage 3 on synthetic blob
volumes, then segment through the fused pipeline and score Dice.

The strongest integration signal the suite has: losses must descend, the
attention must localize the blob, and the fused volume->labels path must
beat a Dice threshold with the *trained* weights. Slow (minutes on CPU);
deselect by default, run with `pytest -m slow`.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.core.config import (
    TrainConfig,
    brats_pointseg_config,
    brats_saliency_config,
)
from pointunet_tpu.models.randlanet import init_randlanet
from pointunet_tpu.models.saliency_unet import init_saliency_unet
from pointunet_tpu.ops.pyramid import build_pyramid_batch
from pointunet_tpu.ops.sampling import sample_cloud_device
from pointunet_tpu.pipeline.fused import FusedPointUnet
from pointunet_tpu.train.metrics import binary_dice
from pointunet_tpu.train.pointseg import PointSegTrainer
from pointunet_tpu.train.saliency import SaliencyTrainer

SHAPE = (32, 32, 16)          # (X, Y, Z)
# 8192 points, not fewer: with the reference decimation ratios
# (4,4,4,4,2) the bottleneck level holds N/512 points. At 2048 points
# that is FOUR points — batch-norm statistics over 4 values make the
# train-mode (batch-stat) and eval-mode (running-stat) networks diverge
# and the eval-mode head collapses to the rarest class (measured: point
# accuracy 0.97 train-mode vs 0.02 eval-mode; running stats were within
# 2-8% of batch stats, so this is NOT staleness). At 8192 points
# (bottleneck 16) eval-mode accuracy is 0.996+. This was the r1/r2
# failure of this test — full isolation in docs/DESIGN.md.
N_POINTS = 8192


def synth_volume(rng):
    """4-modality volume with a bright blob; labels {0 bg-brain, 2 edema,
    3 core} inside the blob."""
    x, y, z = SHAPE
    seg = np.zeros(SHAPE, np.int32)
    cx, cy, cz = rng.integers(10, 22), rng.integers(10, 22), rng.integers(6, 10)
    xx, yy, zz = np.meshgrid(
        np.arange(x), np.arange(y), np.arange(z), indexing="ij"
    )
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * 2) ** 2
    seg[d2 < 36] = 2
    seg[d2 < 9] = 3
    brain = np.zeros(SHAPE, bool)
    brain[2:-2, 2:-2, 1:-1] = True
    mods = rng.standard_normal((4,) + SHAPE).astype(np.float32) * 0.1
    mods[:, brain] += 1.0
    mods[:, seg == 2] += 2.0
    mods[:, seg == 3] += 4.0
    mods[:, ~brain] = 0.0
    seg[~brain] = 0
    return mods, seg


@pytest.mark.slow
def test_full_pipeline_learns(rng):
    volumes = [synth_volume(rng) for _ in range(4)]

    # ---- stage 1: train the (plain) 3D U-Net to find the blob ----
    scfg = brats_saliency_config(
        patch_size=(16, 32, 32), base_filter=4, depth=3, remat=False,
        deep_supervision=False, batch_size=2, base_lr=0.05,
        lr_schedule=((1000, 0.05),),
    )
    strainer = SaliencyTrainer(
        scfg, TrainConfig(donate_state=False), attention=False
    )
    sstate = strainer.init_state()

    def sal_batch(k):
        i = k % len(volumes)
        mods, seg = volumes[i]
        vol = np.transpose(mods, (3, 2, 1, 0))          # (Z, Y, X, C)
        lab = (np.transpose(seg, (2, 1, 0)) > 0).astype(np.int32)
        # center crop to patch
        vol = vol[:, :32, :32][None]
        lab = lab[:, :32, :32][None]
        vol = np.concatenate([vol, vol])                # batch 2
        lab = np.concatenate([lab, lab])
        w = np.ones_like(lab, np.float32)
        return vol[:, :16], w[:, :16], lab[:, :16]

    # 150 steps: enough for the mask to localize the blob (measured: at 40
    # steps the 0.5-threshold mask over-covers the brain, diluting the
    # point budget; by ~120-200 steps it covers exactly the ~425 tumor
    # voxels) — the r2 failure mode, root-caused in docs/DESIGN.md
    losses = []
    for k in range(150):
        v, w, l = sal_batch(k)
        sstate, m = strainer.train_step(
            sstate, jnp.asarray(v), jnp.asarray(w), jnp.asarray(l)
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::8]

    # ---- stage 3: train RandLA-Net on context-sampled clouds ----
    # lr 1e-3 is the reference's Pancreas rate (helper_tool.py:69); the
    # BraTS 1e-4 needs thousands of steps to memorize even a toy task.
    # bn_momentum 0.9 (vs the reference's 0.99, helper_tf_util.py:167):
    # at the reference's 29.5k-step scale 0.99-momentum running stats
    # converge; at a 100-step toy run they would stay ~60% stale
    pcfg = brats_pointseg_config(
        num_points=N_POINTS, k_n=8, learning_rate=1e-3, bn_momentum=0.9
    )
    ptrainer = PointSegTrainer(
        pcfg, TrainConfig(donate_state=False), num_points=N_POINTS
    )
    pstate = ptrainer.init_state()
    key = jax.random.PRNGKey(0)
    clouds = []
    for mods, seg in volumes:
        cloud = sample_cloud_device(
            jnp.asarray(mods), jnp.asarray((seg > 0).astype(np.uint8)),
            key, N_POINTS, labels=jnp.asarray(seg),
        )
        clouds.append(cloud)
    plosses = []
    for k in range(100):
        c = clouds[k % len(clouds)]
        feats = jnp.concatenate([c.xyz, c.features], -1)[None]
        pstate, m = ptrainer.train_step(
            pstate, c.xyz[None], feats, c.labels[None]
        )
        plosses.append(float(m["loss"]))
    assert plosses[-1] < plosses[0] * 0.2, plosses[::12]

    # ---- fused pipeline with the TRAINED weights ----
    svars = {"params": sstate.params}
    if jax.tree_util.tree_leaves(sstate.batch_stats):
        svars["batch_stats"] = sstate.batch_stats
    pvars = {"params": pstate.params}
    if jax.tree_util.tree_leaves(pstate.batch_stats):
        pvars["batch_stats"] = pstate.batch_stats

    pipe = FusedPointUnet(
        strainer.model, svars, ptrainer.model, pvars, scfg, pcfg,
        threshold=0.5, volume_shape=SHAPE,
    )
    dices = []
    for mods, seg in volumes:
        labels = pipe.segment_volume(mods, brats_labels=False)
        dices.append(binary_dice(labels > 0, seg > 0))
    mean_dice = float(np.mean(dices))
    # trained-on-these-volumes memorization: should segment them well
    # (bar tightened from r2's 0.5 after the bottleneck-BN fix; the
    # healthy pipeline memorizes these volumes to ~0.9+)
    assert mean_dice > 0.7, dices
