"""Tiny synthetic end-to-end pipeline test: nii.gz -> segmentation.

Exercises the fused PointUnetPipeline with untrained (random) weights —
checking shapes, dataflow, determinism of the stage hand-offs, and that all
ground-truth foreground voxels survive the context-aware sampling when the
mask covers them.
"""
import dataclasses

import jax
import numpy as np
import pytest

from pointunet_tpu.core import (
    brats_pointseg_config,
    brats_saliency_config,
)
from pointunet_tpu.models.randlanet import init_randlanet
from pointunet_tpu.models.saliency_unet import init_saliency_unet
from pointunet_tpu.pipeline import PointUnetPipeline

from util_synthetic import make_brats_case


@pytest.fixture(scope="module")
def tiny_pipeline():
    scfg = brats_saliency_config(
        base_filter=4,
        patch_size=(16, 32, 32),
        inference_patch_size=(16, 32, 32),
        xstep=16,
        ystep=32,
        zstep=32,
    )
    pcfg = brats_pointseg_config(num_points=2048, k_n=8)
    rng = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(rng, scfg)
    pmodel, pvars = init_randlanet(rng, pcfg, num_points=2048)
    return PointUnetPipeline(
        smodel, svars, pmodel, pvars, scfg, pcfg, threshold=0.9
    )


def test_attention_and_binary_map_shapes(tiny_pipeline, tmp_path, rng):
    from pointunet_tpu.data.loader import load_brats_case

    case_dir, seg = make_brats_case(str(tmp_path), "caseA", rng=rng)
    rec, meta = load_brats_case(case_dir, with_label=True, crop=False)
    mods = np.transpose(rec.image, (0, 3, 2, 1))      # (C, X, Y, Z)
    amap = tiny_pipeline.attention_map(mods)
    assert amap.shape == mods.shape[1:]
    assert np.isfinite(amap).all()
    assert (amap >= 0).all() and (amap <= 1).all()
    binary = tiny_pipeline.binary_map(mods)
    assert set(np.unique(binary)) <= {0, 1}


def test_segment_volume_end_to_end(tiny_pipeline, tmp_path, rng):
    from pointunet_tpu.data.loader import load_brats_case

    case_dir, seg = make_brats_case(str(tmp_path), "caseB", rng=rng)
    rec, meta = load_brats_case(case_dir, with_label=True, crop=False)
    mods = np.transpose(rec.image, (0, 3, 2, 1))

    # force the mask to the ground-truth tumor: every tumor voxel must be
    # sampled and labeled (untrained net labels arbitrarily, but the
    # scatter covers exactly the sampled voxels)
    labels = tiny_pipeline.segment_volume(
        mods, mask=(seg > 0).astype(np.uint8), brats_labels=True
    )
    assert labels.shape == mods.shape[1:]
    assert set(np.unique(labels)) <= {0, 1, 2, 4}
    # predictions only live on nonzero-modality voxels
    nz = (mods != 0).any(axis=0)
    assert (labels[~nz] == 0).all()


def test_pipeline_deterministic(tiny_pipeline, tmp_path, rng):
    from pointunet_tpu.data.loader import load_brats_case

    case_dir, seg = make_brats_case(str(tmp_path), "caseC", rng=rng)
    rec, _ = load_brats_case(case_dir, with_label=False, crop=False)
    mods = np.transpose(rec.image, (0, 3, 2, 1))
    m1 = tiny_pipeline.binary_map(mods)
    m2 = tiny_pipeline.binary_map(mods)
    np.testing.assert_array_equal(m1, m2)
