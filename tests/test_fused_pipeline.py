"""On-device sampler and fused pipeline (tiny CPU shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.core import brats_pointseg_config, brats_saliency_config
from pointunet_tpu.models.randlanet import init_randlanet
from pointunet_tpu.models.saliency_unet import init_saliency_unet
from pointunet_tpu.ops.sampling import sample_cloud_device
from pointunet_tpu.pipeline.fused import FusedPointUnet


def test_sample_cloud_device_keeps_salient(rng):
    mods = np.zeros((2, 16, 16, 8), np.float32)
    mods[:, 2:14, 2:14, 1:7] = rng.uniform(0.5, 1.5, (12, 12, 6))
    mask = np.zeros((16, 16, 8), np.uint8)
    mask[6:10, 6:10, 3:5] = 1
    labels = mask.astype(np.int32) * 2

    cloud = sample_cloud_device(
        jnp.asarray(mods), jnp.asarray(mask), jax.random.PRNGKey(0),
        num_points=256, labels=jnp.asarray(labels),
    )
    origin = np.asarray(cloud.xyz_origin)
    # all salient voxels selected
    sel_salient = mask[origin[:, 0], origin[:, 1], origin[:, 2]]
    assert sel_salient.sum() == mask.sum()
    # no empty voxels picked (enough nonzero voxels exist)
    nz = (mods != 0).any(0)
    assert nz[origin[:, 0], origin[:, 1], origin[:, 2]].all()
    # labels gathered correctly
    np.testing.assert_array_equal(
        np.asarray(cloud.labels),
        labels[origin[:, 0], origin[:, 1], origin[:, 2]],
    )
    # xyz normalized by dims
    np.testing.assert_allclose(
        np.asarray(cloud.xyz),
        origin / np.array([16, 16, 8], np.float32),
        rtol=1e-6,
    )


def test_sample_cloud_device_oversubscribed_salient(rng):
    """More salient voxels than budget -> random salient subset."""
    mods = np.ones((1, 8, 8, 8), np.float32)
    mask = np.ones((8, 8, 8), np.uint8)
    cloud = sample_cloud_device(
        jnp.asarray(mods), jnp.asarray(mask), jax.random.PRNGKey(1),
        num_points=64,
    )
    origin = np.asarray(cloud.xyz_origin)
    assert len(np.unique(origin, axis=0)) == 64


def test_sample_cloud_device_graded_tiers(rng):
    """Graded mask {0,1,2}: every core voxel admitted before any band
    voxel; band fills the remaining slack before plain background."""
    mods = np.ones((1, 16, 16, 8), np.float32)
    mask = np.zeros((16, 16, 8), np.uint8)
    mask[2:10, 2:10, 2:6] = 2                      # 256 core voxels
    mask[10:14, 2:10, 2:6] = 1                     # 128 band voxels
    # budget below core+band: ALL 256 core kept, band randomly subsampled
    cloud = sample_cloud_device(
        jnp.asarray(mods), jnp.asarray(mask), jax.random.PRNGKey(2),
        num_points=320,
    )
    o = np.asarray(cloud.xyz_origin)
    tiers = mask[o[:, 0], o[:, 1], o[:, 2]]
    assert (tiers == 2).sum() == 256               # full core
    assert (tiers == 1).sum() == 64                # slack goes to band
    assert (tiers == 0).sum() == 0
    # budget above core+band: all of both, remainder random background
    cloud = sample_cloud_device(
        jnp.asarray(mods), jnp.asarray(mask), jax.random.PRNGKey(3),
        num_points=512,
    )
    o = np.asarray(cloud.xyz_origin)
    tiers = mask[o[:, 0], o[:, 1], o[:, 2]]
    assert (tiers == 2).sum() == 256 and (tiers == 1).sum() == 128
    assert (tiers == 0).sum() == 128


def test_fused_pipeline_band_mask_graded(rng):
    """mask_band > 0 produces a graded uint8 attention mask with the band
    strictly around/below the core tier, and the pipeline still runs."""
    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=2048, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=2048)
    pipe = FusedPointUnet(
        smodel, svars, pmodel, pvars, scfg, pcfg,
        threshold=0.5, volume_shape=(32, 32, 16),
        att_downscale=2, mask_band=2,
    )
    mods = rng.standard_normal((4, 32, 32, 16)).astype(np.float32)
    mask = np.asarray(pipe._attention_mask(jnp.asarray(mods)))
    assert mask.dtype == np.uint8 and set(np.unique(mask)) <= {0, 1, 2}
    labels = pipe.segment_volume(mods)
    assert labels.shape == (32, 32, 16)
    # mutually exclusive with dilation
    with pytest.raises(ValueError):
        FusedPointUnet(
            smodel, svars, pmodel, pvars, scfg, pcfg,
            volume_shape=(32, 32, 16), mask_band=2, mask_dilate=2,
        )


def test_fused_pipeline_tiny(rng):
    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=2048, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=2048)
    pipe = FusedPointUnet(
        smodel, svars, pmodel, pvars, scfg, pcfg,
        threshold=0.9, volume_shape=(32, 32, 16),
    )
    mods = rng.standard_normal((4, 32, 32, 16)).astype(np.float32)
    mods[:, :4] = 0.0  # some exact-zero region
    labels = pipe.segment_volume(mods)
    assert labels.shape == (32, 32, 16)
    assert set(np.unique(labels)) <= {0, 1, 2, 4}


def test_fused_pipeline_batch_sharded(rng):
    """Data-parallel fused inference over a 2-device mesh (GSPMD)."""
    from pointunet_tpu.core import MeshConfig
    from pointunet_tpu.parallel.mesh import make_mesh

    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=2048, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=2048)
    pipe = FusedPointUnet(
        smodel, svars, pmodel, pvars, scfg, pcfg,
        threshold=0.9, volume_shape=(32, 32, 16),
    )
    mods = rng.standard_normal((2, 4, 32, 32, 16)).astype(np.float32)
    mods[:, :, :4] = 0.0
    mesh = make_mesh(MeshConfig(data=2, point=1), devices=jax.devices()[:2])
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    labels = pipe.segment_batch_device(jnp.asarray(mods), keys, mesh=mesh)
    labels = np.asarray(labels)
    assert labels.shape == (2, 16, 32, 32)
    # must match the single-volume path volume-for-volume
    one = np.asarray(
        pipe.segment_device(jnp.asarray(mods[0]), keys[0])
    )
    np.testing.assert_array_equal(labels[0], one)


def test_fused_pipeline_roi_crop(rng):
    """Static brain-ROI attention (reference crops to the brain bbox
    before attention inference, data_sampler.py:448): the mask must be
    empty outside the window, the window must cover the brain bbox
    center, and the end-to-end path must still produce labels."""
    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=1024, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=1024)
    pipe = FusedPointUnet(
        smodel, svars, pmodel, pvars, scfg, pcfg,
        # threshold 0: every in-ROI voxel is salient -> mask == ROI window
        threshold=0.0, volume_shape=(32, 32, 16), roi_shape=(16, 16, 16),
    )
    mods = np.zeros((4, 32, 32, 16), np.float32)
    # brain occupying x 8..24, y 12..28, z 2..14 -> centers (16, 20, 8)
    mods[:, 8:24, 12:28, 2:14] = rng.uniform(
        0.5, 1.5, (4, 16, 16, 12)
    ).astype(np.float32)
    mask = np.asarray(pipe._attention_mask(jnp.asarray(mods)))
    assert mask.shape == (32, 32, 16)
    # window centered on the bbox center, clamped: x [8, 24), y [12, 28),
    # z clamps to [0, 16)
    expect = np.zeros((32, 32, 16), bool)
    expect[8:24, 12:28, 0:16] = True
    np.testing.assert_array_equal(mask, expect)
    labels = pipe.segment_volume(mods)
    assert labels.shape == (32, 32, 16)
    # the batched path vmaps the dynamic-slice window per volume
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    batched = np.asarray(
        pipe.segment_batch_device(
            jnp.asarray(np.stack([mods, mods])), keys
        )
    )
    assert batched.shape == (2, 16, 32, 32)
    one = np.asarray(pipe.segment_device(jnp.asarray(mods), keys[0]))
    np.testing.assert_array_equal(batched[0], one)


def test_fused_pipeline_roi_matches_full_when_roi_is_volume(rng):
    """roi_shape == volume_shape must be numerically identical to the
    un-cropped path (same window, same padding, same IN footprint)."""
    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=1024, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=1024)
    common = (smodel, svars, pmodel, pvars, scfg, pcfg)
    full = FusedPointUnet(*common, threshold=0.5, volume_shape=(32, 32, 16))
    roi = FusedPointUnet(
        *common, threshold=0.5, volume_shape=(32, 32, 16),
        roi_shape=(48, 32, 16),   # clamps to the volume shape
    )
    assert roi.roi_shape == (32, 32, 16)
    mods = rng.standard_normal((4, 32, 32, 16)).astype(np.float32)
    a = np.asarray(full._attention_mask(jnp.asarray(mods)))
    b = np.asarray(roi._attention_mask(jnp.asarray(mods)))
    np.testing.assert_array_equal(a, b)


def test_fused_pipeline_att_downscale(rng):
    """att_downscale perf mode (pipeline/fused.py): the saliency net runs
    on an s^3-pooled window, the prob map is resized back. The mask must
    stay confined to the ROI window, the pad-to-multiple-of-16s plumbing
    must hold at a shape that is NOT 32-divisible, and the end-to-end
    path must still produce labels. threshold=0.0 makes every in-window
    voxel salient regardless of resolution, so the mask must equal the
    ROI window exactly — an invariance the resize cannot break. Shapes
    deliberately match test_fused_pipeline_roi_crop so every program
    except the s=2 attention graph is a compile-cache hit."""
    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=1024, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=1024)
    pipe = FusedPointUnet(
        smodel, svars, pmodel, pvars, scfg, pcfg,
        threshold=0.0, volume_shape=(32, 32, 16), roi_shape=(16, 16, 16),
        att_downscale=2,
    )
    mods = np.zeros((4, 32, 32, 16), np.float32)
    mods[:, 8:24, 12:28, 2:14] = rng.uniform(
        0.5, 1.5, (4, 16, 16, 12)
    ).astype(np.float32)
    mask = np.asarray(pipe._attention_mask(jnp.asarray(mods)))
    expect = np.zeros((32, 32, 16), bool)
    expect[8:24, 12:28, 0:16] = True
    np.testing.assert_array_equal(mask, expect)
    labels = pipe.segment_volume(mods)
    assert labels.shape == (32, 32, 16)
    assert set(np.unique(labels)) <= {0, 1, 2, 4}


def test_fused_pipeline_mask_dilate(rng):
    """mask_dilate must equal a box binary-dilation of the undilated
    mask: max-pool(probs) >= t  ==  dilate(probs >= t) for max windows.
    Volume (32, 32, 16) pads to exactly (16, 32, 32) (no padding), so
    there is no edge bleed and the equivalence is exact."""
    scfg = brats_saliency_config(base_filter=4)
    pcfg = brats_pointseg_config(num_points=1024, k_n=8)
    k = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(k, scfg)
    pmodel, pvars = init_randlanet(k, pcfg, num_points=1024)
    common = (smodel, svars, pmodel, pvars, scfg, pcfg)
    plain = FusedPointUnet(
        *common, threshold=0.5, volume_shape=(32, 32, 16)
    )
    dil = FusedPointUnet(
        *common, threshold=0.5, volume_shape=(32, 32, 16), mask_dilate=1
    )
    mods = rng.standard_normal((4, 32, 32, 16)).astype(np.float32)
    a = np.asarray(plain._attention_mask(jnp.asarray(mods)))
    b = np.asarray(dil._attention_mask(jnp.asarray(mods)))

    # numpy 3x3x3 box dilation of `a`
    want = np.zeros_like(a)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                sx = slice(max(dx, 0), a.shape[0] + min(dx, 0))
                tx = slice(max(-dx, 0), a.shape[0] + min(-dx, 0))
                sy = slice(max(dy, 0), a.shape[1] + min(dy, 0))
                ty = slice(max(-dy, 0), a.shape[1] + min(-dy, 0))
                sz = slice(max(dz, 0), a.shape[2] + min(dz, 0))
                tz = slice(max(-dz, 0), a.shape[2] + min(-dz, 0))
                want[tx, ty, tz] |= a[sx, sy, sz]
    assert a.sum() > 0, "degenerate test: empty undilated mask"
    np.testing.assert_array_equal(b, want)
