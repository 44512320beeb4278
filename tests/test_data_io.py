import numpy as np
import pytest

from pointunet_tpu.data import nifti, read_ply, write_ply
from pointunet_tpu.data import (
    context_aware_sample,
    crop_brain_region,
    extract_roi,
    insert_roi,
    intensity_normalize_nonzero,
    sample_cloud,
    volume_to_points,
)


def test_nifti_roundtrip(tmp_path, rng):
    for suffix in (".nii", ".nii.gz"):
        data = rng.standard_normal((7, 9, 5)).astype(np.float32)
        affine = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
        path = str(tmp_path / f"vol{suffix}")
        nifti.save(nifti.Nifti1Image(data, affine), path)
        img = nifti.load(path)
        np.testing.assert_allclose(img.get_fdata(), data, rtol=1e-6)
        np.testing.assert_allclose(img.affine, affine)


def test_nifti_uint8_labels(tmp_path):
    labels = np.zeros((4, 4, 4), np.uint8)
    labels[1:3, 1:3, 1:3] = 4
    path = str(tmp_path / "seg.nii.gz")
    nifti.save(labels, path)
    img = nifti.load(path)
    np.testing.assert_array_equal(img.data, labels)
    assert img.data.dtype == np.uint8


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.standard_normal((20, 3)).astype(np.float32)
    colors = rng.standard_normal((20, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 20).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    write_ply(
        path,
        (xyz, colors, labels),
        ["x", "y", "z", "t1ce", "t1", "flair", "t2", "class"],
    )
    data = read_ply(path)
    np.testing.assert_allclose(data["x"], xyz[:, 0])
    np.testing.assert_allclose(data["t2"], colors[:, 3])
    np.testing.assert_array_equal(data["class"], labels)


def test_intensity_normalize_nonzero():
    v = np.zeros((4, 4, 4), np.float32)
    v[1:3] = np.arange(32, dtype=np.float32).reshape(2, 4, 4) + 1
    out = intensity_normalize_nonzero(v)
    nz = out[v > 0]
    assert abs(nz.mean()) < 1e-5
    assert abs(nz.std() - 1.0) < 1e-5
    assert (out[v == 0] == 0).all()


def test_crop_brain_region():
    mods = np.zeros((2, 20, 20, 20), np.float32)
    mods[:, 8:12, 8:12, 8:12] = 5.0
    label = np.zeros((20, 20, 20), np.int32)
    label[9:11, 9:11, 9:11] = 1
    cropped, weight, lab, bbox = crop_brain_region(mods, label, margin=2)
    assert cropped.shape[0] == 2
    assert cropped.shape[1:] == (8, 8, 8)  # 4 extent + 2 margin each side
    assert lab.sum() == 8
    assert weight.max() == 1.0


def test_volume_to_points_and_sampling(rng):
    mods = np.zeros((2, 8, 8, 8), np.float32)
    mods[:, 2:6, 2:6, 2:6] = rng.uniform(0.5, 1.5, (4, 4, 4))
    labels = np.zeros((8, 8, 8), np.int32)
    labels[3:5, 3:5, 3:5] = 1
    cloud = volume_to_points(mods, labels)
    assert cloud.xyz.shape[0] == 64  # 4^3 nonzero voxels
    assert cloud.features.shape == (64, 2)
    assert cloud.labels.sum() == 8
    assert (cloud.xyz >= 0).all() and (cloud.xyz < 1).all()
    # original coords map back to the right labels
    x, y, z = cloud.xyz_origin.T
    np.testing.assert_array_equal(labels[x, y, z], cloud.labels)

    sampled = sample_cloud(cloud, 32, rng)
    assert sampled.xyz.shape == (32, 3)
    assert sampled.labels.sum() == 8  # all tumor kept


def test_context_aware_sample_edge_cases(rng):
    labels = np.ones(100, np.int32)  # all foreground, budget smaller
    idx = context_aware_sample(labels, 50, rng)
    assert idx.shape == (50,)
    assert np.unique(idx).size == 50

    labels = np.zeros(10, np.int32)  # background only, oversampled budget
    idx = context_aware_sample(labels, 30, rng)
    assert idx.shape == (30,)


def test_roi_roundtrip(rng):
    vol = rng.standard_normal((10, 12, 14)).astype(np.float32)
    patch = extract_roi(vol, (5, 6, 7), (4, 4, 4))
    np.testing.assert_allclose(patch, vol[3:7, 4:8, 5:9])
    # near the border: zero-padded
    patch = extract_roi(vol, (0, 0, 0), (4, 4, 4))
    assert patch.shape == (4, 4, 4)
    np.testing.assert_allclose(patch[2:, 2:, 2:], vol[:2, :2, :2])
    out = insert_roi(np.zeros_like(vol), np.ones((4, 4, 4), np.float32), (5, 6, 7))
    assert out.sum() == 64
