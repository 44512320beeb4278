import numpy as np

from pointunet_tpu.data.sampler import VolumeRecord, patch_batches, random_patch


def _record(shape=(20, 24, 24), tumor=True, channels=2, rng=None):
    rng = rng or np.random.default_rng(0)
    image = rng.standard_normal((channels,) + shape).astype(np.float32)
    weight = np.ones(shape, np.float32)
    label = np.zeros(shape, np.int32)
    if tumor:
        label[8:12, 10:14, 10:14] = 1
    return VolumeRecord(image, weight, label)


def test_random_patch_shapes(rng):
    rec = _record(rng=rng)
    img, w, lab = random_patch(rec, (8, 16, 16), rng)
    assert img.shape == (2, 8, 16, 16)
    assert w.shape == (8, 16, 16)
    assert lab.shape == (8, 16, 16)


def test_random_patch_pads_small_volume(rng):
    rec = _record(shape=(4, 8, 8), rng=rng)
    img, w, lab = random_patch(rec, (8, 16, 16), rng)
    assert img.shape == (2, 8, 16, 16)


def test_patch_batches_one_positive(rng):
    recs = [_record(tumor=False, rng=rng), _record(tumor=True, rng=rng)]
    it = patch_batches(recs, (8, 16, 16), 2, rng, sampling="one_positive")
    for _ in range(5):
        imgs, weights, labels = next(it)
        assert imgs.shape == (2, 8, 16, 16, 2)   # channels-last
        assert labels.max() > 0  # at least one positive crop per batch


def test_patch_batches_all_positive(rng):
    recs = [_record(tumor=True, rng=rng)]
    it = patch_batches(recs, (8, 16, 16), 2, rng, sampling="all_positive")
    imgs, weights, labels = next(it)
    assert (labels.reshape(2, -1).max(axis=1) > 0).all()
