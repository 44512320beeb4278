import numpy as np
import pytest

from pointunet_tpu.ops import knn, knn_batch, knn_with_distances


def brute_force_np(support, query, k):
    d = ((query[:, None, :] - support[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k], np.sort(d, axis=1)[:, :k]


def test_knn_exact_small(rng):
    support = rng.standard_normal((200, 3)).astype(np.float32)
    query = rng.standard_normal((57, 3)).astype(np.float32)
    idx = np.asarray(knn(support, query, 4))
    ref_idx, ref_d = brute_force_np(support, query, 4)
    # compare by distance (ties may reorder indices)
    d = ((query[:, None, :] - support[np.newaxis, :, :]) ** 2).sum(-1)
    got_d = np.take_along_axis(d, idx, axis=1)
    np.testing.assert_allclose(np.sort(got_d, 1), ref_d, rtol=1e-4, atol=1e-5)


def test_knn_self_includes_self(rng):
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    idx = np.asarray(knn(pts, pts, 1))
    np.testing.assert_array_equal(idx[:, 0], np.arange(128))


def test_knn_chunked_matches_unchunked(rng):
    support = rng.standard_normal((1000, 3)).astype(np.float32)
    query = rng.standard_normal((333, 3)).astype(np.float32)
    a = np.asarray(knn(support, query, 8, query_block=64, support_chunk=128))
    b = np.asarray(knn(support, query, 8))
    d = ((query[:, None, :] - support[np.newaxis, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.sort(np.take_along_axis(d, a, 1), 1),
        np.sort(np.take_along_axis(d, b, 1), 1),
        rtol=1e-4,
        atol=1e-5,
    )


def test_knn_with_distances(rng):
    support = rng.standard_normal((300, 3)).astype(np.float32)
    query = rng.standard_normal((100, 3)).astype(np.float32)
    idx, d2 = knn_with_distances(support, query, 5)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    _, ref_d = brute_force_np(support, query, 5)
    np.testing.assert_allclose(np.sort(d2, 1), ref_d, rtol=1e-4, atol=1e-5)
    assert np.all(np.diff(d2, axis=1) >= -1e-5), "distances sorted ascending"


def test_knn_batch(rng):
    support = rng.standard_normal((2, 150, 3)).astype(np.float32)
    query = rng.standard_normal((2, 40, 3)).astype(np.float32)
    idx = np.asarray(knn_batch(support, query, 3))
    assert idx.shape == (2, 40, 3)
    for b in range(2):
        ref_idx, ref_d = brute_force_np(support[b], query[b], 3)
        d = ((query[b][:, None] - support[b][None]) ** 2).sum(-1)
        got = np.take_along_axis(d, idx[b], 1)
        np.testing.assert_allclose(np.sort(got, 1), ref_d, rtol=1e-4, atol=1e-5)


def test_knn_k_larger_than_support(rng):
    """k > Ns keeps the static (Nq, k) contract: trailing columns repeat
    the last valid neighbor (all indices valid)."""
    support = rng.standard_normal((3, 3)).astype(np.float32)
    query = rng.standard_normal((5, 3)).astype(np.float32)
    idx = np.asarray(knn(support, query, 16))
    assert idx.shape == (5, 16)
    assert idx.max() < 3
    np.testing.assert_array_equal(idx[:, 3:], np.repeat(idx[:, 2:3], 13, 1))
