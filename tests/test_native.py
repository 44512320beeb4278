"""Native (csrc/libpointops.so) host ops vs their numpy references.

Skipped when the library hasn't been built (`make -C csrc`). The native
ops fill the role of the reference's nanoflann/Cython KNN (knn.pyx:71) and
C++ grid subsampling (wrapper.cpp:27) for host-side data prep.
"""
import numpy as np
import pytest

from pointunet_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libpointops.so not built"
)


def _brute_knn(support, query, k):
    d = ((query[:, None] - support[None]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_native_knn_exact(rng):
    support = rng.uniform(0, 1, (4000, 3)).astype(np.float32)
    query = rng.uniform(0, 1, (257, 3)).astype(np.float32)
    idx = native.knn(support, query, 8)
    ref = _brute_knn(support, query, 8)
    # KD-tree and brute force may order equidistant ties differently;
    # compare as sets
    agree = np.mean(
        [len(set(idx[i]) & set(ref[i])) / 8 for i in range(len(query))]
    )
    assert agree == 1.0


def test_native_knn_batch(rng):
    support = rng.uniform(0, 1, (3, 1000, 3)).astype(np.float32)
    query = rng.uniform(0, 1, (3, 64, 3)).astype(np.float32)
    idx = native.knn_batch(support, query, 4)
    assert idx.shape == (3, 64, 4)
    for b in range(3):
        ref = _brute_knn(support[b], query[b], 4)
        agree = np.mean(
            [len(set(idx[b, i]) & set(ref[i])) / 4 for i in range(64)]
        )
        assert agree == 1.0


def test_native_grid_subsample_matches_numpy(rng):
    from pointunet_tpu.ops.subsample import grid_subsample_numpy

    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    feats = rng.standard_normal((5000, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 5000).astype(np.int32)

    n_p, n_f, n_l = native.grid_subsample(pts, feats, labels, 0.1)
    r_p, r_f, r_l = grid_subsample_numpy(pts, feats, labels, 0.1)

    assert n_p.shape == r_p.shape
    # cell iteration order may differ; compare as sorted rows
    order_n = np.lexsort(n_p.T)
    order_r = np.lexsort(r_p.T)
    np.testing.assert_allclose(
        n_p[order_n], r_p[order_r], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        n_f[order_n], r_f[order_r], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(n_l[order_n], r_l[order_r])


def test_native_points_only(rng):
    pts = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    sub = native.grid_subsample(pts, None, None, 0.2)
    assert sub.ndim == 2 and sub.shape[1] == 3
    assert sub.shape[0] < 1000


def test_native_knn_distance_pick(rng):
    """Coverage-greedy picking (parity surface: reference knn.pyx:111):
    picked queries are support points, neighbor rows contain the pick,
    picks are distinct and deterministic per seed."""
    pts = rng.uniform(0, 1, (2, 400, 3)).astype(np.float32)
    nq, k = 24, 6
    q, idx = native.knn_batch_distance_pick(pts, nq, k, seed=7)
    assert q.shape == (2, nq, 3) and idx.shape == (2, nq, k)
    assert idx.min() >= 0 and idx.max() < 400
    for b in range(2):
        # every picked query is an actual support point whose own index
        # appears in its neighbor row
        for j in range(nq):
            d = ((pts[b] - q[b, j]) ** 2).sum(-1)
            self_id = int(np.argmin(d))
            assert d[self_id] == 0.0
            assert self_id in idx[b, j]
        # coverage-greedy: all picks distinct while nq << n
        assert len({tuple(v) for v in q[b]}) == nq
    q2, idx2 = native.knn_batch_distance_pick(pts, nq, k, seed=7)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(idx, idx2)
    q3, _ = native.knn_batch_distance_pick(pts, nq, k, seed=8)
    assert not np.array_equal(q, q3)
