import numpy as np
import jax.numpy as jnp

from pointunet_tpu.ops.knn import knn
from pointunet_tpu.ops.knn_window import knn_cell_window
from util_synthetic import distance_recall as _recall


def test_window_knn_volumetric_recall(rng):
    coords = np.unique(rng.integers(0, 48, (30000, 3)), axis=0)
    pts = (coords[rng.permutation(len(coords))[:8000]] / 48.0).astype(
        np.float32
    )
    idx = np.asarray(knn_cell_window(jnp.asarray(pts), jnp.asarray(pts), 8))
    assert idx.shape == (8000, 8)
    assert idx.min() >= 0 and idx.max() < 8000
    rec = _recall(pts, pts, 8, idx)
    assert rec > 0.98, rec


def test_window_knn_self_neighbor(rng):
    pts = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
    idx = np.asarray(knn_cell_window(jnp.asarray(pts), jnp.asarray(pts), 4))
    np.testing.assert_array_equal(idx[:, 0], np.arange(3000))


def test_window_knn_no_duplicate_neighbors(rng):
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    idx = np.asarray(knn_cell_window(jnp.asarray(pts), jnp.asarray(pts), 8))
    # duplicates only allowed via the <k-candidates backfill, which
    # repeats the FIRST column; interior rows should be unique
    n_unique = np.array([len(np.unique(row)) for row in idx])
    assert (n_unique >= 7).mean() > 0.99


def test_window_knn_up_search(rng):
    """Decimated support (1-NN up-projection case)."""
    query = rng.uniform(0, 1, (6000, 3)).astype(np.float32)
    support = query[:1500]
    approx = np.asarray(
        knn_cell_window(jnp.asarray(support), jnp.asarray(query), 1)
    )
    exact = np.asarray(knn(jnp.asarray(support), jnp.asarray(query), 1))
    agree = (approx[:, 0] == exact[:, 0]).mean()
    assert agree > 0.97, agree


def test_window_knn_uniform_recall(rng):
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    q = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    idx = np.asarray(knn_cell_window(jnp.asarray(pts), jnp.asarray(q), 16))
    rec = _recall(pts, q, 16, idx)
    assert rec > 0.95, rec


def test_window_knn_tiny(rng):
    support = rng.uniform(0, 1, (7, 3)).astype(np.float32)
    query = rng.uniform(0, 1, (33, 3)).astype(np.float32)
    idx = np.asarray(knn_cell_window(jnp.asarray(support), jnp.asarray(query), 16))
    assert idx.shape == (33, 16)  # static k-column contract (pad_k_columns)
    assert idx.min() >= 0 and idx.max() < 7
