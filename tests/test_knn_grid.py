import numpy as np
import jax.numpy as jnp

from pointunet_tpu.ops.knn import knn
from pointunet_tpu.ops.knn_grid import knn_grid
from util_synthetic import distance_recall as _recall


def test_grid_knn_high_recall_volumetric(rng):
    """Clouds sampled from a voxel grid (the Point-Unet regime)."""
    coords = np.unique(rng.integers(0, 48, (30000, 3)), axis=0)
    pts = (coords[rng.permutation(len(coords))[:8000]] / 48.0).astype(
        np.float32
    )
    idx = np.asarray(knn_grid(jnp.asarray(pts), jnp.asarray(pts), 8))
    assert idx.shape == (8000, 8)
    assert idx.min() >= 0 and idx.max() < 8000
    rec = _recall(pts, pts, 8, idx)
    assert rec > 0.98, rec


def test_grid_knn_self_neighbor(rng):
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    idx = np.asarray(knn_grid(jnp.asarray(pts), jnp.asarray(pts), 4))
    np.testing.assert_array_equal(idx[:, 0], np.arange(2000))


def test_grid_knn_uniform_recall(rng):
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    q = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    idx = np.asarray(knn_grid(jnp.asarray(pts), jnp.asarray(q), 16))
    rec = _recall(pts, q, 16, idx)
    assert rec > 0.95, rec


def test_grid_knn_one_nn_matches_exact_mostly(rng):
    """1-NN (the decoder up-projection case) should be near-exact."""
    support = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
    query = rng.uniform(0, 1, (6000, 3)).astype(np.float32)
    approx = np.asarray(knn_grid(jnp.asarray(support), jnp.asarray(query), 1))
    exact = np.asarray(knn(jnp.asarray(support), jnp.asarray(query), 1))
    agree = (approx[:, 0] == exact[:, 0]).mean()
    assert agree > 0.97, agree


def test_grid_knn_tiny_support(rng):
    support = rng.uniform(0, 1, (5, 3)).astype(np.float32)
    query = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    idx = np.asarray(knn_grid(jnp.asarray(support), jnp.asarray(query), 16))
    assert idx.shape == (50, 16)  # static k-column contract (pad_k_columns)
    assert idx.min() >= 0 and idx.max() < 5
