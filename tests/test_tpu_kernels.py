"""On-chip Pallas kernel correctness at reference scale (VERDICT r1 item 3).

Run ON A REAL TPU with:

    POINTUNET_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -m tpu -q

(the env var stops conftest from forcing the CPU platform). Asserts:

  (a) knn_pallas recall >= 0.98 vs exact brute-force KNN at 365k x K=16
      (the claim in ops/knn_window.py:29-32);
  (b) windowed_gather's kernel backward (windowed scatter-add,
      ops/scatter_window.py) within 1e-5 relative of the exact
      ``.at[].add`` scatter at level-0 scale;
  (c) the fused pyramid+forward inference path bitwise-stable across runs.

A committed run log lives at docs/TPU_KERNEL_VALIDATION.md.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="requires a real TPU (POINTUNET_TPU_TESTS=1)",
    ),
]

N_REF = 365_000          # reference BraTS point budget (helper_tool.py:24)
K_REF = 16


def _clustered_cloud(n, seed=0):
    """Voxel-like cloud: dense tumor clusters + uniform background —
    the density profile the window sizing must survive."""
    rng = np.random.default_rng(seed)
    n_fg = n // 5
    centers = rng.uniform(0.2, 0.8, (3, 3))
    fg = (
        centers[rng.integers(0, 3, n_fg)]
        + rng.standard_normal((n_fg, 3)) * 0.03
    )
    bg = rng.uniform(0, 1, (n - n_fg, 3))
    pts = np.concatenate([fg, bg]).astype(np.float32)
    rng.shuffle(pts)
    return pts


def test_knn_pallas_recall_at_reference_scale():
    from pointunet_tpu.ops.knn import knn
    from pointunet_tpu.ops.knn_pallas import knn_pallas

    pts = jnp.asarray(_clustered_cloud(N_REF))
    got = np.asarray(jax.jit(
        lambda p: knn_pallas(p, p, K_REF)
    )(pts))
    want = np.asarray(jax.jit(
        lambda p: knn(p, p, K_REF)
    )(pts))
    # set recall per row (ties at the k-th distance make exact-index
    # comparison ill-posed)
    hits = 0
    for i in range(0, N_REF, 97):          # ~3.8k sampled rows
        hits += len(set(got[i]) & set(want[i])) / K_REF
    recall = hits / len(range(0, N_REF, 97))
    assert recall >= 0.98, f"knn_pallas recall {recall:.4f} < 0.98"


def test_windowed_scatter_add_grad_level0_scale():
    from pointunet_tpu.ops.knn_pallas import knn_pallas
    from pointunet_tpu.ops.scatter_window import windowed_scatter_add

    n, k, c = N_REF, K_REF, 8            # level-0 gather: 5.8M rows
    xyz = jnp.asarray(_clustered_cloud(n, seed=1))
    idx = jax.jit(lambda p: knn_pallas(p, p, k))(xyz)
    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (n, k, c), jnp.float32)

    kernel_grad = jax.jit(
        lambda ct, idx, xyz: windowed_scatter_add(ct, idx, xyz, xyz, n)
    )(ct, idx, xyz)
    exact_grad = jax.jit(
        lambda ct, idx: jnp.zeros((n, c), jnp.float32)
        .at[idx.reshape(-1)]
        .add(ct.reshape(-1, c))
    )(ct, idx)
    kernel_grad = np.asarray(kernel_grad)
    exact_grad = np.asarray(exact_grad)
    denom = max(1e-6, float(np.abs(exact_grad).max()))
    max_rel = float(np.abs(kernel_grad - exact_grad).max()) / denom
    assert max_rel < 1e-5, f"windowed scatter-add max rel err {max_rel:.2e}"


def test_inference_path_bitwise_stable():
    """Same inputs -> bitwise-identical logits across two dispatches of the
    fused pyramid+forward path (determinism of the kernels)."""
    from pointunet_tpu.core.config import brats_pointseg_config
    from pointunet_tpu.models.randlanet import init_randlanet
    from pointunet_tpu.ops.pyramid import build_pyramid_batch

    n = 65_536
    cfg = brats_pointseg_config(num_points=n)
    model, variables = init_randlanet(jax.random.PRNGKey(0), cfg, num_points=n)

    @jax.jit
    def fwd(xyz, feats):
        pyr = build_pyramid_batch(xyz, cfg.k_n, cfg.sub_sampling_ratio)
        return model.apply(variables, feats, pyr, train=False)

    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (1, n, 3), jnp.float32)
    feats = jnp.concatenate(
        [xyz, jax.random.normal(key, (1, n, cfg.num_features), jnp.float32)],
        axis=-1,
    )
    a = np.asarray(fwd(xyz, feats))
    b = np.asarray(fwd(xyz, feats))
    assert np.array_equal(a, b), "inference path is not run-to-run stable"
