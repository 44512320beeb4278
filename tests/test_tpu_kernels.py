"""On-chip Pallas kernel correctness at reference scale (VERDICT r1 item 3).

Run ON A REAL TPU with:

    POINTUNET_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -m tpu -q

(the env var stops conftest from forcing the CPU platform). Asserts:

  (a) knn_pallas tie-aware recall >= 0.99 (and >= 0.995 inside the dense
      tumor region) vs exact brute-force KNN at 365k x K=16 on the actual
      data contract — a cloud built by the pipeline's own sampler from a
      BraTS-scale voxel volume;
  (b) windowed scatter-add within 1e-5 relative of the exact ``.at[].add``
      scatter at level-0 scale on the same contract;
  (c) the fused pyramid+forward inference path bitwise-stable across runs.

Recall is TIE-AWARE (a neighbor counts if its distance <= the exact k-th
distance): voxel grids have large tie classes (an interior voxel has 18
neighbors at distance <= sqrt(2) for k=16), so ANY correct algorithm scores
~0.90 on set-intersection recall in dense regions. All metrics reduce to
scalars on device — the tunnel transfers ~0.2 MB/s, so fetching the raw
(365k, 16) index matrices is minutes of wall time.

A committed run log lives at docs/TPU_KERNEL_VALIDATION.md.
"""
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


def _voxel_cloud(n, seed=0):
    """The ACTUAL data contract: a cloud produced by the pipeline's own
    sampler from a BraTS-scale voxel volume — a contiguous all-voxel tumor
    region (maximum possible density: 1 point/voxel) + randomly subsampled
    background. Returns (xyz, tumor_mask_f32) on device."""
    from pointunet_tpu.ops.sampling import sample_cloud_device

    rng = np.random.default_rng(seed)
    shape = (240, 240, 155)
    mods = rng.standard_normal((1,) + shape).astype(np.float32)
    brain = rng.uniform(size=shape) < 0.35
    xx, yy, zz = np.meshgrid(
        np.arange(shape[0]), np.arange(shape[1]), np.arange(shape[2]),
        indexing="ij",
    )
    d2 = (xx - 120) ** 2 + (yy - 110) ** 2 + ((zz - 70) * 1.5) ** 2
    tumor = d2 < 30 ** 2                       # ~75k voxels, all kept
    brain |= tumor
    mods *= brain[None]
    tumor_d = jnp.asarray(tumor.astype(np.uint8))
    cloud = sample_cloud_device(
        jnp.asarray(mods), tumor_d, jax.random.PRNGKey(seed), n,
    )
    o = cloud.xyz_origin
    tmask = (tumor_d[o[:, 0], o[:, 1], o[:, 2]] > 0).astype(jnp.float32)
    return cloud.xyz, tmask


@jax.jit
def _tie_aware_recall(got, want, pts, tumor_mask):
    """Fraction of returned neighbors at distance <= the exact k-th
    distance (+eps); overall / tumor-region / background means."""
    dg = jnp.sum((pts[:, None, :] - pts[got]) ** 2, -1)
    dw = jnp.sum((pts[:, None, :] - pts[want]) ** 2, -1)
    kth = dw.max(-1, keepdims=True)
    hit = (dg <= kth + 1e-9).mean(-1)
    m = tumor_mask
    overall = hit.mean()
    tum = jnp.sum(hit * m) / jnp.maximum(jnp.sum(m), 1)
    bg = jnp.sum(hit * (1 - m)) / jnp.maximum(jnp.sum(1 - m), 1)
    return overall, tum, bg


def test_knn_pallas_recall_at_reference_scale():
    from pointunet_tpu.ops.knn import knn
    from pointunet_tpu.ops.knn_pallas import knn_pallas

    xyz, tmask = _voxel_cloud(N_REF)
    got = jax.jit(lambda p: knn_pallas(p, p, K_REF))(xyz)
    want = jax.jit(lambda p: knn(p, p, K_REF))(xyz)
    overall, tum, bg = map(float, _tie_aware_recall(got, want, xyz, tmask))
    print(f"\nknn_pallas recall overall={overall:.4f} "
          f"tumor={tum:.4f} bg={bg:.4f}")
    assert overall >= 0.99, f"overall recall {overall:.4f}"
    assert tum >= 0.995, f"tumor recall {tum:.4f}"


def test_windowed_scatter_add_grad_level0_scale():
    from pointunet_tpu.ops.knn_pallas import knn_pallas
    from pointunet_tpu.ops.scatter_window import windowed_scatter_add

    n, k, c = N_REF, K_REF, 8            # level-0 gather: 5.8M rows
    xyz, _ = _voxel_cloud(n, seed=1)
    idx = jax.jit(lambda p: knn_pallas(p, p, k))(xyz)
    ct = jax.random.normal(jax.random.PRNGKey(0), (n, k, c), jnp.float32)

    @jax.jit
    def max_rel_err(ct, idx, xyz):
        kernel_grad = windowed_scatter_add(ct, idx, xyz, xyz, n)
        exact_grad = (
            jnp.zeros((n, c), jnp.float32)
            .at[idx.reshape(-1)]
            .add(ct.reshape(-1, c))
        )
        denom = jnp.maximum(jnp.abs(exact_grad).max(), 1e-6)
        return jnp.abs(kernel_grad - exact_grad).max() / denom

    err = float(max_rel_err(ct, idx, xyz))
    print(f"\nwindowed scatter-add max rel err {err:.2e}")
    assert err < 1e-5, f"windowed scatter-add max rel err {err:.2e}"


def test_sorted_scatter_add_grad_level0_scale():
    """r3 exact-extents sorted scatter (ops/scatter_sorted.py) vs the
    exact ``.at[].add`` gradient, at level-0 AND pool scale on the real
    sorted-pyramid contract (same cloud, same search indices)."""
    from pointunet_tpu.core.config import brats_pointseg_config
    from pointunet_tpu.ops.knn_window import _grid_resolution
    from pointunet_tpu.ops.pyramid import build_pyramid
    from pointunet_tpu.ops.scatter_sorted import scatter_add_sorted

    cfg = brats_pointseg_config()
    xyz, _ = _voxel_cloud(N_REF, seed=2)
    pyr = jax.jit(
        lambda p: build_pyramid(p, cfg.k_n, cfg.sub_sampling_ratio)
    )(xyz)
    r0 = _grid_resolution(N_REF, 1.8)
    lo = jnp.min(pyr.xyz[0], axis=0)
    span = jnp.maximum(jnp.max(pyr.xyz[0], axis=0) - lo, 1e-6)

    def case(level, sup_xyz, q_xyz, idx, c, seed, q_sorted=True):
        ns, (nq, k) = sup_xyz.shape[0], idx.shape
        ct = jax.random.normal(
            jax.random.PRNGKey(seed), (nq, k, c), jnp.float32
        )

        @jax.jit
        def max_rel_err(ct, idx, sup_xyz, q_xyz, lo, span):
            got = scatter_add_sorted(
                ct, idx, sup_xyz, q_xyz, lo, span, r0, level, ns,
                query_sorted=q_sorted,
            )
            want = (
                jnp.zeros((ns, c), jnp.float32)
                .at[idx.reshape(-1)]
                .add(ct.reshape(-1, c))
            )
            denom = jnp.maximum(jnp.abs(want).max(), 1e-6)
            return jnp.abs(got - want).max() / denom

        return float(max_rel_err(ct, idx, sup_xyz, q_xyz, lo, span))

    # level-0 self gather (5.8M rows), level-1 self, level-0 pool
    e0 = case(0, pyr.xyz[0], pyr.xyz[0], pyr.neigh_idx[0], 8, 0)
    e1 = case(1, pyr.xyz[1], pyr.xyz[1], pyr.neigh_idx[1], 16, 1)
    ep = case(0, pyr.xyz[0], pyr.xyz[1], pyr.sub_idx[0], 32, 2,
              q_sorted=False)
    print(f"\nsorted scatter-add max rel err: "
          f"L0={e0:.2e} L1={e1:.2e} pool={ep:.2e}")
    assert e0 < 1e-5, f"L0 sorted scatter max rel err {e0:.2e}"
    assert e1 < 1e-5, f"L1 sorted scatter max rel err {e1:.2e}"
    assert ep < 1e-5, f"pool sorted scatter max rel err {ep:.2e}"


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
    a, b = fwd(xyz, feats), fwd(xyz, feats)
    same = bool(jnp.all(a == b))         # scalar fetch, not the arrays
    assert same, "inference path is not run-to-run stable"


def test_clustered_cloud_diagnostic():
    """OUT-OF-CONTRACT diagnostic: continuous Gaussian point masses have
    unbounded local density, which can overflow the fixed cell windows
    (sized for the voxel-density bound). Records recall without asserting
    a bar — the asserted tests pin the voxel contract."""
    from pointunet_tpu.ops.knn import knn
    from pointunet_tpu.ops.knn_pallas import knn_pallas

    n, k = 100_000, 8
    rng = np.random.default_rng(3)
    n_fg = n // 5
    centers = rng.uniform(0.2, 0.8, (3, 3))
    fg = (
        centers[rng.integers(0, 3, n_fg)]
        + rng.standard_normal((n_fg, 3)) * 0.03
    )
    bg = rng.uniform(0, 1, (n - n_fg, 3))
    pts = np.concatenate([fg, bg]).astype(np.float32)
    rng.shuffle(pts)
    pts = jnp.asarray(pts)

    got = jax.jit(lambda p: knn_pallas(p, p, k))(pts)
    want = jax.jit(lambda p: knn(p, p, k))(pts)
    overall, _, _ = map(
        float,
        _tie_aware_recall(got, want, pts, jnp.zeros((n,), jnp.float32)),
    )
    print(f"\nout-of-contract gaussian-cluster recall: {overall:.4f}")
    assert int(jnp.min(got)) >= 0 and int(jnp.max(got)) < n
