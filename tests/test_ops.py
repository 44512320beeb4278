import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.ops import (
    build_pyramid,
    gather_neighbour,
    grid_subsample_numpy,
    max_pool_neighbours,
    nearest_interpolation,
    relative_pos_encoding,
    scatter_labels_to_volume,
    scatter_probs_to_volume,
)


def test_gather_neighbour(rng):
    feats = rng.standard_normal((10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(6, 3))
    out = np.asarray(gather_neighbour(feats, idx))
    np.testing.assert_allclose(out, feats[idx])


def test_max_pool_neighbours(rng):
    feats = rng.standard_normal((10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(5, 3))
    out = np.asarray(max_pool_neighbours(feats, idx))
    np.testing.assert_allclose(out, feats[idx].max(axis=1))


def test_nearest_interpolation(rng):
    feats = rng.standard_normal((7, 5)).astype(np.float32)
    idx = rng.integers(0, 7, size=(20, 1))
    out = np.asarray(nearest_interpolation(feats, idx))
    np.testing.assert_allclose(out, feats[idx[:, 0]])


def test_relative_pos_encoding(rng):
    xyz = rng.standard_normal((8, 3)).astype(np.float32)
    idx = rng.integers(0, 8, size=(8, 4))
    out = np.asarray(relative_pos_encoding(xyz, idx))
    assert out.shape == (8, 4, 10)
    rel = xyz[:, None, :] - xyz[idx]
    np.testing.assert_allclose(
        out[..., 0], np.linalg.norm(rel, axis=-1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(out[..., 1:4], rel, rtol=1e-5)
    np.testing.assert_allclose(out[..., 7:10], xyz[idx], rtol=1e-5)


def test_build_pyramid_shapes(rng):
    n, k = 256, 8
    ratios = (4, 2)
    xyz = rng.standard_normal((n, 3)).astype(np.float32)
    pyr = build_pyramid(xyz, k, ratios)
    assert pyr.xyz[0].shape == (256, 3)
    assert pyr.xyz[1].shape == (64, 3)
    assert pyr.xyz[2].shape == (32, 3)       # bottleneck coords included
    assert pyr.neigh_idx[0].shape == (256, k)
    assert pyr.sub_idx[0].shape == (64, k)
    assert pyr.interp_idx[0].shape == (256, 1)
    assert pyr.interp_idx[1].shape == (64, 1)
    # sorted-pyramid contract: level 0 is the input cloud in cell order
    order = np.asarray(pyr.order)
    assert sorted(order.tolist()) == list(range(n))
    np.testing.assert_allclose(np.asarray(pyr.xyz[0]), xyz[order])
    # decimation SELECTS the first 64 of the original (shuffled) order —
    # the same random subset as the reference's prefix slice — stored
    # cell-sorted
    lvl1 = np.asarray(pyr.xyz[1])
    want = {tuple(p) for p in xyz[:64]}
    assert {tuple(p) for p in lvl1} == want
    # pool rows equal neighbor rows of the kept points, aligned with the
    # level-1 storage order (r3: each level re-sorts to its OWN grid)
    lvl0 = np.asarray(pyr.xyz[0])
    pos = np.array(
        [np.nonzero((lvl0 == p).all(1))[0][0] for p in lvl1]
    )
    np.testing.assert_array_equal(
        np.asarray(pyr.sub_idx[0]), np.asarray(pyr.neigh_idx[0])[pos]
    )


def test_pyramid_levels_sorted_at_own_grid(rng):
    """r3 regression: raster cell ids are NOT monotone under coarsening
    (e.g. fine (0,39,*) < (1,0,*) maps to coarse (0,19) > (0,0)), so the
    r2 build left levels >= 1 unsorted at their own grids — silently
    shrinking the Pallas search windows there. Every level must be
    non-decreasing in its own grid's raster ids."""
    import jax.numpy as jnp

    from pointunet_tpu.ops.knn_window import _grid_resolution
    from pointunet_tpu.ops.pyramid import _level_resolutions

    n = 8192
    xyz = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    ratios = (4, 4, 2)
    pyr = build_pyramid(jnp.asarray(xyz), 8, ratios)
    r0 = _grid_resolution(n, 1.8)
    rs = _level_resolutions(r0, len(ratios))
    lo = np.asarray(pyr.xyz[0]).min(0)
    span = np.maximum(np.asarray(pyr.xyz[0]).max(0) - lo, 1e-6)
    for lvl in range(len(ratios) + 1):
        p = np.asarray(pyr.xyz[lvl])
        c3 = np.clip(
            np.floor((p - lo) / span * r0).astype(np.int32), 0, r0 - 1
        ) >> lvl
        r = rs[lvl]
        ids = (c3[:, 0] * r + c3[:, 1]) * r + c3[:, 2]
        assert (np.diff(ids) >= 0).all(), (
            f"level {lvl} not sorted at its own grid"
        )


def test_grid_subsample_numpy_basic():
    pts = np.array(
        [[0.0, 0.0, 0.0], [0.1, 0.1, 0.0], [2.0, 2.0, 2.0]], dtype=np.float32
    )
    feats = np.array([[1.0], [3.0], [10.0]], dtype=np.float32)
    labels = np.array([1, 1, 2], dtype=np.int32)
    sp, sf, sl = grid_subsample_numpy(pts, feats, labels, grid_size=1.0)
    assert sp.shape == (2, 3)
    order = np.argsort(sp[:, 0])
    sp, sf, sl = sp[order], sf[order], sl[order]
    np.testing.assert_allclose(sp[0], [0.05, 0.05, 0.0], atol=1e-6)
    np.testing.assert_allclose(sf[:, 0], [2.0, 10.0])
    np.testing.assert_array_equal(sl, [1, 2])


def test_grid_subsample_fixed_matches_numpy(rng):
    import jax.numpy as jnp
    from pointunet_tpu.ops import grid_subsample_fixed

    pts = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    feats = rng.standard_normal((200, 2)).astype(np.float32)
    labels = rng.integers(0, 3, size=(200,)).astype(np.int32)
    ref_p, ref_f, ref_l = grid_subsample_numpy(pts, feats, labels, 0.25)

    sp, sf, sl, valid = grid_subsample_fixed(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(labels),
        0.25, max_cells=128, num_classes=3,
    )
    sp = np.asarray(sp)[np.asarray(valid)]
    sf = np.asarray(sf)[np.asarray(valid)]
    sl = np.asarray(sl)[np.asarray(valid)]
    assert sp.shape[0] == ref_p.shape[0]

    def sort_all(p, f, l):
        key = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
        return p[key], f[key], l[key]

    sp, sf, sl = sort_all(sp, sf, sl)
    ref_p, ref_f, ref_l = sort_all(ref_p, ref_f, ref_l)
    np.testing.assert_allclose(sp, ref_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sf, ref_f, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(sl, ref_l)


def test_scatter_probs(rng):
    probs = rng.uniform(size=(4, 2)).astype(np.float32)
    xyz = np.array([[0, 1, 2], [3, 0, 1], [2, 2, 0], [1, 3, 3]], dtype=np.int32)
    vol = np.asarray(scatter_probs_to_volume(probs, xyz, (4, 4, 4)))
    assert vol.shape == (4, 4, 4, 2)
    for i in range(4):
        x, y, z = xyz[i]
        np.testing.assert_allclose(vol[z, y, x], probs[i])


def test_scatter_label_path_matches_prob_path(rng):
    """The fused pipeline scatters argmaxed LABELS instead of prob rows
    (pipeline/fused.py pointseg_scatter): softmax is monotone, so at every
    written voxel argmax(probs) == argmax(logits), and empty voxels
    (all-zero probs) argmax to background 0. Coords are UNIQUE here —
    matching the real path, whose top_k sampling yields unique voxel
    indices; under duplicates JAX's .at[].set resolution order is
    implementation-defined and the equivalence is not asserted."""
    n, c = 200, 4
    logits = rng.normal(size=(n, c)).astype(np.float32)
    # unique coords on a 6x6x6 grid (216 cells, choose 200)
    flat = rng.choice(216, size=n, replace=False).astype(np.int32)
    xyz = np.stack([flat % 6, (flat // 6) % 6, flat // 36], axis=1).astype(np.int32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    via_probs = np.argmax(
        np.asarray(scatter_probs_to_volume(jnp.asarray(probs), xyz, (6, 6, 6))),
        axis=-1,
    ).astype(np.uint8)
    labels = jnp.argmax(jnp.asarray(logits), axis=-1).astype(jnp.uint8)
    via_labels = np.asarray(scatter_labels_to_volume(labels, xyz, (6, 6, 6)))
    np.testing.assert_array_equal(via_labels, via_probs)


def test_scatter_labels(rng):
    labels = np.array([1, 2, 3], dtype=np.int32)
    xyz = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], dtype=np.int32)
    vol = np.asarray(scatter_labels_to_volume(labels, xyz, (3, 3, 3)))
    assert vol[0, 0, 0] == 1 and vol[1, 1, 1] == 2 and vol[2, 2, 2] == 3
    assert vol.sum() == 6
