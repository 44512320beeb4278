"""Grid subsampling: voxel-grid downsample of a point cloud.

Replaces the reference's C++ hash-map implementation (reference
PointSegment/utils/cpp_wrappers/cpp_subsampling/grid_subsampling.cpp): each
occupied grid cell of side ``grid_size`` contributes one output point at the
barycenter of its members, with mean features and majority-vote labels.

Two implementations:
  * ``grid_subsample`` — host-side numpy (dynamic output size), used by the
    offline data-prep tools exactly where the reference used C++. A native
    C++ path (pointunet_tpu.native) is used automatically when built.
  * ``grid_subsample_fixed`` — jit-able device version with a static output
    budget (sorted-segment reductions), for fused on-device pipelines.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _cell_ids(points: np.ndarray, grid_size: float):
    mins = points.min(axis=0)
    cells = np.floor((points - mins) / grid_size).astype(np.int64)
    dims = cells.max(axis=0) + 1
    ids = (cells[:, 0] * dims[1] + cells[:, 1]) * dims[2] + cells[:, 2]
    return ids


def grid_subsample(
    points: np.ndarray,
    features: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    grid_size: float = 0.1,
):
    """Barycenter grid subsampling (host, numpy).

    Returns (sub_points[, sub_features][, sub_labels]) mirroring the return
    arity of the reference wrapper (helper_tool.py:124-143).
    """
    try:
        from .. import native
        if native.available():
            return native.grid_subsample(points, features, labels, grid_size)
    except Exception:
        pass
    return grid_subsample_numpy(points, features, labels, grid_size)


def grid_subsample_numpy(points, features=None, labels=None, grid_size=0.1):
    points = np.asarray(points, dtype=np.float32)
    ids = _cell_ids(points, grid_size)
    uniq, inv, counts = np.unique(ids, return_inverse=True, return_counts=True)
    n_cells = uniq.shape[0]

    def seg_mean(values):
        values = np.asarray(values, dtype=np.float64)
        out = np.zeros((n_cells,) + values.shape[1:], dtype=np.float64)
        np.add.at(out, inv, values)
        return (out / counts.reshape(-1, *([1] * (values.ndim - 1)))).astype(
            np.float32
        )

    sub_points = seg_mean(points)
    out = [sub_points]
    if features is not None:
        out.append(seg_mean(features))
    if labels is not None:
        labels = np.asarray(labels).astype(np.int64).reshape(-1)
        n_classes = int(labels.max()) + 1 if labels.size else 1
        votes = np.zeros((n_cells, n_classes), dtype=np.int64)
        np.add.at(votes, (inv, labels), 1)
        out.append(votes.argmax(axis=1).astype(np.int32))
    return out[0] if len(out) == 1 else tuple(out)


def grid_subsample_fixed(
    points: jax.Array,
    features: jax.Array,
    labels: jax.Array,
    grid_size: float,
    max_cells: int,
    num_classes: int,
    valid_mask: jax.Array | None = None,
):
    """Device grid subsampling with a fixed output budget.

    Returns (sub_points (M,3), sub_features (M,d), sub_labels (M,),
    cell_valid (M,) bool). Cells beyond ``max_cells`` occupied cells are
    dropped (densest-first is NOT guaranteed; callers size max_cells
    generously). Invalid output slots have cell_valid False.
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)

    mins = jnp.min(jnp.where(valid_mask[:, None], points, jnp.inf), axis=0)
    cells = jnp.floor((points - mins[None, :]) / grid_size).astype(jnp.int32)
    cells = jnp.maximum(cells, 0)
    # Data-dependent (traced) grid dims keep ids inside int32.
    dims = jnp.max(jnp.where(valid_mask[:, None], cells, 0), axis=0) + 1
    ids = (cells[:, 0] * dims[1] + cells[:, 1]) * dims[2] + cells[:, 2]
    ids = jnp.where(valid_mask, ids, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(ids)
    ids_s = ids[order]
    pts_s = points[order]
    feat_s = features[order]
    lab_s = labels[order]
    valid_s = valid_mask[order]

    new_cell = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
    )
    seg = jnp.cumsum(new_cell.astype(jnp.int32)) - 1      # (N,) segment index
    seg = jnp.where(valid_s, seg, max_cells)               # overflow bucket

    ones = valid_s.astype(jnp.float32)
    counts = jnp.zeros((max_cells + 1,), jnp.float32).at[seg].add(ones)
    safe = jnp.maximum(counts, 1.0)

    def seg_mean(v):
        acc = (
            jnp.zeros((max_cells + 1,) + v.shape[1:], jnp.float32)
            .at[seg]
            .add(v * ones.reshape(-1, *([1] * (v.ndim - 1))))
        )
        return acc / safe.reshape(-1, *([1] * (v.ndim - 1)))

    sub_points = seg_mean(pts_s)[:max_cells]
    sub_features = seg_mean(feat_s)[:max_cells]
    onehot = jax.nn.one_hot(lab_s, num_classes, dtype=jnp.float32)
    votes = (
        jnp.zeros((max_cells + 1, num_classes), jnp.float32)
        .at[seg]
        .add(onehot * ones[:, None])
    )
    sub_labels = jnp.argmax(votes[:max_cells], axis=-1).astype(jnp.int32)
    cell_valid = counts[:max_cells] > 0
    return sub_points, sub_features, sub_labels, cell_valid
