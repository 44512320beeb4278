"""On-device context-aware sampling.

Device-resident version of data/pointcloud.py's sampler (reference
runBraTS.py:105-110): keep ALL salient voxels, fill the fixed budget with
random background voxels, never pick empty voxels unless the volume is
smaller than the budget. One top-k over randomized priority scores:

  score(v) = U(0,1) + 2 * min(mask(v), 2) * [nonzero] + 1 * [nonzero]

For the reference's binary mask this is exactly

  score(v) = U(0,1) + 2 * [salient & nonzero] + 1 * [nonzero]

so the descending top-``num_points`` selects salient voxels first (randomly
subsampled if they exceed the budget — the documented clamp), then random
background. The mask may also be GRADED with value 2 marking core-salient
voxels and 1 a lower-priority band (pipeline/fused.py mask_band: the
boundary band around a coarse fast-mode mask): cores land in [5, 6), band
in [3, 4), background in [1, 2), empty in [0, 1) — every core voxel is
admitted before any band voxel, and the band consumes only the budget
slack instead of competing with the core (the measured failure of
isotropic dilation, docs/ATTENTION_STAGE.md). The selected indices are
then explicitly permuted (reference DP.shuffle_idx, runBraTS.py:114):
top_k returns score-sorted order (salient first), and the pyramid's
prefix-slice decimation would otherwise keep only salient points at
coarse levels — the coarse encoder would never see background context.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeviceCloud(NamedTuple):
    xyz: jax.Array          # (N, 3) f32, coords / dims
    features: jax.Array     # (N, C) f32
    labels: jax.Array       # (N,) int32 (zeros if no label volume given)
    xyz_origin: jax.Array   # (N, 3) int32 voxel coords


# r4 NEGATIVE RESULT, kept as a record: a band-threshold prefilter for
# the top-k below (closed-form per-band quantile threshold -> cumsum
# compaction -> small exact top_k; bit-identical selection, verified on
# CPU) measured ~1.5-2.5x SLOWER on v5e than the large-k lax.top_k it
# replaced: the compaction needs two nvox-row scatters, and XLA:TPU
# scatter runs at ~66 ns/row (the same lesson ops/scatter_sorted.py
# exists for) — ~0.6 s of scatter to save ~26 GB of bitonic-sort
# traffic. Gather-based compaction (searchsorted over the cumsum) prices
# at ~24 gather rounds x cap rows — no better than the sort. The sort
# stays.


@functools.partial(jax.jit, static_argnames=("num_points",))
def sample_cloud_device(
    modalities: jax.Array,          # (C, X, Y, Z)
    mask: jax.Array,                # (X, Y, Z) salient mask (bool/int)
    key: jax.Array,
    num_points: int,
    labels: jax.Array | None = None,  # (X, Y, Z) int labels (optional)
) -> DeviceCloud:
    c, x, y, z = modalities.shape
    nvox = x * y * z
    flat_mods = modalities.reshape(c, nvox).T          # (nvox, C)
    nonzero = jnp.any(flat_mods != 0, axis=1)
    # graded tier in {0, 1, 2}: a bool/binary mask gives tier 1 -> +2,
    # bit-identical to the old 2 * [salient] scoring; a graded mask's
    # core voxels (value 2) outrank the band (value 1) by a full tier
    tier = jnp.clip(
        mask.reshape(nvox).astype(jnp.float32), 0.0, 2.0
    ) * nonzero.astype(jnp.float32)

    score_key, shuffle_key = jax.random.split(key)
    score = (
        jax.random.uniform(score_key, (nvox,), jnp.float32)
        + 2.0 * tier
        + nonzero.astype(jnp.float32)
    )
    _, sel = jax.lax.top_k(score, num_points)          # (N,) flat ids
    # top_k is score-sorted (salient first); shuffle so the prefix-slice
    # decimation downstream is an unbiased random subsample
    sel = jax.random.permutation(shuffle_key, sel)

    xi = sel // (y * z)
    rem = sel % (y * z)
    yi = rem // z
    zi = rem % z
    origin = jnp.stack([xi, yi, zi], axis=-1).astype(jnp.int32)
    dims = jnp.asarray([x, y, z], jnp.float32)
    xyz = origin.astype(jnp.float32) / dims

    feats = flat_mods[sel]
    if labels is None:
        labs = jnp.zeros((num_points,), jnp.int32)
    else:
        labs = labels.reshape(nvox)[sel].astype(jnp.int32)
    return DeviceCloud(xyz, feats, labs, origin)
