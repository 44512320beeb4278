"""On-device context-aware sampling.

Device-resident version of data/pointcloud.py's sampler (reference
runBraTS.py:105-110): keep ALL salient voxels, fill the fixed budget with
random background voxels, never pick empty voxels unless the volume is
smaller than the budget. One top-k over randomized priority scores:

  score(v) = U(0,1) + 2 * [salient & nonzero] + 1 * [nonzero]

so the descending top-``num_points`` selects salient voxels first (randomly
subsampled if they exceed the budget — the documented clamp), then random
background. The selected indices are then explicitly permuted (reference
DP.shuffle_idx, runBraTS.py:114): top_k returns score-sorted order
(salient first), and the pyramid's prefix-slice decimation would otherwise
keep only salient points at coarse levels — the coarse encoder would never
see background context.
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


def _select_top_scores(
    score: jax.Array,       # (nvox,) the banded priority scores
    s_cnt: jax.Array,       # () number of salient voxels (score in (3,4))
    bg_cnt: jax.Array,      # () number of nonzero background ((1,2))
    num_points: int,
) -> jax.Array:
    """Exact descending top-``num_points`` indices of ``score`` — the
    same ids in the same order as ``lax.top_k(score, num_points)[1]`` —
    via a band-threshold prefilter.

    XLA:TPU lowers large-k TopK through a bitonic sort: at the BraTS
    contract (365k of 8.9M) the cost model charges ~26 GB of HBM traffic
    and the stage measures ~55 ms. But the sampler's scores are BANDED by
    construction (uniform noise + {0,1,2} category offsets: salient in
    (3,4), nonzero background in (1,2), empty in (0,1)), so the k-th
    order statistic is known to sit in a specific band at a predictable
    quantile. A closed-form threshold keeps ~num_points + slack
    candidates (count is Binomial with sigma ~ sqrt(k) ~ 600 — the
    2*slack cap is ~100 sigma from both tails), a cumsum-compaction
    packs them into a (cap,) buffer, and one SMALL exact top_k finishes.
    ~8 linear passes over the volume instead of a multi-million-row
    bitonic sort. Scores are f32-distinct with probability 1 (uniform
    noise), so the selected set and the descending order are bit-stable
    across both formulations.
    """
    nvox = score.shape[0]
    slack = 32_768 if num_points >= 65_536 else max(num_points // 4, 256)
    cap = num_points + 2 * slack
    if cap * 4 >= nvox:
        # small volumes (tests, tiny presets): the sort is already cheap
        _, sel = jax.lax.top_k(score, num_points)
        return sel

    npf = float(num_points)
    sl = float(slack)
    s_f = s_cnt.astype(jnp.float32)
    bg_f = bg_cnt.astype(jnp.float32)
    e_f = float(nvox) - s_f - bg_f
    # per-band keep fraction so the expected candidate count is
    # num_points + slack; clip keeps the whole band when it is smaller
    fr_sal = jnp.clip((npf + sl) / jnp.maximum(s_f, 1.0), 0.0, 1.0)
    fr_bg = jnp.clip((npf - s_f + sl) / jnp.maximum(bg_f, 1.0), 0.0, 1.0)
    fr_emp = jnp.clip(
        (npf - s_f - bg_f + sl) / jnp.maximum(e_f, 1.0), 0.0, 1.0
    )
    t = jnp.where(
        s_f >= npf,
        3.0 + (1.0 - fr_sal),
        jnp.where(s_f + bg_f >= npf, 1.0 + (1.0 - fr_bg), 1.0 - fr_emp),
    )

    cand = score >= t
    pos = jnp.cumsum(cand.astype(jnp.int32)) - 1
    write = jnp.where(cand & (pos < cap), pos, cap)   # overflow -> slot cap
    buf_score = (
        jnp.full((cap + 1,), -jnp.inf, jnp.float32).at[write].set(score)
    )
    buf_idx = (
        jnp.zeros((cap + 1,), jnp.int32)
        .at[write]
        .set(jnp.arange(nvox, dtype=jnp.int32))
    )
    _, top_i = jax.lax.top_k(buf_score[:cap], num_points)
    return buf_idx[:cap][top_i]


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
    salient = (mask.reshape(nvox) > 0) & nonzero

    score_key, shuffle_key = jax.random.split(key)
    score = (
        jax.random.uniform(score_key, (nvox,), jnp.float32)
        + 2.0 * salient.astype(jnp.float32)
        + nonzero.astype(jnp.float32)
    )
    n_sal = jnp.sum(salient.astype(jnp.int32))
    n_nz = jnp.sum(nonzero.astype(jnp.int32))
    sel = _select_top_scores(
        score, n_sal, n_nz - n_sal, num_points
    )                                                  # (N,) flat ids
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
