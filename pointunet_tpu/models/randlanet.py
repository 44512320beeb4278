"""RandLA-Net point segmentation network, TPU-first.

Re-design of the reference TF1 graph builder (reference
PointSegment/RandLANet.py:110-152, 314-401) as a flax.linen module:

* every "1x1 conv2d" over points is a Dense layer (identical math, better
  XLA fusion; the reference's (B, N, 1, C) conv trick exists only because
  TF1 lacked batched dense);
* neighbor gathers are static-shape jnp.take ops (ops/gather.py);
* batch norm follows the reference's hyperparams (momentum 0.99, eps 1e-6,
  tf.layers.batch_normalization at helper_tf_util.py:167) and can sync
  statistics across a device mesh via ``axis_name`` — replacing the dormant
  NCCL path in the reference (custom_ops.py:345-362);
* weight init mirrors the reference: the use_xavier=False path IGNORES its
  stddev argument and draws truncated_normal(stddev=sqrt(2/fan_out)) — He
  init over the output dim (helper_tf_util.py:43-51); tf.layers.dense
  layers (fc0, attention scores) are glorot-uniform. (Round 1 misread this
  as stddev=1e-3, which near-zeroed every kernel and throttled learning
  ~10x — see docs/DESIGN.md.)

Forward signature is batched: features (B, N, C_in) + a Pyramid of per-level
xyz/neighbor/pool/upsample indices (ops/pyramid.py). Logits are (B, N,
num_classes).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import PointSegConfig
from ..ops.gather import encode_neighbor_xyz
from ..ops.knn_window import _grid_resolution
from ..ops.pyramid import Pyramid
from ..ops.scatter_sorted import sorted_gather

# reference helper_tf_util.py:49: truncated_normal(stddev=sqrt(2/fan_out))
_CONV_INIT = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)
_DENSE_INIT = nn.initializers.glorot_uniform()


def _pshard(x, mesh):
    """Constrain a (B, N, ...) activation to shard on the point axis.

    GSPMD propagation through the forward/backward gathers is what makes
    the TRAIN-step activations shard (SURVEY §5.7's end state): the
    pyramid arrives point-sharded from ops/pyramid_sharded.py, but
    without these anchors XLA is free to all-gather the (B, N, K, C)
    LFA intermediates — the dominant train-core memory term at the 365k
    contract (docs/SHARDED_PYRAMID_365K.json). No-op when ``mesh`` is
    None (the single-device and data-parallel paths)."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, POINT_AXIS

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, POINT_AXIS))
    )


class SharedMLP(nn.Module):
    """Dense + optional BatchNorm + leaky_relu(0.2).

    Equivalent of helper_tf_util.conv2d with a 1x1 kernel (reference
    helper_tf_util.py:115-170 — note the reference applies leaky_relu
    whenever an activation is requested, regardless of which one).
    """

    features: int
    bn: bool = True
    activation: bool = True
    momentum: float = 0.99
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, kernel_init=_CONV_INIT, dtype=self.dtype)(x)
        if self.bn:
            # normalization statistics stay f32 (force_float32_reductions)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=1e-6,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
        if self.activation:
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class AttPooling(nn.Module):
    """Attentive pooling over K neighbors (reference RandLANet.py:388-401).

    scores = softmax(W f) over the K axis; output = MLP(sum_k scores * f).
    """

    d_out: int
    momentum: float = 0.99
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feature_set, train: bool = False):
        # feature_set: (B, N, K, d)
        d = feature_set.shape[-1]
        att = nn.Dense(
            d, use_bias=False, kernel_init=_DENSE_INIT, dtype=self.dtype
        )(feature_set)
        scores = jax.nn.softmax(att, axis=-2)
        agg = jnp.sum(scores * feature_set, axis=-2)        # (B, N, d)
        return SharedMLP(self.d_out, momentum=self.momentum, dtype=self.dtype, axis_name=self.axis_name)(agg, train)


class LocalFeatureAggregation(nn.Module):
    """Building block: two rounds of (spatial encoding, gather, att-pool)
    (reference RandLANet.py:323-343)."""

    d_out: int
    momentum: float = 0.99
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None
    point_mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self, xyz, feature, neigh_idx, grid, train: bool = False
    ):
        # xyz (B, N, 3); feature (B, N, d_in = d_out//2); neigh_idx (B, N, K)
        # sorted_gather = jnp.take forward + the exact-extents sorted
        # scatter-add backward (ops/scatter_sorted.py): the plain gather
        # VJP costs ~66 ns/row on TPU (384 ms/level-0 step). ``grid`` =
        # (lo (B,3), span (B,3), r0, level) — the pyramid's level-0 search
        # grid. Batch loops stay unrolled (B is 1 or tiny; vmapping the
        # plan plumbing is the slow path — see pyramid.py).
        lo, span, r0, level = grid

        def gather(f, i):
            return _pshard(jnp.stack([
                sorted_gather(
                    f[b], i[b], xyz[b], xyz[b], lo[b], span[b], r0, level
                )
                for b in range(f.shape[0])
            ]), self.point_mesh)

        # one combined [xyz | feature] gather: TPU gather cost is per ROW
        # (width-insensitive), so fusing the position and feature lookups
        # halves round 1's gather time. r4: the row cost is also ~4-5x
        # LOWER for 2-byte tables than 4-byte ones at ANY width (measured
        # docs/probe_gather_variants.py: w=11 f32 64 ms vs w=14 bf16 14 ms
        # real at 365k x 16, overhead-corrected), so in the bf16 policy the
        # table rides entirely in bf16 with xyz split hi/lo (double-bf16):
        # reconstruction is exact to ~4e-6 — three orders of magnitude
        # under the search-grid cell — and the rel-pos encoding stays f32.
        if self.dtype == jnp.bfloat16:
            xyz_hi = xyz.astype(jnp.bfloat16)
            xyz_lo = (xyz - xyz_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            table = jnp.concatenate(
                [xyz_hi, xyz_lo, feature.astype(jnp.bfloat16)], axis=-1
            )
            neigh = gather(table, neigh_idx)             # (B,N,K,6+d/2)
            neigh_xyz = (neigh[..., :3].astype(jnp.float32)
                         + neigh[..., 3:6].astype(jnp.float32))
            f_neigh = neigh[..., 6:]
        else:
            table = jnp.concatenate(
                [xyz, feature.astype(xyz.dtype)], axis=-1
            )
            neigh = gather(table, neigh_idx)             # (B,N,K,3+d/2)
            neigh_xyz = neigh[..., :3]
            f_neigh = neigh[..., 3:].astype(feature.dtype)
        f_xyz = _pshard(jax.vmap(encode_neighbor_xyz)(
            xyz, neigh_xyz
        ), self.point_mesh)                                  # (B,N,K,10)
        f_xyz = SharedMLP(
            self.d_out // 2, momentum=self.momentum, dtype=self.dtype,
            axis_name=self.axis_name,
        )(f_xyz, train)
        f_neigh = f_neigh.astype(feature.dtype)              # (B,N,K,d/2)
        f_concat = jnp.concatenate([f_neigh, f_xyz], axis=-1)
        f_agg = AttPooling(
            self.d_out // 2, momentum=self.momentum, dtype=self.dtype,
            axis_name=self.axis_name,
        )(f_concat, train)

        f_xyz = SharedMLP(
            self.d_out // 2, momentum=self.momentum, dtype=self.dtype,
            axis_name=self.axis_name,
        )(f_xyz, train)
        f_neigh = gather(f_agg, neigh_idx)                   # (B,N,K,d/2)
        f_concat = jnp.concatenate([f_neigh, f_xyz], axis=-1)
        return AttPooling(
            self.d_out, momentum=self.momentum, dtype=self.dtype,
            axis_name=self.axis_name,
        )(f_concat, train)


class DilatedResBlock(nn.Module):
    """mlp(d/2) -> LFA -> mlp(2d, linear) + shortcut(2d, linear) -> leaky
    (reference RandLANet.py:314-321)."""

    d_out: int
    momentum: float = 0.99
    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None
    point_mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self, xyz, feature, neigh_idx, grid, train: bool = False
    ):
        f_pc = SharedMLP(
            self.d_out // 2, momentum=self.momentum, dtype=self.dtype,
            axis_name=self.axis_name,
        )(feature, train)
        f_pc = LocalFeatureAggregation(
            self.d_out, momentum=self.momentum, dtype=self.dtype,
            axis_name=self.axis_name, point_mesh=self.point_mesh,
        )(xyz, f_pc, neigh_idx, grid, train)
        f_pc = SharedMLP(
            2 * self.d_out, activation=False, momentum=self.momentum,
            dtype=self.dtype, axis_name=self.axis_name,
        )(f_pc, train)
        shortcut = SharedMLP(
            2 * self.d_out, activation=False, momentum=self.momentum,
            dtype=self.dtype, axis_name=self.axis_name,
        )(feature, train)
        return nn.leaky_relu(f_pc + shortcut, negative_slope=0.2)


def _max_pool(
    feature: jax.Array,    # (B, N, d) level-i features
    pool_idx: jax.Array,   # (B, M, K) neighbor rows of the kept points
    xyz: jax.Array,        # (B, N, 3) level-i coords
    sub_xyz: jax.Array,    # (B, M, 3) kept (level-i+1) coords
    grid,                  # (lo, span, r0, level) — pool searched level i
) -> jax.Array:
    """(B, M, d) max over gathered neighbors; sorted-VJP gather. The
    query rows (the kept points) are stored in the NEXT level's order —
    query_sorted=False re-sorts them inside the VJP."""
    lo, span, r0, level = grid
    out = [
        jnp.max(
            sorted_gather(
                feature[b], pool_idx[b], xyz[b], sub_xyz[b],
                lo[b], span[b], r0, level, False,
            ),
            axis=1,
        )
        for b in range(feature.shape[0])
    ]
    return jnp.stack(out)


def _interp(
    feature: jax.Array,     # (B, M, d) coarse-level features
    interp_idx: jax.Array,  # (B, N, 1) 1-NN rows into the coarse level
) -> jax.Array:
    """(B, N, d) nearest-neighbor upsample — plain gather. Its VJP stays
    the exact XLA scatter: K=1 keeps it under ~N rows (24 ms at 365k,
    vs 385 ms for the K=16 gathers the kernel replaces), and the coarse
    support is NOT cell-sorted at the up search's parent grid, so the
    consecutive-rows tile trick does not apply."""
    idx = interp_idx[..., 0]                       # (B, N)
    return jnp.take_along_axis(
        feature, idx[..., None], axis=1
    )


class RandLANet(nn.Module):
    """Encoder-decoder over the decimation pyramid (reference
    RandLANet.py:110-152)."""

    config: PointSegConfig
    axis_name: Optional[str] = None
    # a jax.sharding.Mesh with (data, point) axes: anchor every per-level
    # activation to the point axis so the GSPMD train step shards the
    # forward/backward, not just the pyramid (SURVEY §5.7)
    point_mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        features: jax.Array,   # (B, N, 3 + num_features) = concat(xyz, mods)
        pyramid: Pyramid,      # batched (leading B on every leaf)
        train: bool = False,
    ) -> jax.Array:
        cfg = self.config
        ax = self.axis_name
        # use_bfloat16=None -> auto: bf16 on TPU, f32 elsewhere
        # (core/config.py r3 default; Dice-neutral A/B in ACCURACY_r03)
        bf16 = cfg.use_bfloat16
        if bf16 is None:
            bf16 = jax.default_backend() == "tpu"
        dt = jnp.bfloat16 if bf16 else None

        # the pyramid's level-0 search grid, recomputed bit-exactly
        # (ops/pyramid.py build_pyramid: same reduction over the same
        # rows — min/max are permutation-invariant). The sorted-gather
        # VJPs use it to reproduce the search's cell assignment.
        r0 = _grid_resolution(pyramid.xyz[0].shape[1], 1.8)
        grid_lo = jnp.min(pyramid.xyz[0], axis=1)            # (B, 3)
        grid_span = jnp.maximum(
            jnp.max(pyramid.xyz[0], axis=1) - grid_lo, 1e-6
        )

        def grid(level):
            return (grid_lo, grid_span, r0, level)

        # fc0: tf.layers.dense + BN + leaky (reference RandLANet.py:114-116)
        feature = nn.Dense(8, kernel_init=_DENSE_INIT, dtype=dt)(features)
        feature = nn.BatchNorm(
            use_running_average=not train,
            momentum=cfg.bn_momentum,
            epsilon=1e-6,
            dtype=dt,
            axis_name=ax if train else None,
        )(feature)
        feature = _pshard(
            nn.leaky_relu(feature, negative_slope=0.2), self.point_mesh
        )

        # Encoder
        skips = []
        for i in range(cfg.num_layers):
            f_enc = _pshard(DilatedResBlock(
                cfg.d_out[i], momentum=cfg.bn_momentum, dtype=dt,
                axis_name=ax, point_mesh=self.point_mesh,
            )(
                pyramid.xyz[i], feature, pyramid.neigh_idx[i], grid(i),
                train,
            ), self.point_mesh)
            f_sampled = _pshard(_max_pool(
                f_enc, pyramid.sub_idx[i], pyramid.xyz[i],
                pyramid.xyz[i + 1], grid(i),
            ), self.point_mesh)
            feature = f_sampled
            if i == 0:
                skips.append(f_enc)
            skips.append(f_sampled)

        # Bottleneck 1x1 (reference RandLANet.py:130-132)
        feature = SharedMLP(
            skips[-1].shape[-1], momentum=cfg.bn_momentum, dtype=dt,
            axis_name=ax,
        )(feature, train)

        # Decoder (reference RandLANet.py:136-143)
        for j in range(cfg.num_layers):
            f_interp = _pshard(
                _interp(feature, pyramid.interp_idx[-j - 1]), self.point_mesh
            )
            f_cat = jnp.concatenate([skips[-j - 2], f_interp], axis=-1)
            feature = _pshard(SharedMLP(
                skips[-j - 2].shape[-1], momentum=cfg.bn_momentum, dtype=dt,
                axis_name=ax,
            )(f_cat, train), self.point_mesh)

        # Head: fc1(64) -> fc2(32) -> dropout(0.5) -> fc(num_classes)
        x = SharedMLP(64, momentum=cfg.bn_momentum, dtype=dt, axis_name=ax)(
            feature, train
        )
        x = SharedMLP(32, momentum=cfg.bn_momentum, dtype=dt, axis_name=ax)(
            x, train
        )
        x = nn.Dropout(rate=cfg.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(cfg.num_classes, kernel_init=_CONV_INIT)(x)
        return logits.astype(jnp.float32)


def init_randlanet(
    rng: jax.Array,
    config: PointSegConfig,
    num_points: Optional[int] = None,
    axis_name: Optional[str] = None,
):
    """Initialize variables (jitted, on a minimal cloud).

    Parameter shapes depend only on channel dims, never on the point count,
    so init runs at the smallest point count the decimation ratios allow —
    at 365k-scale an eager full-size init would dispatch hundreds of
    separate ops (catastrophic under remote compilation).
    """
    import math

    from ..ops.pyramid import build_pyramid_batch

    model = RandLANet(config, axis_name=axis_name)
    total_ratio = math.prod(config.sub_sampling_ratio)
    n_init = min(num_points or config.num_points, 4 * total_ratio)
    xyz = jnp.zeros((1, n_init, 3), jnp.float32)
    feats = jnp.zeros((1, n_init, 3 + config.num_features), jnp.float32)
    pyr = build_pyramid_batch(xyz, config.k_n, config.sub_sampling_ratio)

    @jax.jit
    def _init(rng, feats, pyr):
        return model.init(
            {"params": rng, "dropout": rng}, feats, pyr, train=False
        )

    return model, _init(rng, feats, pyr)
