"""Fully device-resident Point-Unet: one volume in HBM -> labels in HBM.

The performance statement of this framework: the reference's three stages
plus four filesystem hand-offs collapse into four chained XLA programs with
zero host round-trips for data —

  1. saliency attention as a SINGLE whole-volume window (padded to the
     depth-5 stride; 2.2x less work than the reference's 12 overlapping
     (64,160,160) tiles) in bf16;
  2. on-device context-aware sampling (ops/sampling.py): one top-k over
     priority scores replaces the host numpy sampler;
  3. on-device KNN pyramid (Pallas cell-window kernel) + RandLA-Net;
  4. per-point probabilities scattered back into the voxel grid.

`PointUnetPipeline` (end2end.py) keeps the reference's overlapping-window
numerics for parity; this module is the speed path used by `segment --fast`
and the benchmark.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PointSegConfig, SaliencyConfig
from ..ops.pyramid import build_pyramid_batch
from ..ops.sampling import sample_cloud_device
from ..ops.scatter import scatter_labels_to_volume


def _pad_to_multiple(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


class FusedPointUnet:
    def __init__(
        self,
        saliency_model,
        saliency_variables,
        pointseg_model,
        pointseg_variables,
        saliency_config: SaliencyConfig,
        pointseg_config: PointSegConfig,
        threshold: float = 0.9,
        volume_shape=(240, 240, 155),   # (X, Y, Z)
        roi_shape=None,                 # (X, Y, Z) static brain-ROI crop
        att_downscale: int = 1,         # run saliency at 1/s resolution
        mask_dilate: int = 0,           # dilate the salient mask (voxels)
        mask_band: int = 0,             # boundary-band width (voxels)
        band_threshold: float | None = None,
    ):
        """roi_shape: optional static (rx, ry, rz) brain-region crop for the
        attention stage. The reference never runs attention on the full
        volume — its eval dataflow crops to the brain bounding box first
        (reference SaliencyAttention/data_sampler.py:448 crop_brain_region,
        utils.py:30) and re-inserts the prediction into the full grid. XLA
        needs static shapes, so instead of the exact per-case bbox we
        dynamic-slice a fixed-size window centered on the (device-computed)
        bbox center, clamped to the volume; voxels outside the ROI are
        non-salient, exactly like voxels outside the reference's bbox. A
        generous BraTS default is (192, 208, 155) — brains exceeding the
        window lose only margin that is background in practice. Besides the
        ~1.4x less attention work, the instance-norm footprint then matches
        the reference's brain-cropped statistics rather than a half-empty
        padded volume.

        att_downscale: optional perf mode (s > 1) — the WHOLE saliency net
        runs on an s^3-avg-pooled window and the class-1 probability map is
        trilinearly resized back before thresholding. This is sound
        because the attention output's only consumer is the point SAMPLER
        (a tumor-region prior; `sample` below) — final voxel labels come
        entirely from the point network — so the mask needs localization,
        not voxel-exact boundaries. Conv/norm parameters are
        spatial-size-independent, so full-res-trained checkpoints transfer
        unchanged; the generalization of the `sa_gate_stride` precedent
        (config.py), gated by the same paired full-contract Dice A/B
        (bench.py --preset accuracy --att_downscale 2).

        mask_dilate: grow the thresholded salient mask by d voxels
        (separable max-pool over the probability map before
        thresholding). The r4 full-contract A/B measured att_downscale=2
        alone at -0.0125 mean Dice: the coarse probability map misses
        thin tumor-boundary voxels, and an unsampled tumor voxel
        scatters back as background. Dilation re-admits the boundary
        into the sampled set (the budget has slack: salient counts stay
        well under num_points) for three 1-D max-pool passes, ~nothing
        at the volume sizes here — but measured in r4 it did NOT recover
        the gap (docs/ATTENTION_STAGE.md).

        mask_band (mutually exclusive with mask_dilate): instead of
        growing the core mask, mark a SECOND sampling tier
        (ops/sampling.py graded mask) that only consumes budget slack —
        core voxels always outrank it. The band is the union of (a) the
        geometric edge band: core dilated by ``mask_band`` voxels minus
        core, and (b) the LOW-CONFIDENCE band: voxels whose coarse
        probability reaches ``band_threshold`` (default threshold / 4)
        but not ``threshold`` — the voxels a downscaled probability map
        endangers are exactly those whose coarse prob was diluted below
        the cut by s^3 pooling, and those can lie anywhere a structure
        is thin, not just within d voxels of the detected core
        (dilation's failure mode). Because the band is a lower tier the
        width can be generous without ever displacing core-salient
        voxels."""
        self.scfg = saliency_config
        self.pcfg = pointseg_config
        self.threshold = threshold
        self.volume_shape = tuple(volume_shape)
        self.roi_shape = None if roi_shape is None else tuple(roi_shape)
        self.att_downscale = int(att_downscale)
        self.mask_dilate = int(mask_dilate)
        if self.att_downscale < 1:
            raise ValueError(
                f"att_downscale must be >= 1, got {self.att_downscale}"
            )
        if self.mask_dilate < 0:
            raise ValueError(
                f"mask_dilate must be >= 0, got {self.mask_dilate}"
            )
        self.mask_band = int(mask_band)
        if self.mask_band < 0:
            raise ValueError(
                f"mask_band must be >= 0, got {self.mask_band}"
            )
        if self.mask_band > 0 and self.mask_dilate > 0:
            raise ValueError(
                "mask_band and mask_dilate are mutually exclusive "
                "boundary-recovery modes"
            )
        self.band_threshold = (
            threshold / 4.0 if band_threshold is None else float(band_threshold)
        )
        s = self.att_downscale
        x, y, z = self.volume_shape
        if self.roi_shape is not None:
            rx, ry, rz = (min(r, d) for r, d in zip(self.roi_shape, (x, y, z)))
            self.roi_shape = (rx, ry, rz)
        else:
            rx, ry, rz = x, y, z
        # the pooled window must still divide the net's depth-5 stride, so
        # pad to a multiple of 16*s before pooling
        zp = _pad_to_multiple(rz, 16 * s)
        yp = _pad_to_multiple(ry, 16 * s)
        xp = _pad_to_multiple(rx, 16 * s)

        def _roi_start(present, size, r):
            # bbox center of the nonzero projection, clamped so the static
            # window stays in bounds; an all-zero volume centers the window
            idx = jnp.arange(size)
            first = jnp.min(jnp.where(present, idx, size))
            last = jnp.max(jnp.where(present, idx, -1))
            center = (first + last + 1) // 2
            return jnp.clip(center - r // 2, 0, max(size - r, 0))

        @jax.jit
        def attention_mask(mods):                 # (C, X, Y, Z) -> (X, Y, Z)
            if self.roi_shape is None:
                roi = mods
                sx = sy = sz = 0
            else:
                brain = jnp.any(mods != 0, axis=0)           # (X, Y, Z)
                sx = _roi_start(jnp.any(brain, axis=(1, 2)), x, rx)
                sy = _roi_start(jnp.any(brain, axis=(0, 2)), y, ry)
                sz = _roi_start(jnp.any(brain, axis=(0, 1)), z, rz)
                roi = jax.lax.dynamic_slice(
                    mods, (0, sx, sy, sz), (mods.shape[0], rx, ry, rz)
                )
            vol = jnp.transpose(roi, (3, 2, 1, 0))           # (Z, Y, X, C)
            vol = jnp.pad(
                vol,
                ((0, zp - rz), (0, yp - ry), (0, xp - rx), (0, 0)),
            )
            if s > 1:
                c = vol.shape[-1]
                vol = vol.reshape(
                    zp // s, s, yp // s, s, xp // s, s, c
                ).mean(axis=(1, 3, 5))
            logits = saliency_model.apply(
                saliency_variables, vol[None], train=False
            )[0]
            probs = jax.nn.softmax(logits, axis=-1)[..., 1]
            if s > 1:
                probs = jax.image.resize(probs, (zp, yp, xp), "trilinear")
            def _maxpool3(p, width):
                d = 2 * width + 1
                for ax in range(3):
                    win = [1, 1, 1]
                    win[ax] = d
                    p = jax.lax.reduce_window(
                        p, -jnp.inf, jax.lax.max,
                        tuple(win), (1, 1, 1), "SAME",
                    )
                return p

            if self.mask_dilate > 0:
                probs = _maxpool3(probs, self.mask_dilate)
            if self.mask_band > 0:
                # graded mask (ops/sampling.py): core = 2, band = 1.
                # band = (geometric edge band) | (low-confidence band),
                # both from the SAME resized coarse probability map
                core = probs >= threshold
                band = (
                    (_maxpool3(probs, self.mask_band) >= threshold)
                    | (probs >= self.band_threshold)
                ) & ~core
                graded = (
                    2 * core.astype(jnp.uint8) + band.astype(jnp.uint8)
                )[:rz, :ry, :rx]
                mask_roi = jnp.transpose(graded, (2, 1, 0))
                if self.roi_shape is None:
                    return mask_roi
                return jax.lax.dynamic_update_slice(
                    jnp.zeros((x, y, z), jnp.uint8), mask_roi, (sx, sy, sz)
                )
            probs = probs[:rz, :ry, :rx]
            mask_roi = jnp.transpose(probs, (2, 1, 0)) >= threshold
            if self.roi_shape is None:
                return mask_roi
            return jax.lax.dynamic_update_slice(
                jnp.zeros((x, y, z), bool), mask_roi, (sx, sy, sz)
            )

        @jax.jit
        def sample(mods, mask, key):
            return sample_cloud_device(
                mods, mask, key, self.pcfg.num_points
            )

        @jax.jit
        def pyramid_fn(xyz):
            return build_pyramid_batch(
                xyz[None], self.pcfg.k_n, self.pcfg.sub_sampling_ratio
            )

        pseg_bf16 = pointseg_config.use_bfloat16
        if pseg_bf16 is None:
            pseg_bf16 = jax.default_backend() == "tpu"

        @jax.jit
        def pointseg_scatter(pyramid, xyz, feats, origin):
            # the sorted-pyramid contract (ops/pyramid.py): gather the
            # row-aligned features/origins into cell-sorted order once;
            # the voxel scatter is order-agnostic, so no unsort exists
            # anywhere on this path. In the bf16 policy the reorder
            # gathers a bf16 table (f32 row gathers are ~4-5x slower on
            # TPU, docs/probe_gather_variants.py); fc0 casts to bf16
            # either way, and the model reads xyz for geometry from
            # pyramid.xyz (f32), not from these input features.
            order = pyramid.order[0]
            feats_all = jnp.concatenate([xyz, feats], -1)
            if pseg_bf16:
                feats_all = feats_all.astype(jnp.bfloat16)
            logits = pointseg_model.apply(
                pointseg_variables,
                feats_all[order][None],
                pyramid,
                train=False,
            )
            # argmax BEFORE the scatter: sampled voxel indices are unique
            # (top_k), softmax is monotone, so at every written voxel
            # argmax(probs) == argmax(logits) (raw logits even dodge f32
            # softmax rounding ties) and empty voxels' all-zero probs
            # argmax to 0 == background label. The (Z, Y, X, C) f32
            # volume (143 MB at the
            # BraTS contract) never materializes: measured 62 -> ~5 ms
            # for the scatter+argmax tail
            labels_pt = jnp.argmax(logits[0], axis=-1).astype(jnp.uint8)
            labels = scatter_labels_to_volume(
                labels_pt, origin[order], (z, y, x)
            )
            return labels                                     # (Z, Y, X)

        self._attention_mask = attention_mask
        self._sample = sample
        self._pyramid_fn = pyramid_fn
        self._pointseg_scatter = pointseg_scatter

        def volume_raw(mods, key):
            """One volume through all four stages (un-jitted composition
            for the vmapped data-parallel batch path)."""
            mask = attention_mask(mods)
            cloud = sample(mods, mask, key)
            pyramid = pyramid_fn(cloud.xyz)
            return pointseg_scatter(
                pyramid, cloud.xyz, cloud.features, cloud.xyz_origin
            )

        self._volume_raw = volume_raw
        self._batched_fn = None

    def segment_device(self, modalities: jax.Array, key: jax.Array):
        """(C, X, Y, Z) device array -> (Z, Y, X) uint8 labels, on device."""
        mask = self._attention_mask(modalities)
        cloud = self._sample(modalities, mask, key)
        pyramid = self._pyramid_fn(cloud.xyz)
        return self._pointseg_scatter(
            pyramid, cloud.xyz, cloud.features, cloud.xyz_origin
        )

    def segment_batch_device(
        self,
        modalities: jax.Array,    # (B, C, X, Y, Z)
        keys: jax.Array,          # (B,) folded into per-volume PRNG keys
        mesh=None,
    ) -> jax.Array:
        """Data-parallel batch inference: volumes shard over the mesh's
        data axis (one volume per device at B == mesh size), each running
        the full fused pipeline. Returns (B, Z, Y, X) uint8.

        The multi-chip analog of the reference's one-GPU-per-process test
        loop — no NCCL/MPI, the mesh places the per-volume programs
        (SURVEY §2.5). The per-volume axis is `lax.map`, NOT `vmap`:
        vmapping the RandLA forward adds a batch dimension to its
        multi-million-row neighbor gathers, which XLA:TPU miscompiles into
        a faulting kernel at the 365k BraTS contract (measured r4: device
        fault in the batched forward with every stage before it clean —
        the unbatched program is fine). lax.map runs the identical
        unbatched program per volume and compiles it ONCE regardless of
        batch size; under a mesh, shard_map gives every device its local
        shard so the map body stays the single-volume program end to end.
        """
        if self._batched_fn is None:
            def _mapped(mods_b, keys_b):
                return jax.lax.map(
                    lambda mk: self._volume_raw(mk[0], mk[1]),
                    (mods_b, keys_b),
                )

            self._batched_fn = jax.jit(_mapped)
            self._sharded_fns = {}
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import batch_sharding

            # stable cache key: equivalent Mesh objects constructed per
            # call must hit the same compiled fn (id() would recompile
            # and pin every mesh alive)
            key_m = (
                tuple(mesh.axis_names),
                mesh.devices.shape,
                tuple(d.id for d in mesh.devices.flat),
            )
            if key_m not in self._sharded_fns:
                axes = tuple(mesh.axis_names)
                spec = P(axes[0])
                self._sharded_fns[key_m] = jax.jit(
                    jax.shard_map(
                        self._batched_fn.__wrapped__,
                        mesh=mesh,
                        in_specs=(spec, spec),
                        out_specs=spec,
                        check_vma=False,
                    )
                )
            sh = batch_sharding(mesh)
            modalities = jax.device_put(modalities, sh)
            keys = jax.device_put(keys, sh)
            return self._sharded_fns[key_m](modalities, keys)
        return self._batched_fn(modalities, keys)

    def segment_volume(
        self, modalities: np.ndarray, seed: int = 0,
        brats_labels: bool = True,
    ) -> np.ndarray:
        """(C, X, Y, Z) numpy -> (X, Y, Z) labels, reference label values."""
        labels = np.asarray(
            self.segment_device(
                jnp.asarray(modalities, jnp.float32), jax.random.PRNGKey(seed)
            )
        )
        labels = np.transpose(labels, (2, 1, 0)).copy()
        if brats_labels:
            labels[labels == 3] = 4
        return labels
