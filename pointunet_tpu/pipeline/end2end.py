"""Fused in-process Point-Unet pipeline: volume -> segmentation.

The reference glues its three stages through the filesystem (attention .npy
-> genBinaryMap -> binary nii.gz -> dataPrepare ply -> runBraTS test .npy ->
genSegmentation nii.gz; SURVEY §1). Here the same dataflow is one in-process
call with device-resident intermediates:

  1. saliency attention: sliding-window 3D U-Net -> per-voxel probability
     (ops/window.py, one jit);
  2. context-aware sampling: threshold -> fixed-budget point cloud keeping
     all salient voxels (data/pointcloud.py);
  3. point segmentation: on-device pyramid + RandLA-Net -> per-point probs;
  4. scatter back to the voxel grid, argmax, BraTS label 3 -> 4 remap
     (reference genSegmentationBraTS.py:67-78).

The file-based CLIs (pointunet_tpu/cli) remain available for stage-by-stage
parity with the reference flag surface.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PointSegConfig, SaliencyConfig
from ..data.pointcloud import PointCloud, sample_cloud, volume_to_points
from ..ops.pyramid import build_pyramid_batch
from ..ops.scatter import scatter_probs_to_volume
from ..ops.window import sliding_window_inference


class PointUnetPipeline:
    """End-to-end inference over (C, X, Y, Z) modality volumes."""

    def __init__(
        self,
        saliency_model,
        saliency_variables,
        pointseg_model,
        pointseg_variables,
        saliency_config: SaliencyConfig,
        pointseg_config: PointSegConfig,
        threshold: float = 0.9,
        seed: int = 0,
    ):
        self.saliency_model = saliency_model
        self.saliency_variables = saliency_variables
        self.pointseg_model = pointseg_model
        self.pointseg_variables = pointseg_variables
        self.scfg = saliency_config
        self.pcfg = pointseg_config
        self.threshold = threshold
        self._rng = np.random.default_rng(seed)
        self._build()

    def _build(self):
        scfg, pcfg = self.scfg, self.pcfg

        def saliency_fn(window):
            logits = self.saliency_model.apply(
                self.saliency_variables, window, train=False
            )
            return jax.nn.softmax(logits, axis=-1)

        @jax.jit
        def attention_probs(volume_dhwc):
            return sliding_window_inference(
                volume_dhwc,
                saliency_fn,
                scfg.inference_patch_size,
                (scfg.xstep, scfg.ystep, scfg.zstep),
                scfg.num_class,
            )

        @jax.jit
        def binary_mask_xyz(volume_dhwc, threshold):
            """Thresholded salient mask, on device, already transposed to
            (X, Y, Z): segment_volume needs only the binary map, and
            downloading uint8 is 32x cheaper than the (D,H,W,C) f32
            probability volume (286 MB for BraTS)."""
            probs = attention_probs(volume_dhwc)[..., 1]
            return jnp.transpose(probs >= threshold, (2, 1, 0)).astype(
                jnp.uint8
            )

        # pyramid and network are separate XLA programs (layout cliff when
        # fused — see train/pointseg.py:_build_steps); both device-resident.
        @jax.jit
        def pyramid_fn(xyz):
            return build_pyramid_batch(
                xyz[None], pcfg.k_n, pcfg.sub_sampling_ratio
            )

        @jax.jit
        def pointseg_forward(pyramid, xyz, feats):
            # sorted-pyramid contract: model rows are cell-sorted; this
            # parity path keeps its original-order output surface (per-
            # point prob arrays are zipped with caller-held origins), so
            # predictions are unsorted on the way out
            order = pyramid.order[0]
            logits = self.pointseg_model.apply(
                self.pointseg_variables,
                jnp.concatenate([xyz, feats], -1)[order][None],
                pyramid,
                train=False,
            )
            probs = jax.nn.softmax(logits[0], axis=-1)
            return probs[jnp.argsort(order)]

        def pointseg_probs(xyz, feats):
            return pointseg_forward(pyramid_fn(xyz), xyz, feats)

        @functools.partial(jax.jit, static_argnames=("shape", "brats"))
        def scatter_argmax(probs, origin, shape, brats):
            """Scatter + argmax + label remap on device: the host only
            downloads (Z, Y, X) uint8 labels, not the (Z, Y, X, C) f32
            probability volume (570 MB for BraTS — transfer-bound on any
            host, catastrophic through a relay)."""
            vol = scatter_probs_to_volume(probs, origin, shape)
            labels = jnp.argmax(vol, axis=-1).astype(jnp.uint8)
            if brats:
                labels = jnp.where(
                    labels == 3, jnp.uint8(4), labels
                )
            return labels

        self._attention_probs = attention_probs
        self._binary_mask_xyz = binary_mask_xyz
        self._pointseg_probs = pointseg_probs
        self._scatter_argmax = scatter_argmax

    # -------------------------------------------------------------- #

    def attention_map(self, modalities: np.ndarray) -> np.ndarray:
        """Stage 1: (C, X, Y, Z) -> per-voxel salient probability (X, Y, Z).

        The saliency net sees [z, y, x] slabs (the reference's nifty
        transpose, utils.py:295-311); output is transposed back.
        """
        vol = np.transpose(np.asarray(modalities), (3, 2, 1, 0))  # (Z,Y,X,C)
        probs = np.asarray(self._attention_probs(jnp.asarray(vol)))
        return np.transpose(probs[..., 1], (2, 1, 0))             # (X, Y, Z)

    def binary_map(self, modalities: np.ndarray) -> np.ndarray:
        """Stage 1+threshold (reference utils/genBinaryMap.py:67-79)."""
        return (self.attention_map(modalities) >= self.threshold).astype(
            np.uint8
        )

    def segment_points(self, cloud: PointCloud) -> np.ndarray:
        """Stage 3 on an already-sampled fixed-budget cloud -> (N, C) probs."""
        return np.asarray(
            self._pointseg_probs(
                jnp.asarray(cloud.xyz), jnp.asarray(cloud.features)
            )
        )

    def segment_volume(
        self,
        modalities: np.ndarray,             # (C, X, Y, Z), normalized
        mask: Optional[np.ndarray] = None,  # precomputed binary map
        brats_labels: bool = True,
        postprocess: bool = False,
    ) -> np.ndarray:
        """Full pipeline -> (X, Y, Z) label volume."""
        modalities = np.asarray(modalities, np.float32)
        if mask is None:
            vol = np.transpose(modalities, (3, 2, 1, 0))   # (Z, Y, X, C)
            mask = np.asarray(
                self._binary_mask_xyz(
                    jnp.asarray(vol), jnp.float32(self.threshold)
                )
            )

        cloud = volume_to_points(modalities)
        fg = mask[
            cloud.xyz_origin[:, 0], cloud.xyz_origin[:, 1], cloud.xyz_origin[:, 2]
        ]
        sampled = sample_cloud(
            cloud, self.pcfg.num_points, self._rng, foreground=fg
        )
        # stay on device between point segmentation and scatter-back
        probs = self._pointseg_probs(
            jnp.asarray(sampled.xyz), jnp.asarray(sampled.features)
        )

        x, y, z = modalities.shape[1:]
        labels = np.asarray(
            self._scatter_argmax(
                probs, jnp.asarray(sampled.xyz_origin),
                (z, y, x), brats_labels,  # remap 3->4: genSegmentationBraTS
            )
        )                                      # (Z, Y, X) uint8
        labels = np.transpose(labels, (2, 1, 0))  # (X, Y, Z)
        if postprocess and brats_labels:
            from .postprocess import postprocess_brats

            labels = postprocess_brats(labels)
        return labels
