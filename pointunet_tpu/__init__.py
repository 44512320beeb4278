"""pointunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of Point-Unet.

Point-Unet (MICCAI 2021) is a three-stage point-based volumetric medical-image
segmentation pipeline:

  1. Saliency attention: a 3D attention U-Net predicts an attentional
     probability map over the volume (reference: SaliencyAttention/).
  2. Context-aware sampling: the map is thresholded and the volume is turned
     into a fixed-budget point cloud keeping all salient voxels
     (reference: PointSegment/utils/dataPrepare*.py).
  3. Point segmentation: a RandLA-Net labels every point and per-point
     probabilities are scattered back into the voxel grid
     (reference: PointSegment/RandLANet.py, testBraTS.py).

This package is a ground-up TPU-first rebuild: static shapes everywhere,
on-device KNN/gather/scatter kernels, flax models, pjit/mesh parallelism,
and an in-process fused pipeline replacing the reference's filesystem glue.
"""

__version__ = "0.1.0"
