"""Unified configuration for pointunet_tpu.

The reference scatters configuration across three uncoordinated mechanisms
(class attributes in PointSegment/helper_tool.py:21-75, module globals in
SaliencyAttention/config.py, and per-entry-point argparse). Here everything is
a frozen dataclass pytree so configs can be passed through jit boundaries as
static arguments and serialized alongside checkpoints.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class PointSegConfig:
    """RandLA-Net point-segmentation config.

    Defaults mirror ConfigBraTS (reference PointSegment/helper_tool.py:21-51).
    """

    name: str = "BraTS20"
    k_n: int = 16                      # KNN neighbours
    num_layers: int = 5                # encoder/decoder depth
    num_points: int = 365_000          # fixed point budget per cloud
    num_classes: int = 4
    num_features: int = 4              # intensity channels (t1ce,t1,flair,t2)
    sub_grid_size: float = 0.01        # offline grid-subsample cell size
    batch_size: int = 1
    val_batch_size: int = 1
    train_steps: int = 295             # steps per epoch
    val_steps: int = 74
    sub_sampling_ratio: Tuple[int, ...] = (4, 4, 4, 4, 2)
    d_out: Tuple[int, ...] = (16, 64, 128, 256, 512)   # per-layer feature dims
    learning_rate: float = 1e-4
    lr_decay: float = 0.95             # per-epoch multiplicative decay
    max_epoch: int = 100
    dropout_rate: float = 0.5
    bn_momentum: float = 0.99          # reference helper_tf_util.py:167
    ignored_label_inds: Tuple[int, ...] = ()
    # class weights follow reference DP.get_class_weights (helper_tool.py:172-184)
    class_counts: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    # dtype policy: bf16 matmuls with f32 accumulations/norm stats.
    # None = AUTO: bf16 on TPU, f32 elsewhere. Flipped to auto in r3 on
    # convergence evidence at the full (240,240,155) x 365k contract —
    # fused mean Dice 0.9999 both f32 and bf16 (ACCURACY_r03.json), train
    # step 581 ms bf16 vs 662 ms f32 with the sorted-scatter kernel.
    # CPU (tests, cross-mesh loss-equality bars) auto-resolves to f32,
    # preserving the reference numerics there. Explicit True/False still
    # forces the dtype (bench A/B uses this).
    use_bfloat16: Optional[bool] = None

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        """Point counts entering each encoder level, plus the bottleneck size."""
        sizes = [self.num_points]
        for r in self.sub_sampling_ratio:
            sizes.append(sizes[-1] // r)
        return tuple(sizes)

    def class_weights(self) -> Tuple[float, ...]:
        total = float(sum(self.class_counts))
        return tuple(1.0 / (c / total + 0.02) for c in self.class_counts)


def brats_pointseg_config(**overrides) -> PointSegConfig:
    return dataclasses.replace(PointSegConfig(), **overrides)


def block64_pointseg_config(**overrides) -> PointSegConfig:
    """BraTS_Block64 variant: 64^3 block clouds with empirical class counts
    (reference helper_tool.py:179)."""
    base = PointSegConfig(
        name="BraTS_Block64",
        num_points=180_000,
        class_counts=(1403.0, 22.0, 80.0, 11.0),
    )
    return dataclasses.replace(base, **overrides)


def pancreas_pointseg_config(**overrides) -> PointSegConfig:
    """ConfigPancreas (reference helper_tool.py:52-75)."""
    base = PointSegConfig(
        name="Pancreas",
        num_points=180_000,
        num_classes=2,
        num_features=1,          # single CT intensity channel
        learning_rate=1e-3,
        class_counts=(1.0, 1.0),
    )
    return dataclasses.replace(base, **overrides)


@dataclass(frozen=True)
class SaliencyConfig:
    """3D attention U-Net config (reference SaliencyAttention/config.py)."""

    num_class: int = 2
    in_channels: int = 1               # 4 for BraTS (modalities), 1 for Pancreas
    depth: int = 5
    base_filter: int = 16
    filter_grow: bool = True
    residual: bool = True
    deep_supervision: bool = True      # used by the plain unet3d variant
    instance_norm: bool = True
    ca_attention: bool = True
    sa_attention: bool = True
    # Spatial-attention gate resolution divisor. 1 = reference-exact
    # (gate convs at full resolution). 2 = inference perf mode: the k=9
    # separable gate convs (the single most expensive ops in the net,
    # ~6.5 TFLOP at the BraTS ROI window) run on a 2x-avg-pooled input
    # and the 1-channel gate is trilinearly resized back before the
    # multiply — 8x fewer gate FLOPs. Param shapes are stride-
    # independent, so checkpoints transfer across settings. Measured
    # (paired full-contract A/B, ACCURACY_r03.json @ ffc8bbd): stride 2
    # is Dice-neutral (mean 0.9999 -> 0.9999, ET -0.0001) and cuts
    # fused e2e latency 632 -> 542 ms on chip, so the inference/latency
    # paths (segment --fast, bench e2e) default to 2; training and the
    # parity path stay at 1 (reference-exact).
    sa_gate_stride: int = 1
    patch_size: Tuple[int, int, int] = (64, 160, 160)
    inference_patch_size: Tuple[int, int, int] = (64, 160, 160)
    batch_size: int = 2
    base_lr: float = 0.01
    steps_per_epoch: int = 250
    max_epoch: int = 200
    eval_epoch: int = 10
    data_sampling: str = "one_positive"  # random | one_positive | all_positive
    mixup: bool = False
    intensity_norm: str = "modality"
    multi_view: bool = False
    direction: str = "axial"             # axial | sagittal | coronal
    test_flip: bool = False
    advance_postprocessing: bool = False
    # sliding-window strides (reference eval.py:108-109)
    xstep: int = 48
    ystep: int = 118
    zstep: int = 118
    weight_decay: float = 1e-5
    # bf16 conv compute with f32 params/statistics (inference speedup; the
    # reference is f32-only)
    use_bfloat16: bool = False
    # rematerialize blocks in the backward pass: full-resolution activation
    # stashes at (64,160,160) OOM a 16G chip without it
    remat: bool = True
    # lr schedule drop epochs (reference train.py:276-281)
    lr_schedule: Tuple[Tuple[int, float], ...] = (
        (20, 0.001), (70, 0.0005), (110, 0.0001), (150, 5e-5), (280, 1e-5),
    )


def brats_saliency_config(**overrides) -> SaliencyConfig:
    return dataclasses.replace(
        SaliencyConfig(num_class=2, in_channels=4), **overrides
    )


def pancreas_saliency_config(**overrides) -> SaliencyConfig:
    return dataclasses.replace(
        SaliencyConfig(num_class=2, in_channels=1), **overrides
    )


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding.

    data: data parallelism over volumes/clouds (batch axis).
    point: optional sharding of the point dimension inside one cloud
           (the sequence-parallel analog for >1M-point clouds).
    """

    data: int = 1
    point: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.point


@dataclass(frozen=True)
class TrainConfig:
    """Shared training-loop knobs."""

    seed: int = 0
    log_every: int = 10
    checkpoint_dir: str = "model_logs"
    max_to_keep: int = 100
    donate_state: bool = True
    debug_nans: bool = False
    profile_dir: str = ""
    # background host prefetch depth for batch iterators (the tensorpack
    # QueueInput role, reference train.py:270); 0 disables
    prefetch_buffers: int = 4
    mesh: MeshConfig = field(default_factory=MeshConfig)
