"""Normalization layers for the volumetric nets.

The reference's BN_Relu (SaliencyAttention/model.py:366-372) selects between
a 5-D instance norm (custom_ops.py:28-82) and a 5-D batch norm whose
sync_statistics path all-reduces mean/var over NCCL (custom_ops.py:345-362).
Here the same choice is one module: InstanceNorm needs no cross-device work;
BatchNorm syncs via jax collectives (axis_name) when run under a mesh —
the TPU-native replacement for the NCCL path.
"""
from __future__ import annotations

from typing import Optional

from flax import linen as nn


class NormRelu(nn.Module):
    """norm + relu, instance or (sync) batch flavored."""

    instance_norm: bool = True
    momentum: float = 0.9
    dtype: object = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.instance_norm:
            # per-sample, per-channel stats over spatial dims (D, H, W);
            # statistics reduce in f32 regardless of compute dtype
            x = nn.GroupNorm(
                num_groups=None, group_size=1, epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
        return nn.relu(x)
