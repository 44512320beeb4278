"""Device mesh and sharding helpers.

The reference is single-process single-GPU with dormant NCCL hooks (SURVEY
§2.5). The TPU-native parallel design is GSPMD: build a Mesh over ICI, shard
the batch (data axis) and optionally the point dimension (point axis — the
sequence-parallel analog), annotate inputs with NamedSharding, and let XLA
insert the collectives (grad all-reduce, sync-BN statistics) automatically.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig

DATA_AXIS = "data"
POINT_AXIS = "point"


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Create a (data, point) mesh. Defaults: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=len(devices), point=1)
    n = cfg.data * cfg.point
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg.data}x{cfg.point} needs {n} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(cfg.data, cfg.point)
    return Mesh(dev, (DATA_AXIS, POINT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_point_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (batch, points, ...) over (data, point)."""
    return NamedSharding(mesh, P(DATA_AXIS, POINT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array's leading dim across the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), tree
    )
