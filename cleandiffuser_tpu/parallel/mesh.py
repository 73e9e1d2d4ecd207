"""Device-mesh helpers for multi-chip training/sampling.

The reference has NO distributed support (SURVEY.md §2.10 — single-GPU
PyTorch only). This module is the TPU-native scaling layer: a 1-or-2-axis
`jax.sharding.Mesh` ("dp" for batch data parallelism over ICI, optional
"fsdp" for parameter sharding of larger DiT backbones), with
NamedSharding-annotated jit so XLA inserts the gradient psum / parameter
all-gathers itself (scaling-book recipe: annotate shardings, let XLA place
collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch", "P"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices devices.

    Default: 1-D "dp" mesh over all devices. Pass shape=(a, b) with
    axis_names=("dp", "fsdp") for a 2-D mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
        if shape is None:
            raise ValueError("shape required for multi-axis mesh")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch pytree with leading-dim sharding over the mesh."""
    sharding = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
