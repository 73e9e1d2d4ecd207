"""Pipeline-level mesh integration: the user-facing multi-chip switch.

Round-1 shipped the mesh/DP/FSDP library (`parallel/{mesh,dp,sample}.py`)
but no CLI used it. This module is the wiring: every training CLI calls

    mesh = setup_mesh(args)            # None when n_devices <= 1
    if mesh is not None:
        place_pipeline(pipe, mesh)     # replicate all device state
        dataset.place_on_mesh(mesh)    # batches come out dp-sharded

after which the existing jitted train steps run data-parallel with zero
further changes: GSPMD propagates the committed shardings (replicated
params + "dp"-sharded batch) through the donated train-step programs and
inserts the gradient all-reduce over ICI itself (scaling-book recipe).

Config keys (defaulted by `setup_mesh`, overridable on any CLI):
    n_devices:  1      number of chips; >1 activates the mesh
    mesh_shape: null   e.g. [2, 4] for a ("dp","fsdp") 2-D mesh
    platform:   null   "cpu" forces an n_devices virtual CPU mesh (the
                       hermetic test rig; also auto-selected with a warning
                       when fewer real chips than n_devices are attached
                       and the backend is still uninitialized)

The reference (single-GPU torch, SURVEY.md §2.10) has no equivalent; this
is the TPU-native scaling layer's product surface.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .dp import fsdp_shard_params
from .mesh import make_mesh, replicated

__all__ = ["setup_mesh", "place_pipeline", "place_state"]


def setup_mesh(args=None, n_devices: Optional[int] = None,
               mesh_shape=None, platform: Optional[str] = None) -> Optional[Mesh]:
    """Resolve the (n_devices, mesh_shape, platform) config keys to a Mesh.

    Must be called BEFORE any other device use when `platform` forcing is
    needed (jax is pre-imported in this environment: external JAX_PLATFORMS
    is ignored, so the virtual-CPU path sets XLA_FLAGS + jax.config
    in-process while the backend is still uninitialized).
    """
    if args is not None:
        n_devices = int(args.get("n_devices", 1) or 1) if n_devices is None else n_devices
        mesh_shape = args.get("mesh_shape", None) if mesh_shape is None else mesh_shape
        platform = args.get("platform", None) if platform is None else platform
        if bool(args.get("bf16_sampling", False)):
            # precision flag rides the same config->runtime chokepoint every
            # CLI already passes through: samplers cast params+net forward to
            # bfloat16 (MXU native), solver math stays f32
            from ..diffusion.basic import DiffusionModel

            DiffusionModel.bf16_sampling = True
        if bool(args.get("bf16_training", False)):
            # mixed-precision training: bf16 net forward/backward (halves
            # HBM traffic for activations — f32 matmuls already take the
            # bf16 MXU path under JAX's DEFAULT precision), f32 master
            # weights / loss / optimizer / EMA
            from ..diffusion.basic import DiffusionModel

            DiffusionModel.bf16_training = True
    n_devices = n_devices or 1
    if n_devices <= 1 and platform is None:
        return None

    if platform == "cpu":
        _force_cpu_devices(n_devices)
    elif platform is not None:
        raise ValueError(f"unknown platform={platform!r} (only 'cpu' forcing is supported)")
    if n_devices <= 1:
        return None

    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"n_devices={n_devices} but only {len(jax.devices())} "
            f"{jax.devices()[0].platform} device(s) available; "
            "pass platform=cpu (must be the first device use in the process) "
            "for an n_devices virtual CPU mesh"
        )
    if mesh_shape:
        shape = tuple(int(s) for s in mesh_shape)
        assert int(np.prod(shape)) == n_devices, (
            f"mesh_shape {shape} does not multiply to n_devices={n_devices}")
        return make_mesh(n_devices, axis_names=("dp", "fsdp"), shape=shape)
    return make_mesh(n_devices)


def _force_cpu_devices(n: int):
    import os

    if jax._src.xla_bridge._backends:
        if jax.devices()[0].platform == "cpu" and len(jax.devices()) >= n:
            return  # already configured (e.g. by tests/conftest.py)
        raise RuntimeError(
            "platform=cpu requested but the JAX backend is already "
            f"initialized with {len(jax.devices())} {jax.devices()[0].platform} "
            "device(s); set platform before any device use"
        )
    flag = f"--xla_force_host_platform_device_count={n}"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag
    jax.config.update("jax_platforms", "cpu")


# ----------------------------------------------------------------------
def _is_state_pytree(v) -> bool:
    """A flax.struct dataclass (TrainState, CriticState, IQLState, ...), a
    bare params dict tree (e.g. QGPOPipeline.q_params), or an optax
    opt_state (tuple of NamedTuples, e.g. QGPOPipeline.q_opt_state) holding
    only jax arrays."""
    if isinstance(v, type):
        return False
    if not (dataclasses.is_dataclass(v) or isinstance(v, (dict, tuple, list))
            or type(v).__name__ == "FrozenDict"):
        return False
    leaves = jax.tree_util.tree_leaves(v)
    return bool(leaves) and all(isinstance(l, jax.Array) for l in leaves)


def place_state(state, mesh: Mesh):
    """Replicate one state pytree over the mesh (committed)."""
    return jax.device_put(state, replicated(mesh))


def _place_obj(obj, mesh: Mesh) -> bool:
    """If obj is a state pytree holder, replicate its device state; returns
    True if anything was placed. Covers engines/classifiers/IQL/critics
    (`.state` flax.struct) AND bare-attr holders like the inverse-dynamics
    engines (`.params`/`.opt_state` without a struct). (Param/opt FSDP
    sharding is engine-level — `DataParallelEngine(..., fsdp_axis=...)`;
    pipelines replicate.)"""
    placed = False
    st = getattr(obj, "state", None)
    if _is_state_pytree(st):
        obj.state = place_state(st, mesh)
        placed = True
    for attr in ("params", "ema_params", "target_params", "opt_state"):
        v = getattr(obj, attr, None)
        if _is_state_pytree(v):
            setattr(obj, attr, place_state(v, mesh))
            placed = True
    return placed


def place_pipeline(pipe, mesh: Mesh) -> None:
    """Replicate every device state found on a pipeline over the mesh.

    Walks the pipeline's attributes for (a) bare flax.struct states
    (e.g. DQLPipeline.critic_state), (b) objects holding a `.state`
    struct (engines, classifiers, IQL, TD3BC), including one level of
    list/tuple/dict nesting (DiffuserLite's per-level engines). Sets
    `pipe.mesh` so act/eval fns can shard candidate batches.
    """
    placed = []
    for name, val in list(vars(pipe).items()):
        if _is_state_pytree(val):
            setattr(pipe, name, place_state(val, mesh))
            placed.append(name)
            continue
        candidates = []
        if isinstance(val, (list, tuple)):
            candidates = list(val)
        elif isinstance(val, dict):
            candidates = list(val.values())
        else:
            candidates = [val]
        for item in candidates:
            if item is None or isinstance(item, (int, float, str, bool, np.ndarray)):
                continue
            if _place_obj(item, mesh):
                placed.append(name)
            # engines nested one level deeper (pipeline.agent.classifier):
            # walked unconditionally — an engine with its own .state still
            # holds a separately-stated classifier/critic
            for sub in ("classifier", "critic", "iql", "invdyn"):
                subobj = getattr(item, sub, None)
                if subobj is not None and _place_obj(subobj, mesh):
                    placed.append(f"{name}.{sub}")
    pipe.mesh = mesh
    if not placed:
        raise ValueError(
            f"place_pipeline found no device state on {type(pipe).__name__}")
