"""Data-parallel (+ optional FSDP) wrappers for engines and pipelines.

Scaling model (SURVEY.md §2.10 TPU-native equivalents): batch sharded over
the "dp" mesh axis, parameters replicated (models are 1–10M params) or
sharded over "fsdp" for the larger DiT backbones; XLA derives the gradient
all-reduce over ICI from the sharding annotations — no hand-written
collectives in the training step.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharded, replicated, shard_batch

__all__ = ["DataParallelEngine", "fsdp_shard_params"]


def fsdp_shard_params(params, mesh: Mesh, axis: str = "fsdp", min_size: int = 2**16):
    """Shard each large parameter along its largest dimension over `axis`.

    Returns a pytree of NamedShardings (replicated for small leaves).
    """
    n_shards = mesh.shape[axis]

    def spec_for(leaf):
        if leaf.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest dim divisible by the axis size
        dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in dims:
            if leaf.shape[d] % n_shards == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


class DataParallelEngine:
    """Wrap a DiffusionModel engine for multi-chip data-parallel training.

    Usage:
        mesh = make_mesh(8)
        dp = DataParallelEngine(engine, mesh)
        dp.place()                       # move state onto the mesh
        log = dp.update(x0, cond)        # batch auto-sharded over "dp"
    """

    def __init__(self, engine, mesh: Mesh, axis: str = "dp",
                 fsdp_axis: Optional[str] = None, fsdp_min_size: int = 2**16):
        self.engine = engine
        self.mesh = mesh
        self.axis = axis
        self.fsdp_axis = fsdp_axis
        self.fsdp_min_size = fsdp_min_size
        self._fn_cache = {}

    def place(self):
        """Device_put the engine state with the chosen shardings."""
        assert self.engine.state is not None, "initialize the engine first"
        if self.fsdp_axis is not None:
            param_shardings = fsdp_shard_params(
                self.engine.state.params, self.mesh, self.fsdp_axis,
                min_size=self.fsdp_min_size,
            )
            # optimizer moments (mu/nu) are param-shaped: the same
            # shape-driven spec chooser gives them the same shardings as
            # their params, so per-device opt bytes shrink with the params
            # (scalar leaves like `count` fall below min_size -> replicated)
            state_shardings = self.engine.state.replace(
                params=param_shardings,
                ema_params=param_shardings,
                opt_state=fsdp_shard_params(
                    self.engine.state.opt_state, self.mesh, self.fsdp_axis,
                    min_size=self.fsdp_min_size,
                ),
                step=replicated(self.mesh),
                rng=replicated(self.mesh),
            )
            self.engine.state = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s),
                self.engine.state,
                state_shardings,
                is_leaf=lambda x: hasattr(x, "shape") or isinstance(x, NamedSharding),
            )
        else:
            self.engine.state = jax.device_put(self.engine.state, replicated(self.mesh))
        return self

    def _get_update(self, update_ema: bool, has_wrt: bool, cond_is_none: bool):
        key = (update_ema, has_wrt, cond_is_none)
        if key not in self._fn_cache:
            raw = self.engine._make_update_fn(update_ema, has_wrt)
            bs = batch_sharded(self.mesh, self.axis)
            # state resident shardings are preserved by jit; shard data inputs
            self._fn_cache[key] = jax.jit(
                raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw,
                donate_argnums=0,
                in_shardings=(None, bs, None if cond_is_none else bs, None),
            )
        return self._fn_cache[key]

    def update(self, x0, condition=None, update_ema: bool = True, **kwargs):
        self.engine._ensure_init(x0, condition)
        wrt = kwargs.get("weighted_regression_tensor", None)
        fn = self._get_update(update_ema, wrt is not None, condition is None)
        x0 = shard_batch(self.mesh, x0, self.axis)
        if condition is not None:
            condition = shard_batch(self.mesh, condition, self.axis)
        self.engine.state, log = fn(self.engine.state, x0, condition, wrt)
        # return DEVICE scalars: a float() here would force one ~30ms host
        # sync per step through the tunnel (see runner.train_loop, which
        # accumulates on device and fetches once per log window)
        return log
