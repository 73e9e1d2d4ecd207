"""Multi-chip sharded sampling.

The eval hot path of every RL pipeline is candidate sampling:
(num_envs * num_candidates) denoise chains (SURVEY.md §2.10 'batched
candidate search'). On a mesh this batch shards over "dp" — each chip
denoises its slice; the candidate-selection reduction (argmax/softmax over
K) happens on the sharded axis, with XLA inserting the all-gather only for
the tiny per-env winner indices.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharded, replicated

__all__ = ["shard_sample_fn"]


def shard_sample_fn(sample_fn, mesh: Mesh, axis: str = "dp"):
    """Wrap a pure engine sample fn for batch-sharded execution.

    The returned fn has the same signature; `prior` and any batched
    condition arrays must have leading dim divisible by mesh.shape[axis].
    Params stay replicated; XLA partitions the whole scan program.
    """
    bs = batch_sharded(mesh, axis)
    rep = replicated(mesh)

    def place(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, tree
        )

    jitted = jax.jit(sample_fn)

    def fn(params, cls_params, rng, prior, condition_cfg=None, **kwargs):
        params = place(params, rep)
        prior = jax.device_put(prior, bs)
        if condition_cfg is not None:
            condition_cfg = place(condition_cfg, bs)
        return jitted(params, cls_params, rng, prior, condition_cfg=condition_cfg, **kwargs)

    return fn
