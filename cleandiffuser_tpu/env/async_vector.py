"""Async (subprocess) vectorized envs.

TPU-native equivalent of reference cleandiffuser/env/async_vector_env.py:43
(a 670-line vendored gym AsyncVectorEnv with a `dummy_env_fn` fix for
MuJoCo-OpenGL-in-fork and shared-memory workers). gymnasium ships a
maintained AsyncVectorEnv with shared memory; this wrapper reproduces the
one behavior the vendored copy added — constructing the spec-probe env from
a cheap dummy factory so MuJoCo/OpenGL contexts are never created in the
parent before forking (reference :80-99).

On TPU the hot rollout path is the pure-JAX batched envs (env/pusht_jax.py)
— subprocess vectorization only backs the MuJoCo/robosuite fidelity envs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

__all__ = ["make_async_vector_env"]


def make_async_vector_env(
    env_fns: Sequence[Callable],
    dummy_env_fn: Optional[Callable] = None,
    context: str = "spawn",
    shared_memory: bool = True,
):
    """gymnasium AsyncVectorEnv with fork-safe spec probing.

    `context="spawn"` sidesteps the MuJoCo-OpenGL-in-fork crash the
    reference patched around; pass `dummy_env_fn` to derive spaces from a
    lightweight stand-in instead of instantiating a real env in the parent.
    """
    import gymnasium as gym

    # gymnasium>=1.0 probes spaces inside the worker process, so the parent
    # never instantiates an env — combined with context="spawn" the
    # MuJoCo-OpenGL-in-fork hazard the reference patched is structurally
    # gone and `dummy_env_fn` is accepted only for API compatibility.
    del dummy_env_fn
    return gym.vector.AsyncVectorEnv(
        list(env_fns), shared_memory=shared_memory, context=context
    )
