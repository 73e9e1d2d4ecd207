"""Functional training-state harness.

This replaces the reference's stateful PyTorch harness
(cleandiffuser/diffusion/basic.py:14-103: nn.ModuleDict + deepcopy EMA twin +
AdamW + per-step lerp) with a single immutable PyTree. One jitted train step
fuses loss, gradient, optimizer update, and EMA lerp into one XLA program —
the EMA update is a free elementwise pass over HBM on TPU instead of a
separate kernel launch per parameter.

The state also carries the optimizer state and PRNG key so checkpoints are
fully resumable (improvement over the reference, which drops optimizer state
on save; SURVEY.md §5.4).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["TrainState", "make_optimizer", "ema_update", "save_state", "load_state"]


@flax.struct.dataclass
class TrainState:
    """Immutable training state: params + EMA twin + optimizer + PRNG."""

    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    rng: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng: jax.Array) -> "TrainState":
        return cls(
            params=params,
            # real copies: EMA must not alias params (breaks buffer donation)
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )


def make_optimizer(
    lr: float = 2e-4,
    weight_decay: float = 1e-5,
    grad_clip_norm: Optional[float] = None,
    **kwargs,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping.

    Defaults match the reference (basic.py:43-44: lr=2e-4, weight_decay=1e-5;
    clipping at diffusionsde.py:131).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adamw(learning_rate=lr, weight_decay=weight_decay, **kwargs))
    return optax.chain(*chain)


def ema_update(params, ema_params, ema_rate: float):
    """ema <- ema_rate * ema + (1 - ema_rate) * params (basic.py:83-86)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * ema_rate + p * (1.0 - ema_rate), ema_params, params
    )


def save_state(state: TrainState, path: str, backend: str = "pickle") -> None:
    """Serialize the full state (params, EMA, optimizer, step, rng) to disk.

    backend="orbax" writes an orbax checkpoint directory (async-safe,
    sharding-aware — preferred for multi-chip runs); "pickle" writes a
    single host-numpy file.
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(str(Path(path).resolve()), state, force=True)
        return
    host = jax.tree_util.tree_map(np.asarray, state)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_state_orbax(path: str, like: TrainState) -> TrainState:
    """Restore an orbax checkpoint with `like` as the structure template."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(str(Path(path).resolve()), item=like)


def _convert_param_layout(host, tmpl):
    """Walk host/template in parallel (dicts, lists, tuples incl. optax
    namedtuple states) and convert DiTBlock <-> PallasDiTBlock param
    subtrees wherever the dict structures disagree — so checkpoints stay
    portable across the `use_pallas_block` construction flag (params, EMA,
    and Adam moments alike)."""
    from ..nn_diffusion.dit import convert_checkpoint_blocks

    def walk(h, t):
        if isinstance(t, dict) and isinstance(h, dict):
            return convert_checkpoint_blocks(h, t)
        if isinstance(t, tuple) and isinstance(h, tuple) and len(t) == len(h):
            vals = [walk(a, b) for a, b in zip(h, t)]
            return type(h)(*vals) if hasattr(h, "_fields") else tuple(vals)
        if isinstance(t, list) and isinstance(h, list) and len(t) == len(h):
            return [walk(a, b) for a, b in zip(h, t)]
        return h

    return host.replace(
        params=walk(host.params, tmpl.params),
        ema_params=walk(host.ema_params, tmpl.ema_params),
        opt_state=walk(host.opt_state, tmpl.opt_state),
    )


def load_state(path: str, like: Optional[TrainState] = None) -> TrainState:
    """Load a state saved by `save_state`. If `like` is given, restore arrays
    with the same shardings/dtypes as the template state. A structure
    mismatch caused only by the DiT `use_pallas_block` flag is converted
    transparently (exact reshapes — see nn_diffusion/dit.py)."""
    with open(path, "rb") as f:
        host = pickle.load(f)
    if like is None:
        return jax.tree_util.tree_map(jnp.asarray, host)

    def place(tmpl, v):
        return (jax.device_put(jnp.asarray(v, dtype=tmpl.dtype))
                if hasattr(tmpl, "dtype") else v)

    try:
        return jax.tree_util.tree_map(place, like, host)
    except (ValueError, KeyError):
        host = _convert_param_layout(host, like)
        return jax.tree_util.tree_map(place, like, host)
