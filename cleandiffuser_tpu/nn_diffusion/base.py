"""Base contract for diffusion backbones (flax.linen).

TPU-native analogue of reference
cleandiffuser/nn_diffusion/base_nn_diffusion.py:9-43. A backbone maps
(noisy data `x`, timesteps `t`, condition embedding `emb`) -> prediction with
the same shape as `x`. `t` is a (b,) array — discrete int or continuous
float. `emb` is the output of an `nn_condition` module or None.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..utils.embeddings import SUPPORTED_TIMESTEP_EMBEDDING

__all__ = ["BaseNNDiffusion", "timestep_embedding_module"]


def timestep_embedding_module(emb_dim: int, kind: str = "positional", params: Optional[dict] = None):
    assert kind in SUPPORTED_TIMESTEP_EMBEDDING, f"unknown timestep_emb_type {kind}"
    return SUPPORTED_TIMESTEP_EMBEDDING[kind](dim=emb_dim, **(params or {}))


class BaseNNDiffusion(nn.Module):
    """Subclasses define `emb_dim`, `timestep_emb_type` fields and implement
    __call__(x, t, emb=None, train=False)."""

    def map_noise(self, t: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, x, t, emb=None, train: bool = False):
        raise NotImplementedError
