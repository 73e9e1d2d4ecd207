"""MLP-family diffusion backbones (flax.linen).

TPU-native re-implementations of:
  - MlpNNDiffusion (reference cleandiffuser/nn_diffusion/mlps.py:10)
  - DQLMlp (reference cleandiffuser/nn_diffusion/dqlmlp.py:10)
  - IDQLMlp / NewIDQLMlp (reference cleandiffuser/nn_diffusion/idqlmlp.py:23,69)
  - DVInvMlp (reference cleandiffuser/nn_diffusion/dvinvmlp.py:9)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..utils.blocks import Mlp
from ..utils.embeddings import mish
from .base import BaseNNDiffusion, timestep_embedding_module

__all__ = ["MlpNNDiffusion", "DQLMlp", "IDQLMlp", "NewIDQLMlp", "DVInvMlp"]


class MlpNNDiffusion(BaseNNDiffusion):
    """Generic MLP over flat vectors; used by SynthER."""

    x_dim: int
    emb_dim: int = 16
    hidden_dims: Sequence[int] = (256, 256)
    activation: Callable = nn.relu
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        if emb is not None:
            te = te + emb
        h = jnp.concatenate([x, te], axis=-1)
        return Mlp(self.hidden_dims, self.x_dim, self.activation)(h)


class _TimeMlp(nn.Module):
    """emb -> Dense(2*emb) -> Mish -> Dense(emb)."""

    emb_dim: int

    @nn.compact
    def __call__(self, e):
        e = nn.Dense(self.emb_dim * 2)(e)
        e = mish(e)
        return nn.Dense(self.emb_dim)(e)


class DQLMlp(BaseNNDiffusion):
    """(b, act) x (b, obs) -> (b, act); 3x256 Mish trunk."""

    obs_dim: int
    act_dim: int
    emb_dim: int = 16
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        if emb is None:
            emb = jnp.zeros((x.shape[0], self.obs_dim), x.dtype)
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        te = _TimeMlp(self.emb_dim)(te)
        h = jnp.concatenate([x, te, emb], axis=-1)
        for _ in range(3):
            h = mish(nn.Dense(256)(h))
        return nn.Dense(self.act_dim)(h)


class _LNResBlock(nn.Module):
    """dropout -> LN -> Dense(4h) -> Mish -> Dense(h), residual
    (reference idqlmlp.py:10-20)."""

    hidden_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dropout(self.dropout, deterministic=not train)(x)
        h = nn.LayerNorm()(h)
        h = mish(nn.Dense(self.hidden_dim * 4)(h))
        h = nn.Dense(self.hidden_dim)(h)
        return x + h


class IDQLMlp(BaseNNDiffusion):
    obs_dim: int
    act_dim: int
    emb_dim: int = 64
    hidden_dim: int = 256
    n_blocks: int = 3
    dropout: float = 0.1
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None
    final_mish: bool = False  # True => NewIDQLMlp variant

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        if emb is None:
            emb = jnp.zeros((x.shape[0], self.obs_dim), x.dtype)
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        te = _TimeMlp(self.emb_dim)(te)
        h = jnp.concatenate([x, te, emb], axis=-1)
        h = nn.Dense(self.hidden_dim)(h)
        for _ in range(self.n_blocks):
            h = _LNResBlock(self.hidden_dim, self.dropout)(h, train=train)
        if self.final_mish:
            h = mish(h)
        return nn.Dense(self.act_dim)(h)


def NewIDQLMlp(**kwargs):
    return IDQLMlp(final_mish=True, **kwargs)


class DVInvMlp(BaseNNDiffusion):
    """Diffusion-Veteran inverse-dynamics diffusion policy conditioned on
    (s, s')."""

    obs_dim: int
    act_dim: int
    emb_dim: int = 16
    hidden_dim: int = 256
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        assert emb is not None, "DVInvMlp requires (s, s') condition"
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        te = _TimeMlp(self.emb_dim)(te)
        h = jnp.concatenate([x, te, emb], axis=-1)
        for _ in range(3):
            h = mish(nn.Dense(self.hidden_dim)(h))
        return nn.Dense(self.act_dim)(h)
