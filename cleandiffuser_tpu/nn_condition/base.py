"""Condition encoders (flax.linen) — CFG condition-dropout lives here.

TPU-native re-implementation of reference
cleandiffuser/nn_condition/base_nn_condition.py and nn_condition/mlp.py /
positional.py / pearce_obs_condition.py. Contract:

    emb = module.apply(params, condition, mask=None, train=False,
                       rngs={"dropout": key} if train)

- During training, each batch element's embedding is zeroed with probability
  `dropout` (Bernoulli keep-mask) — this is the classifier-free-guidance
  mechanism (reference base_nn_condition.py:7-12).
- At sampling time (train=False) the mask defaults to all-ones, or the
  caller-passed `mask`.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.embeddings import mish, positional_features
from ..utils.tensors import at_least_ndim

__all__ = [
    "BaseNNCondition",
    "IdentityCondition",
    "LinearCondition",
    "MLPCondition",
    "MLPSieveObsCondition",
    "FourierCondition",
    "PositionalCondition",
    "PearceObsCondition",
]


class BaseNNCondition(nn.Module):
    """Subclasses implement __call__(condition, mask=None, train=False)."""

    def get_mask(self, batch: int, mask, train: bool, dropout: float):
        if train:
            key = self.make_rng("dropout")
            return (jax.random.uniform(key, (batch,)) > dropout).astype(jnp.float32)
        return 1.0 if mask is None else mask


class IdentityCondition(BaseNNCondition):
    """Pass-through with condition dropout (reference base_nn_condition.py:38)."""

    dropout: float = 0.25

    @nn.compact
    def __call__(self, condition, mask=None, train: bool = False):
        m = self.get_mask(condition.shape[0], mask, train, self.dropout)
        return condition * at_least_ndim(jnp.asarray(m), condition.ndim)


class LinearCondition(BaseNNCondition):
    """Affine projection with condition dropout (reference nn_condition/mlp.py:11)."""

    in_dim: int
    out_dim: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, condition, mask=None, train: bool = False):
        m = self.get_mask(condition.shape[0], mask, train, self.dropout)
        out = nn.Dense(self.out_dim)(condition)
        return out * at_least_ndim(jnp.asarray(m), out.ndim)


class MLPCondition(BaseNNCondition):
    """MLP projection with condition dropout (reference nn_condition/mlp.py:43)."""

    in_dim: int
    out_dim: int
    hidden_dims: Sequence[int] = (256,)
    act: Callable = nn.leaky_relu
    dropout: float = 0.25

    @nn.compact
    def __call__(self, condition, mask=None, train: bool = False):
        m = self.get_mask(condition.shape[0], mask, train, self.dropout)
        h = condition
        hidden = (self.hidden_dims,) if isinstance(self.hidden_dims, int) else self.hidden_dims
        for hd in hidden:
            h = self.act(nn.Dense(hd)(h))
        h = nn.Dense(self.out_dim)(h)
        return h * at_least_ndim(jnp.asarray(m), h.ndim)


class MLPSieveObsCondition(BaseNNCondition):
    """Per-frame MLP then flatten (b,To,obs)->(b,To*emb)
    (reference nn_condition/mlp.py:85)."""

    o_dim: int
    emb_dim: int = 128
    hidden_dim: int = 512
    dropout: float = 0.25

    @nn.compact
    def __call__(self, obs, mask=None, train: bool = False):
        m = self.get_mask(obs.shape[0], mask, train, self.dropout)
        h = nn.leaky_relu(nn.Dense(self.hidden_dim)(obs))
        h = nn.Dense(self.emb_dim)(h)
        h = h.reshape(h.shape[0], -1)
        return h * at_least_ndim(jnp.asarray(m), 2)


class FourierCondition(BaseNNCondition):
    """Scalar condition -> frozen Fourier features -> Mish MLP
    (reference nn_condition/positional.py:8)."""

    out_dim: int
    hidden_dim: int
    scale: float = 16.0
    dropout: float = 0.25

    @nn.compact
    def __call__(self, condition, mask=None, train: bool = False):
        freqs = self.param(
            "freqs", lambda key: jax.random.normal(key, (self.hidden_dim // 2,)) * self.scale
        )
        freqs = jax.lax.stop_gradient(freqs)
        ang = condition.squeeze(-1)[..., None] * (2 * jnp.pi * freqs)
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        m = self.get_mask(condition.shape[0], mask, train, self.dropout)
        h = mish(nn.Dense(self.hidden_dim)(emb))
        h = nn.Dense(self.out_dim)(h)
        return h * at_least_ndim(jnp.asarray(m), h.ndim)


class PositionalCondition(BaseNNCondition):
    """Scalar condition -> positional features -> Mish MLP
    (reference nn_condition/positional.py:31)."""

    out_dim: int
    hidden_dim: int
    dropout: float = 0.25
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, condition, mask=None, train: bool = False):
        feats = positional_features(
            condition.squeeze(-1), self.out_dim, self.max_positions, self.endpoint
        )
        m = self.get_mask(condition.shape[0], mask, train, self.dropout)
        h = mish(nn.Dense(self.hidden_dim)(feats))
        h = nn.Dense(self.out_dim)(h)
        return h * at_least_ndim(jnp.asarray(m), h.ndim)


class PearceObsCondition(BaseNNCondition):
    """Per-frame obs MLP, optional flatten
    (reference nn_condition/pearce_obs_condition.py:10)."""

    obs_dim: int
    emb_dim: int = 128
    flatten: bool = False
    dropout: float = 0.25

    @nn.compact
    def __call__(self, obs, mask=None, train: bool = False):
        m = self.get_mask(obs.shape[0], mask, train, self.dropout)
        h = nn.Dense(self.emb_dim)(obs)
        h = nn.leaky_relu(h)
        h = nn.Dense(self.emb_dim)(h)
        if self.flatten:
            h = h.reshape(h.shape[0], -1)
        return h * at_least_ndim(jnp.asarray(m), 2 if self.flatten else 3)
