"""Timestep embeddings (flax.linen).

TPU-native re-implementation of the timestep-embedding registry in the
reference CleanDiffuser (reference: cleandiffuser/utils/utils.py:248-336).
All embeddings accept a (b,) or (...,) timestep array and return
(..., dim) features.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "PositionalEmbedding",
    "UntrainablePositionalEmbedding",
    "SinusoidalEmbedding",
    "FourierEmbedding",
    "UntrainableFourierEmbedding",
    "SUPPORTED_TIMESTEP_EMBEDDING",
    "get_timestep_embedding",
]


def positional_features(
    x: jnp.ndarray, dim: int, max_positions: int = 10000, endpoint: bool = False
) -> jnp.ndarray:
    """DDPM++/ADM positional features: [cos | sin] over geometric freqs.

    Matches reference utils/utils.py:248-263 (PositionalEmbedding.forward).
    """
    freqs = jnp.arange(dim // 2, dtype=jnp.float32)
    freqs = freqs / (dim // 2 - (1 if endpoint else 0))
    freqs = (1 / max_positions) ** freqs
    ang = x[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def sinusoidal_features(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Transformer sinusoidal features: [sin | cos].

    Matches reference utils/utils.py:286-299 (SinusoidalEmbedding.forward).
    """
    half_dim = dim // 2
    scale = math.log(10000) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    ang = x[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class PositionalEmbedding(nn.Module):
    """Untrained positional embedding (parameter-free module)."""

    dim: int
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, x):
        return positional_features(x, self.dim, self.max_positions, self.endpoint)


# In the reference "untrainable_positional" shares the same math as
# "positional"; both are parameter-free here.
UntrainablePositionalEmbedding = PositionalEmbedding


class SinusoidalEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return sinusoidal_features(x, self.dim)


class FourierEmbedding(nn.Module):
    """Random-Fourier embedding followed by a 2-layer Mish MLP.

    Matches reference utils/utils.py:304-316: frozen freqs ~ N(0, scale^2)
    of size dim//8, features of size dim//4, MLP dim//4 -> dim -> dim.
    """

    dim: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs",
            lambda key: jax.random.normal(key, (self.dim // 8,)) * self.scale,
        )
        freqs = jax.lax.stop_gradient(freqs)
        ang = x[..., None].astype(jnp.float32) * (2 * jnp.pi * freqs)
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        emb = nn.Dense(self.dim)(emb)
        emb = mish(emb)
        return nn.Dense(self.dim)(emb)


class UntrainableFourierEmbedding(nn.Module):
    """Frozen random-Fourier features (reference utils/utils.py:319-328)."""

    dim: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs",
            lambda key: jax.random.normal(key, (self.dim // 2,)) * self.scale,
        )
        freqs = jax.lax.stop_gradient(freqs)
        ang = x[..., None].astype(jnp.float32) * (2 * jnp.pi * freqs)
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def mish(x):
    """Mish activation: x * tanh(softplus(x))."""
    return x * jnp.tanh(jax.nn.softplus(x))


SUPPORTED_TIMESTEP_EMBEDDING = {
    "positional": PositionalEmbedding,
    "fourier": FourierEmbedding,
    "untrainable_fourier": UntrainableFourierEmbedding,
    "untrainable_positional": UntrainablePositionalEmbedding,
}


def get_timestep_embedding(kind: str, dim: int, params: Optional[dict] = None) -> nn.Module:
    return SUPPORTED_TIMESTEP_EMBEDDING[kind](dim=dim, **(params or {}))
