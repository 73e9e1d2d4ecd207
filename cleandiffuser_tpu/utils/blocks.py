"""Shared NN building blocks (flax.linen).

TPU-native re-implementation of reference
cleandiffuser/utils/building_blocks.py. Everything works channels-last
((b, horizon, dim)) so sequences map directly onto TPU (8,128) vector lanes
and convs/matmuls hit the MXU without layout transposes.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .embeddings import mish, sinusoidal_features

__all__ = [
    "Mlp",
    "SoftLowerBound",
    "SoftUpperBound",
    "DQLCritic",
    "TwinQ",
    "V",
    "IDQLQNet",
    "IDQLVNet",
    "FeedForward",
    "MultiHeadAttention",
    "Transformer",
    "DVTransformerBlock",
    "DVHorizonCritic",
    "generate_causal_mask",
    "xavier_uniform_init",
]

xavier_uniform_init = nn.initializers.xavier_uniform()


class Mlp(nn.Module):
    """Plain MLP (reference building_blocks.py:13-57).

    `activation` applies after every hidden Dense; `out_activation` after the
    final Dense.
    """

    hidden_dims: Sequence[int]
    out_dim: int
    activation: Callable = nn.relu
    out_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for h in self.hidden_dims:
            x = self.activation(nn.Dense(h)(x))
        x = nn.Dense(self.out_dim)(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x


class SoftLowerBound(nn.Module):
    """lb + softplus(x - lb) (reference building_blocks.py:79)."""

    lower_bound: float

    def __call__(self, x):
        return self.lower_bound + jax.nn.softplus(x - self.lower_bound)


class SoftUpperBound(nn.Module):
    """ub - softplus(ub - x) (reference building_blocks.py:95)."""

    upper_bound: float

    def __call__(self, x):
        return self.upper_bound - jax.nn.softplus(self.upper_bound - x)


class _QHead(nn.Module):
    """Dense->LN->act x depth -> Dense(1) Q head."""

    hidden_dim: int
    activations: Sequence[Callable]

    @nn.compact
    def __call__(self, x):
        for act in self.activations:
            x = nn.Dense(self.hidden_dim)(x)
            x = nn.LayerNorm()(x)
            x = act(x)
        return nn.Dense(1)(x)


class DQLCritic(nn.Module):
    """Twin-Q critic with LN/Tanh/Mish stack (reference building_blocks.py:111-147)."""

    hidden_dim: int = 256

    def setup(self):
        acts = (jnp.tanh, mish, mish)
        self.q1_model = _QHead(self.hidden_dim, acts)
        self.q2_model = _QHead(self.hidden_dim, acts)

    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return self.q1_model(x), self.q2_model(x)

    def q1(self, obs, act):
        return self.q1_model(jnp.concatenate([obs, act], axis=-1))

    def q_min(self, obs, act):
        q1, q2 = self(obs, act)
        return jnp.minimum(q1, q2)


class TwinQ(nn.Module):
    """IQL twin Q (reference utils/iql.py:7-24)."""

    hidden_dim: int = 256

    def setup(self):
        acts = (mish, mish)
        self.Q1 = _QHead(self.hidden_dim, acts)
        self.Q2 = _QHead(self.hidden_dim, acts)

    def both(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return self.Q1(x), self.Q2(x)

    def __call__(self, obs, act):
        q1, q2 = self.both(obs, act)
        return jnp.minimum(q1, q2)


class V(nn.Module):
    """IQL value net (reference utils/iql.py:27-37)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, obs):
        x = obs
        for _ in range(2):
            x = nn.Dense(self.hidden_dim)(x)
            x = nn.LayerNorm()(x)
            x = mish(x)
        return nn.Dense(1)(x)


IDQLQNet = TwinQ
IDQLVNet = V


class FeedForward(nn.Module):
    """Transformer FFN (reference building_blocks.py:260-273)."""

    d_model: int
    hidden_scale: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(int(self.d_model * self.hidden_scale))(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model)(h)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)


class MultiHeadAttention(nn.Module):
    """MHA with optional (i, j) or (b, i, j) mask
    (reference building_blocks.py:276-324). Mask entries equal to 0 are
    masked out.
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True):
        assert self.d_model % self.nhead == 0
        d_k = self.d_model // self.nhead
        scale = d_k**-0.5

        qh = nn.DenseGeneral((self.nhead, d_k), use_bias=self.bias, name="q_layer")(q)
        kh = nn.DenseGeneral((self.nhead, d_k), use_bias=self.bias, name="k_layer")(k)
        vh = nn.DenseGeneral((self.nhead, d_k), use_bias=True, name="v_layer")(v)

        scores = jnp.einsum("bihd,bjhd->bhij", qh, kh) * scale
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[None, None]
            elif mask.ndim == 3:
                mask = mask[:, None]
            scores = jnp.where(mask == 0, -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bjhd->bihd", attn, vh)
        out = out.reshape(out.shape[:-2] + (self.d_model,))
        return out, jax.lax.stop_gradient(attn)


class Transformer(nn.Module):
    """Pre-norm transformer encoder (reference building_blocks.py:332-373)."""

    d_model: int
    nhead: int
    num_layers: int
    hidden_scale: int = 4
    attn_dropout: float = 0.0
    ffn_dropout: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn_maps = []
        for _ in range(self.num_layers):
            h = nn.LayerNorm()(x)
            h, attn_map = MultiHeadAttention(self.d_model, self.nhead, self.attn_dropout, self.bias)(
                h, h, h, mask=mask, deterministic=deterministic
            )
            attn_maps.append(attn_map)
            x = h + x
            h = nn.LayerNorm()(x)
            x = FeedForward(self.d_model, self.hidden_scale, self.ffn_dropout)(
                h, deterministic=deterministic
            ) + x
        return x, attn_maps


def generate_causal_mask(length: int):
    """Lower-triangular 1/0 mask (reference building_blocks.py:327)."""
    return jnp.tril(jnp.ones((length, length)))


class DVTransformerBlock(nn.Module):
    """Diffusion-Veteran critic block (reference building_blocks.py:149-174)."""

    hidden_size: int
    n_heads: int
    dropout: float = 0.0
    norm_type: str = "post"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.hidden_size,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )
        mlp = nn.Sequential(
            [
                nn.Dense(self.hidden_size * 4),
                lambda h: nn.gelu(h, approximate=True),
                nn.Dense(self.hidden_size),
            ]
        )
        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)
        if self.norm_type == "post":
            x = norm1(x + attn(x, x))
            x = norm2(x + mlp(x))
        elif self.norm_type == "pre":
            x = norm1(x)
            x = x + attn(x, x)
            x = x + mlp(norm2(x))
        else:
            raise NotImplementedError(self.norm_type)
        return x


class DVHorizonCritic(nn.Module):
    """Transformer over trajectory -> scalar value at token 0
    (reference building_blocks.py:176-229)."""

    in_dim: int
    emb_dim: int
    d_model: int = 384
    n_heads: int = 6
    depth: int = 12
    dropout: float = 0.0
    norm_type: str = "post"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pos = sinusoidal_features(jnp.arange(x.shape[1]), self.d_model)
        x = nn.Dense(self.d_model, kernel_init=xavier_uniform_init)(x) + pos[None]
        for _ in range(self.depth):
            x = DVTransformerBlock(self.d_model, self.n_heads, self.dropout, self.norm_type)(
                x, deterministic=deterministic
            )
        x = nn.Dense(1, kernel_init=xavier_uniform_init)(x)
        return x[:, 0, :]
