"""Chi Transformer (Diffusion Policy transformer backbone, flax.linen).

TPU-native re-implementation of reference
cleandiffuser/nn_diffusion/chitransformer.py:61-158: a pre-norm
TransformerDecoder over action tokens with a causal target mask and the
t>=s-1 memory mask; encoder over [t_emb; obs tokens]. Masks are built from
static (Ta, To) at trace time and folded into the compiled attention.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..utils.embeddings import mish
from .base import BaseNNDiffusion, timestep_embedding_module

__all__ = ["ChiTransformer"]

normal02 = nn.initializers.normal(stddev=0.02)


class _PreNormEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm()(x)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            kernel_init=normal02,
        )(h, h)
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.d_model, kernel_init=normal02)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, kernel_init=normal02)(h)
        return x + h


class _PreNormDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, memory_mask=None, train: bool = False):
        h = nn.LayerNorm()(x)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            kernel_init=normal02,
        )(h, h, mask=tgt_mask)
        h = nn.LayerNorm()(x)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            kernel_init=normal02,
        )(h, memory, mask=memory_mask)
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.d_model, kernel_init=normal02)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, kernel_init=normal02)(h)
        return x + h


class ChiTransformer(BaseNNDiffusion):
    """(b, Ta, act_dim) x (b, To, obs_dim) -> (b, Ta, act_dim)."""

    act_dim: int
    obs_dim: int
    Ta: int
    To: int
    d_model: int = 256
    nhead: int = 4
    num_layers: int = 8
    p_drop_emb: float = 0.0
    p_drop_attn: float = 0.3
    n_cond_layers: int = 0
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        if emb is None:
            emb = jnp.zeros((x.shape[0], self.To, self.obs_dim), x.dtype)

        te = timestep_embedding_module(self.d_model, self.timestep_emb_type, self.timestep_emb_params)(t)
        te = te[:, None, :]  # (b, 1, d_model)

        act_emb = nn.Dense(self.d_model, kernel_init=normal02)(x)
        obs_emb = nn.Dense(self.d_model, kernel_init=normal02)(emb)

        pos_emb = self.param("pos_emb", normal02, (1, self.Ta, self.d_model))
        cond_pos_emb = self.param("cond_pos_emb", normal02, (1, 1 + self.To, self.d_model))

        cond = jnp.concatenate([te, obs_emb], axis=1)  # (b, 1+To, d_model)
        memory = nn.Dropout(self.p_drop_emb, deterministic=not train)(
            cond + cond_pos_emb[:, : cond.shape[1], :]
        )
        if self.n_cond_layers > 0:
            for _ in range(self.n_cond_layers):
                memory = _PreNormEncoderLayer(self.d_model, self.nhead, self.p_drop_attn)(
                    memory, train=train
                )
        else:
            memory = nn.Dense(4 * self.d_model, kernel_init=normal02)(memory)
            memory = mish(memory)
            memory = nn.Dense(self.d_model, kernel_init=normal02)(memory)

        h = nn.Dropout(self.p_drop_emb, deterministic=not train)(
            act_emb + pos_emb[:, : act_emb.shape[1], :]
        )

        # causal target mask (Ta, Ta) and memory mask t >= s - 1 (Ta, 1+To)
        Ta = x.shape[1]
        tgt_mask = jnp.tril(jnp.ones((Ta, Ta), bool))[None, None]
        ti = jnp.arange(Ta)[:, None]
        si = jnp.arange(self.To + 1)[None, :]
        memory_mask = (ti >= (si - 1))[None, None]

        for _ in range(self.num_layers):
            h = _PreNormDecoderLayer(self.d_model, self.nhead, self.p_drop_attn)(
                h, memory, tgt_mask=tgt_mask, memory_mask=memory_mask, train=train
            )

        h = nn.LayerNorm()(h)
        return nn.Dense(self.act_dim, kernel_init=normal02)(h)
