"""Pearce DiffusionBC backbones (flax.linen).

TPU-native re-implementation of reference
cleandiffuser/nn_diffusion/pearcemlp.py:36-79 and
pearcetransformer.py:8-155.

Deviation note: the reference PearceTransformer uses torch BatchNorm1d over
the token axis with running statistics (pearcetransformer.py:38-39). Running
statistics are mutable state that breaks the one-program functional design,
so here BatchNorm normalizes with current-batch statistics in both train and
eval (learned scale/bias kept). DBC evaluates on large candidate batches, so
the estimator difference is negligible.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNNDiffusion, timestep_embedding_module

__all__ = ["PearceMlp", "PearceTransformer"]


class TimeSiren(nn.Module):
    """sin-activated 2-layer embedding (reference pearcetransformer.py:8-18)."""

    emb_dim: int

    @nn.compact
    def __call__(self, x):
        h = jnp.sin(nn.Dense(self.emb_dim, use_bias=False)(x))
        return nn.Dense(self.emb_dim)(h)


class FCBlock(nn.Module):
    """Dense -> GroupNorm -> GELU (reference pearcemlp.py:22-33)."""

    out_feats: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_feats)(x)
        h = nn.GroupNorm(num_groups=min(8, self.out_feats // 4))(h)
        return nn.gelu(h)


class PearceMlp(BaseNNDiffusion):
    """(b, act) x (b, To, emb) -> (b, act); /1.414 residual FC stack."""

    act_dim: int
    To: int = 1
    emb_dim: int = 128
    hidden_dim: int = 512
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        x_e = nn.Dense(self.emb_dim)(x)
        x_e = nn.leaky_relu(x_e)
        x_e = nn.Dense(self.emb_dim)(x_e)
        t_e = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        t_raw = t[:, None].astype(jnp.float32)

        if emb is None:
            emb = jnp.zeros((x.shape[0], self.To, self.emb_dim), x.dtype)
        flat_cond = emb.reshape(emb.shape[0], -1)

        nn1 = FCBlock(self.hidden_dim)(jnp.concatenate([x_e, t_e, flat_cond], axis=-1))
        nn2 = FCBlock(self.hidden_dim)(
            jnp.concatenate([nn1 / 1.414, x, t_raw], axis=-1)
        ) + nn1 / 1.414
        nn3 = FCBlock(self.hidden_dim)(
            jnp.concatenate([nn2 / 1.414, x, t_raw], axis=-1)
        ) + nn2 / 1.414
        return nn.Dense(self.act_dim)(jnp.concatenate([nn3, x, t_raw], axis=-1))


class _TokenBatchNorm(nn.Module):
    """BatchNorm over (batch, tokens) per feature, batch-stats only."""

    feats: int

    @nn.compact
    def __call__(self, x):
        # x: (b, tokens, feats)
        mean = x.mean(axis=(0, 1), keepdims=True)
        var = x.var(axis=(0, 1), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.feats,))
        bias = self.param("bias", nn.initializers.zeros, (self.feats,))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class _PearceEncoderBlock(nn.Module):
    """Custom transformer block with /1.414 residuals + token BatchNorm
    (reference pearcetransformer.py:21-79)."""

    trans_emb_dim: int
    transformer_dim: int
    nheads: int

    @nn.compact
    def __call__(self, f):
        # f: (b, tokens, trans_emb_dim)
        qkv = nn.Dense(self.transformer_dim * 3)(f)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d_head = self.transformer_dim // self.nheads

        def heads(z):
            return z.reshape(z.shape[0], z.shape[1], self.nheads, d_head)

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bihd,bjhd->bhij", qh, kh) / jnp.sqrt(d_head)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, vh)
        out = out.reshape(out.shape[0], out.shape[1], self.transformer_dim)
        out = nn.Dense(self.transformer_dim)(out)  # MHA out-projection

        h = nn.Dense(self.trans_emb_dim)(out)
        h = h / 1.414 + f / 1.414
        h = _TokenBatchNorm(self.trans_emb_dim)(h)
        h2 = nn.Dense(self.trans_emb_dim * 4)(h)
        h2 = nn.gelu(h2)
        h2 = nn.Dense(self.trans_emb_dim)(h2)
        h = h2 / 1.414 + h / 1.414
        return _TokenBatchNorm(self.trans_emb_dim)(h)


class PearceTransformer(BaseNNDiffusion):
    """(b, act) x (b, To, emb) -> (b, act); tokens = [act, t, cond frames]."""

    act_dim: int
    To: int = 1
    emb_dim: int = 128
    trans_emb_dim: int = 64
    nhead: int = 16
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        if emb is None:
            emb = jnp.zeros((x.shape[0], self.To, self.emb_dim), x.dtype)

        x_e = nn.Dense(self.emb_dim)(x)
        x_e = nn.leaky_relu(x_e)
        x_e = nn.Dense(self.emb_dim)(x_e)
        t_e = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)

        x_in = nn.Dense(self.trans_emb_dim)(x_e)
        t_in = nn.Dense(self.trans_emb_dim)(t_e)
        c_in = nn.Dense(self.trans_emb_dim)(emb)

        pos = TimeSiren(self.trans_emb_dim)
        x_in = x_in + pos(jnp.ones((1, 1)))
        t_in = t_in + pos(jnp.ones((1, 1)) * 2.0)
        c_in = c_in + pos(jnp.arange(3, 3 + self.To, dtype=jnp.float32)[None, :, None])

        f = jnp.concatenate([x_in[:, None, :], t_in[:, None, :], c_in], axis=1)
        transformer_dim = self.trans_emb_dim * self.nhead
        for _ in range(4):
            f = _PearceEncoderBlock(self.trans_emb_dim, transformer_dim, self.nhead)(f)

        flat = f.reshape(f.shape[0], -1)
        return nn.Dense(self.act_dim)(flat)
