"""SfBC dense U-Net (flax.linen).

TPU-native re-implementation of reference
cleandiffuser/nn_diffusion/sfbc_unet.py:9-82: dense residual blocks with
SiLU, cond-embedding add, skip concatenation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNNDiffusion, timestep_embedding_module

__all__ = ["SfBCUNet"]


class _DenseResBlock(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x, c):
        h = nn.silu(nn.Dense(self.out_dim)(x))
        h = h + nn.Dense(self.out_dim)(c)
        h = nn.silu(nn.Dense(self.out_dim)(h))
        skip = nn.Dense(self.out_dim)(x) if x.shape[-1] != self.out_dim else x
        return h + skip


class SfBCUNet(BaseNNDiffusion):
    act_dim: int
    emb_dim: int = 64
    hidden_dims: Sequence[int] = (512, 256, 128)
    timestep_emb_type: str = "untrainable_fourier"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        c = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        c = nn.Dense(self.emb_dim)(c)
        c = nn.silu(c)
        c = nn.Dense(self.emb_dim)(c)
        if emb is not None:
            c = c + emb
        # broadcast cond over horizon if x has one
        c_b = c[:, None, :] if x.ndim == 3 else c

        hidden = list(self.hidden_dims)
        buffer = []
        h = x
        for hd in hidden:
            h = _DenseResBlock(hd)(h, c_b)
            buffer.append(h)
        h = _DenseResBlock(hidden[-1])(h, c_b)
        for i in range(len(hidden) - 1):
            h = jnp.concatenate([h, buffer.pop()], axis=-1)
            h = _DenseResBlock(hidden[-2 - i])(h, c_b)
        return nn.Dense(self.act_dim)(h)
