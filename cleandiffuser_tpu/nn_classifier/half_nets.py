"""Trajectory classifier heads: half U-Net and half DiT (flax.linen).

TPU-native re-implementation of reference
cleandiffuser/nn_classifier/half_jannerunet.py:11-137 and half_dit.py:10-76.
Both map (b, H, in_dim) x (b,) [x cond] -> (b, out_dim) scalars for
classifier guidance (e.g. trajectory-return prediction).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn_diffusion.base import timestep_embedding_module
from ..nn_diffusion.dit import DiTBlock, FinalLayer1d, normal02
from ..nn_diffusion.jannerunet import Downsample1d, ResidualBlock1d
from ..utils.blocks import xavier_uniform_init
from ..utils.embeddings import mish, sinusoidal_features
from .mlp import BaseNNClassifier

__all__ = ["HalfJannerUNet1d", "HalfDiT1d"]


class HalfJannerUNet1d(BaseNNClassifier):
    """Down-half of JannerUNet + MLP head -> (b, out_dim)."""

    horizon: int
    in_dim: int
    out_dim: int = 1
    kernel_size: int = 3
    model_dim: int = 32
    emb_dim: int = 32
    dim_mult: Sequence[int] = (1, 2, 2, 2)
    timestep_emb_type: str = "positional"
    norm_type: str = "groupnorm"

    @nn.compact
    def __call__(self, x, t, y=None):
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type)(t)
        if y is not None:
            te = te + y
        te = nn.Dense(self.model_dim * 4)(te)
        te = mish(te)
        te = nn.Dense(self.model_dim)(te)

        dims = [self.in_dim] + [self.model_dim * int(m) for m in np.cumprod(self.dim_mult)]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        horizon = self.horizon
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResidualBlock1d(dim_out, self.model_dim, self.kernel_size, self.norm_type)(x, te)
            x = ResidualBlock1d(dim_out, self.model_dim, self.kernel_size, self.norm_type)(x, te)
            if not is_last:
                x = Downsample1d(dim_out)(x)
                horizon //= 2

        mid_dim = dims[-1]
        mid_dim_2, mid_dim_3 = mid_dim // 2, mid_dim // 4
        x = ResidualBlock1d(mid_dim_2, self.model_dim, 5, self.norm_type)(x, te)
        x = Downsample1d(mid_dim_2)(x)
        horizon //= 2
        x = ResidualBlock1d(mid_dim_3, self.model_dim, 5, self.norm_type)(x, te)
        x = Downsample1d(mid_dim_3)(x)
        horizon //= 2

        x = x.reshape(x.shape[0], -1)
        h = jnp.concatenate([x, te], axis=-1)
        fc_dim = mid_dim_3 * max(horizon, 1)
        h = nn.Dense(fc_dim // 2)(h)
        h = mish(h)
        return nn.Dense(self.out_dim)(h)


class HalfDiT1d(BaseNNClassifier):
    """DiT trunk -> mean-pool -> projection head -> (b, out_dim)."""

    in_dim: int
    out_dim: int
    emb_dim: int
    d_model: int = 384
    n_heads: int = 6
    depth: int = 12
    dropout: float = 0.0
    timestep_emb_type: str = "positional"

    @nn.compact
    def __call__(self, x, t, y=None):
        pos = sinusoidal_features(jnp.arange(x.shape[1]), self.d_model)
        x = nn.Dense(self.d_model, kernel_init=xavier_uniform_init)(x) + pos[None]
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type)(t)
        if y is not None:
            te = te + y
        te = nn.Dense(self.d_model, kernel_init=normal02)(te)
        te = mish(te)
        te = nn.Dense(self.d_model, kernel_init=normal02)(te)
        te = mish(te)
        for _ in range(self.depth):
            x = DiTBlock(self.d_model, self.n_heads, self.dropout)(x, te)
        x = FinalLayer1d(self.d_model, self.d_model // 2)(x, te)
        feat = x.mean(axis=1)
        h = nn.LayerNorm()(feat)
        h = nn.silu(h)
        h = nn.Dense(self.d_model // 4)(h)
        h = nn.LayerNorm()(h)
        h = nn.silu(h)
        return nn.Dense(self.out_dim)(h)
