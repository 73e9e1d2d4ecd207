"""Chi U-Net 1d (Diffusion Policy backbone, flax.linen, channels-last).

TPU-native re-implementation of reference
cleandiffuser/nn_diffusion/chiunet.py:13-193. FiLM conditioning with
optional scale prediction (`cond_predict_scale`), obs either as global
condition (flatten To*obs -> emb, concat with t-emb) or as local condition
injected at the first down / last up stage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils.embeddings import mish
from .base import BaseNNDiffusion, timestep_embedding_module
from .jannerunet import Downsample1d, Upsample1d

__all__ = ["ChiUNet1d", "ChiResidualBlock"]


class ChiResidualBlock(nn.Module):
    """Conv-GN-Mish x2 with FiLM scale+bias conditioning
    (reference chiunet.py:13-45)."""

    out_dim: int
    kernel_size: int = 3
    cond_predict_scale: bool = True

    @nn.compact
    def __call__(self, x, emb):
        in_dim = x.shape[-1]
        h = nn.Conv(self.out_dim, (self.kernel_size,), padding="SAME")(x)
        h = nn.GroupNorm(num_groups=min(8, self.out_dim // 4))(h)
        h = mish(h)
        cond_dim = 2 * self.out_dim if self.cond_predict_scale else self.out_dim
        e = nn.Dense(cond_dim)(mish(emb))
        if self.cond_predict_scale:
            scale, bias = jnp.split(e, 2, axis=-1)
            h = scale[:, None, :] * h + bias[:, None, :]
        else:
            h = h + e[:, None, :]
        h = nn.Conv(self.out_dim, (self.kernel_size,), padding="SAME")(h)
        h = nn.GroupNorm(num_groups=min(8, self.out_dim // 4))(h)
        h = mish(h)
        res = nn.Conv(self.out_dim, (1,))(x) if in_dim != self.out_dim else x
        return h + res


class ChiUNet1d(BaseNNDiffusion):
    """(b, Ta, act_dim) x (b, To, obs_dim) -> (b, Ta, act_dim)."""

    act_dim: int
    obs_dim: int
    To: int
    model_dim: int = 256
    emb_dim: int = 256
    kernel_size: int = 5
    cond_predict_scale: bool = True
    obs_as_global_cond: bool = True
    dim_mult: Sequence[int] = (1, 2, 2)
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        assert x.shape[1] & (x.shape[1] - 1) == 0, "Ta dimension must be 2^n"

        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        te = nn.Dense(self.emb_dim * 4)(te)
        te = mish(te)
        te = nn.Dense(self.emb_dim)(te)

        h_local = None
        if self.obs_as_global_cond:
            if emb is None:
                emb = jnp.zeros((x.shape[0], self.To, self.obs_dim), x.dtype)
            cond = nn.Dense(self.emb_dim)(emb.reshape(emb.shape[0], -1))
            te = jnp.concatenate([te, cond], axis=-1)
        else:
            if emb is None:
                emb = jnp.zeros((x.shape[0], x.shape[1], self.obs_dim), x.dtype)
            assert emb.shape[1] == x.shape[1], "local cond must align with Ta"
            h_local = [
                ChiResidualBlock(self.model_dim, self.kernel_size, self.cond_predict_scale)(emb, te),
                Downsample1d(self.model_dim)(
                    ChiResidualBlock(self.model_dim, self.kernel_size, self.cond_predict_scale)(emb, te)
                ),
            ]

        dims = [self.act_dim] + [self.model_dim * int(m) for m in np.cumprod(self.dim_mult)]
        in_out = list(zip(dims[:-1], dims[1:]))
        mid_dim = dims[-1]
        n_res = len(in_out)

        h_stack = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ChiResidualBlock(dim_out, self.kernel_size, self.cond_predict_scale)(x, te)
            if ind == 0 and h_local is not None:
                x = x + h_local[0]
            x = ChiResidualBlock(dim_out, self.kernel_size, self.cond_predict_scale)(x, te)
            h_stack.append(x)
            if not is_last:
                x = Downsample1d(dim_out)(x)

        x = ChiResidualBlock(mid_dim, self.kernel_size, self.cond_predict_scale)(x, te)
        x = ChiResidualBlock(mid_dim, self.kernel_size, self.cond_predict_scale)(x, te)

        n_ups = len(in_out[1:])
        for ind, (dim_in, _) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, h_stack.pop()], axis=-1)
            x = ChiResidualBlock(dim_in, self.kernel_size, self.cond_predict_scale)(x, te)
            if ind == n_ups - 1 and h_local is not None:
                x = x + h_local[1]
            x = ChiResidualBlock(dim_in, self.kernel_size, self.cond_predict_scale)(x, te)
            x = Upsample1d(dim_in)(x)

        x = nn.Conv(self.model_dim, (self.kernel_size,), padding="SAME")(x)
        x = nn.GroupNorm(num_groups=min(8, self.model_dim // 4))(x)
        x = mish(x)
        x = nn.Conv(self.act_dim, (1,))(x)
        return x
