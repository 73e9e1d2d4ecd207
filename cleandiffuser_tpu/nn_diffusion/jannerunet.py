"""Janner U-Net 1d (flax.linen, channels-last).

TPU-native re-implementation of reference
cleandiffuser/nn_diffusion/jannerunet.py:98-201. The reference permutes to
channels-first for torch Conv1d; here everything stays (b, horizon, dim) —
the layout XLA wants on TPU (horizon on sublanes, features on lanes), so no
transposes appear in the compiled program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils.embeddings import mish
from .base import BaseNNDiffusion, timestep_embedding_module

__all__ = ["JannerUNet1d", "ResidualBlock1d", "LinearAttention", "Downsample1d", "Upsample1d"]


def get_norm(dim: int, norm_type: str):
    if norm_type == "groupnorm":
        return nn.GroupNorm(num_groups=min(8, dim // 4))
    if norm_type == "layernorm":
        return nn.LayerNorm()
    return lambda x: x


class Downsample1d(nn.Module):
    """Stride-2 conv halving the horizon (reference jannerunet.py:21)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3,), strides=(2,), padding=((1, 1),))(x)


class Upsample1d(nn.Module):
    """Transposed conv doubling the horizon (reference jannerunet.py:30)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose1d(dim, dim, 4, 2, 1): L -> 2L
        return nn.ConvTranspose(self.dim, (4,), strides=(2,), padding="SAME")(x)


class ResidualBlock1d(nn.Module):
    """Conv-GN-Mish x2 with FiLM-add of the time/cond embedding
    (reference jannerunet.py:52-69)."""

    out_dim: int
    emb_dim: int
    kernel_size: int = 3
    norm_type: str = "groupnorm"

    @nn.compact
    def __call__(self, x, emb):
        in_dim = x.shape[-1]
        h = nn.Conv(self.out_dim, (self.kernel_size,), padding="SAME")(x)
        h = get_norm(self.out_dim, self.norm_type)(h)
        h = mish(h)
        e = nn.Dense(self.out_dim)(mish(emb))
        h = h + e[:, None, :]
        h = nn.Conv(self.out_dim, (self.kernel_size,), padding="SAME")(h)
        h = get_norm(self.out_dim, self.norm_type)(h)
        h = mish(h)
        res = nn.Conv(self.out_dim, (1,))(x) if in_dim != self.out_dim else x
        return h + res


class LinearAttention(nn.Module):
    """Linear attention over the horizon axis (reference jannerunet.py:72-95)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        h = nn.LayerNorm()(x)
        qkv = nn.Dense(self.dim_head * self.heads * 3, use_bias=False)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, l, self.heads, self.dim_head)

        q, k, v = heads(q) * (self.dim_head**-0.5), heads(k), heads(v)
        k = nn.softmax(k, axis=1)  # over horizon
        context = jnp.einsum("blhd,blhe->bhde", k, v)
        out = jnp.einsum("bhde,blhd->blhe", context, q)
        out = out.reshape(b, l, self.heads * self.dim_head)
        out = nn.Dense(self.dim)(out)
        return out + x


class JannerUNet1d(BaseNNDiffusion):
    """(b, H, in_dim) -> (b, H, in_dim); H must be a power of 2
    (assert, reference jannerunet.py:167)."""

    in_dim: int
    model_dim: int = 32
    emb_dim: int = 32
    kernel_size: int = 3
    dim_mult: Sequence[int] = (1, 2, 2, 2)
    norm_type: str = "groupnorm"
    attention: bool = False
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        assert x.shape[1] & (x.shape[1] - 1) == 0, "Horizon dimension must be 2^n"

        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        if emb is not None:
            te = te + emb
        te = nn.Dense(self.model_dim * 4)(te)
        te = mish(te)
        te = nn.Dense(self.model_dim)(te)

        dims = [self.in_dim] + [self.model_dim * int(m) for m in np.cumprod(self.dim_mult)]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        h_stack = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResidualBlock1d(dim_out, self.model_dim, self.kernel_size, self.norm_type)(x, te)
            x = ResidualBlock1d(dim_out, self.model_dim, self.kernel_size, self.norm_type)(x, te)
            if self.attention:
                x = LinearAttention(dim_out)(x)
            h_stack.append(x)
            if not is_last:
                x = Downsample1d(dim_out)(x)

        mid_dim = dims[-1]
        x = ResidualBlock1d(mid_dim, self.model_dim, self.kernel_size, self.norm_type)(x, te)
        if self.attention:
            x = LinearAttention(mid_dim)(x)
        x = ResidualBlock1d(mid_dim, self.model_dim, self.kernel_size, self.norm_type)(x, te)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= n_res - 1
            x = jnp.concatenate([x, h_stack.pop()], axis=-1)
            x = ResidualBlock1d(dim_in, self.model_dim, self.kernel_size, self.norm_type)(x, te)
            x = ResidualBlock1d(dim_in, self.model_dim, self.kernel_size, self.norm_type)(x, te)
            if self.attention:
                x = LinearAttention(dim_in)(x)
            if not is_last:
                x = Upsample1d(dim_in)(x)

        x = nn.Conv(self.model_dim, (5,), padding="SAME")(x)
        x = get_norm(self.model_dim, self.norm_type)(x)
        x = mish(x)
        x = nn.Conv(self.in_dim, (1,))(x)
        return x
