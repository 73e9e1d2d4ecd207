"""DiT1d — adaLN-Zero diffusion transformer (flax.linen).

TPU-native re-implementation of reference
cleandiffuser/nn_diffusion/dit.py:14-180 (DiTBlock, FinalLayer1d, DiT1d,
DiT1Ref). Zero-initialized adaLN modulation and final layer match the
reference init (dit.py:95-104). Positional embedding is computed from the
static horizon at trace time (no host-side cache needed — XLA constant-folds
it).
"""

from __future__ import annotations

import re
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..utils.blocks import xavier_uniform_init
from ..utils.embeddings import mish, sinusoidal_features
from .base import BaseNNDiffusion, timestep_embedding_module

__all__ = ["DiT1d", "DiT1Ref", "DiTBlock", "PallasDiTBlock", "FinalLayer1d",
           "convert_checkpoint_blocks"]

zeros_init = nn.initializers.zeros
normal02 = nn.initializers.normal(stddev=0.02)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class PallasDiTBlock(nn.Module):
    """adaLN-Zero block backed by the fused Pallas kernel (ops/dit_block.py;
    measured 1.95-2.6x vs XLA at planner-eval shapes on TPU v5e). Same math
    as DiTBlock with a flat parameter layout; falls back to the identical
    XLA reference off-TPU or at small shapes, and differentiates through
    the XLA reference (custom VJP) — the kernel serves the sampling path.
    """

    hidden_size: int
    n_heads: int
    dropout: float = 0.0  # accepted for interface parity; sampling-path only

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        from ..ops.dit_block import (
            dit_block_op,
            dit_block_reference,
            use_pallas_dit,
        )
        from ..utils.blocks import xavier_uniform_init as xavier

        D = self.hidden_size
        wmod = self.param("wmod", zeros_init, (D, 6 * D))
        bmod = self.param("bmod", zeros_init, (6 * D,))
        wqkv = self.param("wqkv", xavier, (D, 3 * D))
        bqkv = self.param("bqkv", zeros_init, (3 * D,))
        wo = self.param("wo", xavier, (D, D))
        bo = self.param("bo", zeros_init, (D,))
        w1 = self.param("w1", xavier, (D, 4 * D))
        b1 = self.param("b1", zeros_init, (4 * D,))
        w2 = self.param("w2", xavier, (4 * D, D))
        b2 = self.param("b2", zeros_init, (D,))
        mod = nn.silu(t) @ wmod + bmod
        args = (x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2)
        if use_pallas_dit(x.shape):
            return dit_block_op(*args, self.n_heads)
        return dit_block_reference(*args, n_heads=self.n_heads)


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (reference dit.py:14-36)."""

    hidden_size: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        mod = nn.Dense(self.hidden_size * 6, kernel_init=zeros_init, bias_init=zeros_init)(
            nn.silu(t)
        )
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        h = modulate(nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x), shift_msa, scale_msa)
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.hidden_size,
            dropout_rate=self.dropout,
            deterministic=not train,
            kernel_init=xavier_uniform_init,
        )(h, h)
        # residual from the ORIGINAL x (reference dit.py:33): with the
        # zero-init gate the block is exactly identity at init (adaLN-Zero)
        x = x + gate_msa[:, None, :] * attn_out

        h2 = modulate(nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x), shift_mlp, scale_mlp)
        h2 = nn.Dense(self.hidden_size * 4, kernel_init=xavier_uniform_init)(h2)
        h2 = nn.gelu(h2, approximate=True)
        h2 = nn.Dropout(self.dropout, deterministic=not train)(h2)
        h2 = nn.Dense(self.hidden_size, kernel_init=xavier_uniform_init)(h2)
        x = x + gate_mlp[:, None, :] * h2
        return x


# ---------------------------------------------------------------------------
# Checkpoint-layout conversion: `use_pallas_block` is a pure compute-path
# choice, but DiTBlock parameterizes via nested flax submodules while
# PallasDiTBlock uses the kernel's flat weight list. These converters make
# checkpoints portable across the flag in BOTH directions — the mapping is
# exact (reshapes/concats only; flax MHA stores q/k/v kernels as
# (D, heads, head_dim), head-major, which is precisely the kernel's qkv
# column layout). load_state (utils/train_state.py) applies it on structure
# mismatch, so Adam moments convert identically (elementwise correspondence
# is preserved by concat/reshape).

_TO_PALLAS_RE = re.compile(r"^PallasDiTBlock_(\d+)$")
_TO_NESTED_RE = re.compile(r"^DiTBlock_(\d+)$")


def _flat_from_nested(p):
    """DiTBlock param subtree -> PallasDiTBlock flat subtree (host numpy)."""
    attn = p["MultiHeadDotProductAttention_0"]
    D = np.asarray(p["Dense_0"]["kernel"]).shape[0]
    cat = lambda key, n: np.concatenate(
        [np.asarray(attn[nm][key]).reshape((D, D) if key == "kernel" else (D,))
         for nm in ("query", "key", "value")], axis=-1 if key == "kernel" else 0)
    return {
        "wmod": np.asarray(p["Dense_0"]["kernel"]),
        "bmod": np.asarray(p["Dense_0"]["bias"]),
        "wqkv": cat("kernel", 3),
        "bqkv": cat("bias", 3),
        "wo": np.asarray(attn["out"]["kernel"]).reshape(D, D),
        "bo": np.asarray(attn["out"]["bias"]).reshape(D),
        "w1": np.asarray(p["Dense_1"]["kernel"]),
        "b1": np.asarray(p["Dense_1"]["bias"]),
        "w2": np.asarray(p["Dense_2"]["kernel"]),
        "b2": np.asarray(p["Dense_2"]["bias"]),
    }


def _nested_from_flat(p, tmpl):
    """PallasDiTBlock flat subtree -> DiTBlock nested subtree, with leaf
    shapes taken from the template (`.shape` only — never fetches device
    arrays through the tunnel)."""
    wqkv = np.asarray(p["wqkv"])
    bqkv = np.asarray(p["bqkv"])
    D = wqkv.shape[0]
    t_attn = tmpl["MultiHeadDotProductAttention_0"]
    attn = {}
    for i, nm in enumerate(("query", "key", "value")):
        attn[nm] = {
            "kernel": wqkv[:, i * D:(i + 1) * D].reshape(t_attn[nm]["kernel"].shape),
            "bias": bqkv[i * D:(i + 1) * D].reshape(t_attn[nm]["bias"].shape),
        }
    attn["out"] = {
        "kernel": np.asarray(p["wo"]).reshape(t_attn["out"]["kernel"].shape),
        "bias": np.asarray(p["bo"]).reshape(t_attn["out"]["bias"].shape),
    }
    return {
        "Dense_0": {"kernel": np.asarray(p["wmod"]), "bias": np.asarray(p["bmod"])},
        "MultiHeadDotProductAttention_0": attn,
        "Dense_1": {"kernel": np.asarray(p["w1"]), "bias": np.asarray(p["b1"])},
        "Dense_2": {"kernel": np.asarray(p["w2"]), "bias": np.asarray(p["b2"])},
    }


def convert_checkpoint_blocks(host: dict, tmpl: dict) -> dict:
    """Recursively rebuild `host` (a checkpoint param dict) in the structure
    of `tmpl`, converting DiTBlock_i <-> PallasDiTBlock_i subtrees wherever
    the two trees disagree. Raises KeyError if a template subtree has no
    source in the checkpoint."""
    out = {}
    for k, tv in tmpl.items():
        if k in host:
            hv = host[k]
            out[k] = (convert_checkpoint_blocks(hv, tv)
                      if isinstance(tv, dict) and isinstance(hv, dict) else hv)
            continue
        m = _TO_PALLAS_RE.match(k)
        if m and f"DiTBlock_{m.group(1)}" in host:
            out[k] = _flat_from_nested(host[f"DiTBlock_{m.group(1)}"])
            continue
        m = _TO_NESTED_RE.match(k)
        if m and f"PallasDiTBlock_{m.group(1)}" in host:
            out[k] = _nested_from_flat(host[f"PallasDiTBlock_{m.group(1)}"], tv)
            continue
        raise KeyError(f"checkpoint has no source for parameter subtree {k!r}")
    return out


class FinalLayer1d(nn.Module):
    """Zero-init adaLN final projection (reference dit.py:39-50)."""

    hidden_size: int
    out_dim: int

    @nn.compact
    def __call__(self, x, t):
        mod = nn.Dense(self.hidden_size * 2, kernel_init=zeros_init, bias_init=zeros_init)(
            nn.silu(t)
        )
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)(x), shift, scale)
        return nn.Dense(self.out_dim, kernel_init=zeros_init, bias_init=zeros_init)(x)


class _DiTCore(BaseNNDiffusion):
    in_dim: int = 0
    emb_dim: int = 0
    d_model: int = 384
    n_heads: int = 6
    depth: int = 12
    dropout: float = 0.0
    timestep_emb_type: str = "positional"
    timestep_emb_params: Optional[dict] = None
    # opt-in fused Pallas block (config key nn_kwargs.use_pallas_block);
    # changes the param layout, so it is a model-construction choice
    use_pallas_block: bool = False

    def map_t(self, t, emb):
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type, self.timestep_emb_params)(t)
        if emb is not None:
            te = te + emb
        te = nn.Dense(self.d_model, kernel_init=normal02)(te)
        te = mish(te)
        te = nn.Dense(self.d_model, kernel_init=normal02)(te)
        return mish(te)


class DiT1d(_DiTCore):
    """(b, H, in_dim) -> (b, H, in_dim) (reference dit.py:53-132)."""

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        pos = sinusoidal_features(jnp.arange(x.shape[1]), self.d_model)
        x = nn.Dense(self.d_model, kernel_init=xavier_uniform_init)(x) + pos[None]
        te = self.map_t(t, emb)
        block = PallasDiTBlock if self.use_pallas_block else DiTBlock
        for _ in range(self.depth):
            x = block(self.d_model, self.n_heads, self.dropout)(x, te, train=train)
        return FinalLayer1d(self.d_model, self.in_dim)(x, te)


class DiT1Ref(_DiTCore):
    """DiT with per-block cross-attention to a reference trajectory that is
    channel-split from x (reference dit.py:135-180). Input (b, H, 2*in_dim),
    output (b, H, 2*in_dim) with the reference half passed through."""

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        pos = sinusoidal_features(jnp.arange(x.shape[1]), self.d_model)
        x_ref, x_main = jnp.split(x, 2, axis=-1)
        x_ref_bkp = x_ref

        proj = nn.Dense(self.d_model, kernel_init=xavier_uniform_init, name="x_proj")
        x_ref = proj(x_ref) + pos[None]
        h = proj(x_main) + pos[None]
        te = self.map_t(t, emb)

        for _ in range(self.depth):
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads,
                qkv_features=self.d_model,
                kernel_init=xavier_uniform_init,
            )(h, x_ref)
            h = DiTBlock(self.d_model, self.n_heads, self.dropout)(h, te, train=train)
        out = FinalLayer1d(self.d_model, self.in_dim)(h, te)
        return jnp.concatenate([x_ref_bkp, out], axis=-1)
