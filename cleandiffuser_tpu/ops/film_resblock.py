"""Pallas TPU kernel: fused FiLM Conv1d residual block.

The inner op of JannerUNet1d / ChiUNet1d (reference
cleandiffuser/nn_diffusion/jannerunet.py:52-69, chiunet.py:13-45):

    h = Mish(GN(conv1(x))) ; h = h + emb_proj  (or scale*h + bias)
    h = Mish(GN(conv2(h))) ; out = h + skip(x)

The kernel tiles `batch_block` samples per grid step, keeps the activations
and both conv weights in VMEM, and expresses each conv tap as ONE flattened
(BB*H, Cin) @ (Cin, Cout) MXU dot; GroupNorm statistics and the FiLM
broadcast are membership-matrix matmuls (Mosaic-friendly — no 4-D
reshapes). HBM is written exactly once per block.

MEASURED (TPU v5e, B=3200 H=32 C=64 K=5, f32): pallas 0.72 ms/block vs
plain-XLA 0.54-0.62 ms/block — XLA's conv fusion already saturates this
bandwidth-trivial shape, so the FLAX/XLA PATH REMAINS THE DEFAULT in the
models; the kernel is kept as validated infrastructure for larger channel
counts (C >= 128) where the flattened-dot formulation pays off, and as the
fusion template for future ops. Equivalence vs the reference math is
asserted by tests/test_pallas_ops.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    PALLAS_AVAILABLE = False

__all__ = ["film_resblock", "film_resblock_reference", "PALLAS_AVAILABLE"]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _group_norm(x, num_groups, scale, bias, eps=1e-5):
    """x: (H, C) channels-last; normalize per group over (H, C//G)."""
    H, C = x.shape
    g = x.reshape(H, num_groups, C // num_groups)
    mean = g.mean(axis=(0, 2), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(0, 2), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(H, C) * scale + bias


def _conv1d_same(x, w, b, K):
    """x: (H, Cin), w: (K, Cin, Cout). 'SAME' padding via shifted matmuls."""
    H = x.shape[0]
    pad = K // 2
    out = b[None, :]
    for k in range(K):
        # x rows contributing at offset k - pad
        shift = k - pad
        xs = jnp.roll(x, -shift, axis=0)
        # zero out wrapped rows
        idx = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        valid = (idx + shift >= 0) & (idx + shift < H)
        xs = jnp.where(valid, xs, 0.0)
        out = out + jnp.dot(xs, w[k], preferred_element_type=jnp.float32)
    return out


def _conv1d_same_flat(x_flat, w, b, K, H):
    """Batched 'SAME' conv as K shifted matmuls on the FLATTENED (BB*H, Cin)
    tile — each tap is one big MXU dot instead of BB tiny ones. Rows that
    roll across a sample boundary are exactly the rows masked out by the
    per-sample validity test (h + shift outside [0, H))."""
    N = x_flat.shape[0]
    pad = K // 2
    out = b[None, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) % H  # h within sample
    for k in range(K):
        shift = k - pad
        if shift == 0:
            xs = x_flat  # Mosaic rejects the zero-size slice jnp.roll(.., 0) emits
        else:
            xs = jnp.roll(x_flat, -shift, axis=0)
            valid = (pos + shift >= 0) & (pos + shift < H)
            xs = jnp.where(valid, xs, 0.0)
        out = out + jnp.dot(xs, w[k], preferred_element_type=jnp.float32)
    return out


def _memberships(N, BB, H, C, groups):
    """One-hot membership matrices, Mosaic-friendly (no 4-D reshapes):
    Mg (C, G) channel->group, S (BB, N) sample->row."""
    Cg = C // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    Mg = ((ch // Cg) == gi).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (BB, N), 1)
    bi = jax.lax.broadcasted_iota(jnp.int32, (BB, N), 0)
    S = ((row // H) == bi).astype(jnp.float32)
    return Mg, S


def _group_norm_blocked(h_flat, S, Mg, H, groups, scale, bias, eps=1e-5):
    """GroupNorm per sample over (H, C//G) on the flattened (BB*H, C) tile.
    Statistics and their broadcast back are expressed as membership-matrix
    matmuls so everything stays in 2-D MXU ops (Mosaic rejects the 4-D
    reshape the naive formulation needs)."""
    C = h_flat.shape[-1]
    cnt = H * (C // groups)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    mean_bg = dot(S, dot(h_flat, Mg)) / cnt    # (BB, G)
    mean_nc = dot(S.T, dot(mean_bg, Mg.T))     # (N, C)
    d = h_flat - mean_nc
    var_bg = dot(S, dot(d * d, Mg)) / cnt      # two-pass: stable vs E[x^2]-E[x]^2
    rstd_nc = dot(S.T, dot(jax.lax.rsqrt(var_bg + eps), Mg.T))
    return d * rstd_nc * scale + bias


def _kernel(x_ref, emb_ref, w1_ref, b1_ref, g1s_ref, g1b_ref,
            w2_ref, b2_ref, g2s_ref, g2b_ref, wskip_ref, bskip_ref,
            out_ref, *, K: int, groups: int, film_scale: bool, has_skip: bool):
    BB, H, Cin = x_ref.shape
    x = x_ref[...].reshape(BB * H, Cin)
    emb = emb_ref[...]  # (BB, D) with D = Cout or 2*Cout
    N = BB * H
    Cout = w1_ref.shape[-1]
    Mg, S = _memberships(N, BB, H, Cout, groups)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    h = _conv1d_same_flat(x, w1_ref[...], b1_ref[...], K, H)
    h = _group_norm_blocked(h, S, Mg, H, groups, g1s_ref[...], g1b_ref[...])
    h = _mish(h)

    # FiLM: broadcast the per-sample embedding to rows via the sample
    # membership matmul (S.T @ emb), avoiding repeat/reshape
    if film_scale:
        h = dot(S.T, emb[:, :Cout]) * h + dot(S.T, emb[:, Cout:])
    else:
        h = h + dot(S.T, emb)

    h = _conv1d_same_flat(h, w2_ref[...], b2_ref[...], K, H)
    h = _group_norm_blocked(h, S, Mg, H, groups, g2s_ref[...], g2b_ref[...])
    h = _mish(h)

    if has_skip:
        skip = dot(x, wskip_ref[...]) + bskip_ref[...]
    else:
        skip = x
    out_ref[...] = (h + skip).reshape(BB, H, Cout)


@partial(jax.jit, static_argnames=("K", "groups", "film_scale", "batch_block"))
def film_resblock(x, emb, w1, b1, g1s, g1b, w2, b2, g2s, g2b,
                  wskip=None, bskip=None, *, K: int = 3, groups: int = 8,
                  film_scale: bool = False, batch_block: int = 64):
    """Fused FiLM residual block.

    x:    (B, H, Cin)
    emb:  (B, Cout) FiLM-add or (B, 2*Cout) FiLM scale+bias
    w1:   (K, Cin, Cout), b1: (Cout,), g1s/g1b: (Cout,) GN affine
    w2:   (K, Cout, Cout), b2/g2s/g2b: (Cout,)
    wskip: (Cin, Cout) or None when Cin == Cout

    The grid tiles `batch_block` samples per step; each conv tap is ONE
    (BB*H, Cin) @ (Cin, Cout) MXU dot on the flattened tile. Falls back to
    the XLA reference for batches not divisible by the block.
    """
    B, H, Cin = x.shape
    Cout = w1.shape[-1]
    has_skip = wskip is not None
    if not has_skip:
        wskip = jnp.zeros((Cin, Cout), x.dtype)
        bskip = jnp.zeros((Cout,), x.dtype)

    BB = min(batch_block, B)
    if B % BB != 0 or not PALLAS_AVAILABLE:
        return film_resblock_reference(
            x, emb, w1, b1, g1s, g1b, w2, b2, g2s, g2b,
            None if not has_skip else wskip, bskip if has_skip else None,
            K=K, groups=groups, film_scale=film_scale,
        )

    kernel = partial(_kernel, K=K, groups=groups, film_scale=film_scale,
                     has_skip=has_skip)
    grid = (B // BB,)
    bs = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, H, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, emb.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            bs(w1.shape), bs(b1.shape), bs(g1s.shape), bs(g1b.shape),
            bs(w2.shape), bs(b2.shape), bs(g2s.shape), bs(g2b.shape),
            bs(wskip.shape), bs(bskip.shape),
        ],
        out_specs=pl.BlockSpec((BB, H, Cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Cout), x.dtype),
    )(x, emb, w1, b1, g1s, g1b, w2, b2, g2s, g2b, wskip, bskip)


def film_resblock_reference(x, emb, w1, b1, g1s, g1b, w2, b2, g2s, g2b,
                            wskip=None, bskip=None, *, K: int = 3, groups: int = 8,
                            film_scale: bool = False):
    """Plain-XLA reference implementation (same math as the flax modules)."""

    def one(xb, eb):
        h = _conv1d_same(xb, w1, b1, K)
        h = _group_norm(h, groups, g1s, g1b)
        h = _mish(h)
        if film_scale:
            cout = h.shape[-1]
            h = eb[:cout][None, :] * h + eb[cout:][None, :]
        else:
            h = h + eb[None, :]
        h = _conv1d_same(h, w2, b2, K)
        h = _group_norm(h, groups, g2s, g2b)
        h = _mish(h)
        skip = xb if wskip is None else xb @ wskip + bskip
        return h + skip

    return jax.vmap(one)(x, emb)
