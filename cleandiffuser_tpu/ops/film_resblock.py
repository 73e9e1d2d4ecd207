"""Pallas TPU kernel: fused FiLM Conv1d residual block.

The inner op of JannerUNet1d / ChiUNet1d (reference
cleandiffuser/nn_diffusion/jannerunet.py:52-69, chiunet.py:13-45):

    h = Mish(GN(conv1(x))) ; h = h + emb_proj  (or scale*h + bias)
    h = Mish(GN(conv2(h))) ; out = h + skip(x)

The flax path lowers to ~8 HBM-round-tripping XLA ops per block. This
kernel keeps the whole (H, C) trajectory tile and both conv weights in
VMEM and writes HBM exactly once per block. Trajectory horizons here are
tiny (8-128) so a full sample's activations fit VMEM easily; the grid is
over the batch.

Used on the inference/sampling path (planner eval); training uses the flax
path (identical math — asserted by tests/test_pallas_ops.py).
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


def _kernel(x_ref, emb_ref, w1_ref, b1_ref, g1s_ref, g1b_ref,
            w2_ref, b2_ref, g2s_ref, g2b_ref, wskip_ref, bskip_ref,
            out_ref, *, K: int, groups: int, film_scale: bool, has_skip: bool):
    x = x_ref[0]  # (H, Cin)
    emb = emb_ref[0]  # (D,) with D = Cout or 2*Cout

    h = _conv1d_same(x, w1_ref[...], b1_ref[...], K)
    h = _group_norm(h, groups, g1s_ref[...], g1b_ref[...])
    h = _mish(h)

    if film_scale:
        cout = h.shape[-1]
        h = emb[:cout][None, :] * h + emb[cout:][None, :]
    else:
        h = h + emb[None, :]

    h = _conv1d_same(h, w2_ref[...], b2_ref[...], K)
    h = _group_norm(h, groups, g2s_ref[...], g2b_ref[...])
    h = _mish(h)

    if has_skip:
        skip = jnp.dot(x, wskip_ref[...], preferred_element_type=jnp.float32) + bskip_ref[...]
    else:
        skip = x
    out_ref[0] = h + skip


@partial(jax.jit, static_argnames=("K", "groups", "film_scale"))
def film_resblock(x, emb, w1, b1, g1s, g1b, w2, b2, g2s, g2b,
                  wskip=None, bskip=None, *, K: int = 3, groups: int = 8,
                  film_scale: bool = False):
    """Fused FiLM residual block.

    x:    (B, H, Cin)
    emb:  (B, Cout) FiLM-add or (B, 2*Cout) FiLM scale+bias
    w1:   (K, Cin, Cout), b1: (Cout,), g1s/g1b: (Cout,) GN affine
    w2:   (K, Cout, Cout), b2/g2s/g2b: (Cout,)
    wskip: (Cin, Cout) or None when Cin == Cout
    """
    B, H, Cin = x.shape
    Cout = w1.shape[-1]
    has_skip = wskip is not None
    if not has_skip:
        wskip = jnp.zeros((Cin, Cout), x.dtype)
        bskip = jnp.zeros((Cout,), x.dtype)

    kernel = partial(_kernel, K=K, groups=groups, film_scale=film_scale,
                     has_skip=has_skip)
    grid = (B,)
    bs = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, emb.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            bs(w1.shape), bs(b1.shape), bs(g1s.shape), bs(g1b.shape),
            bs(w2.shape), bs(b2.shape), bs(g2s.shape), bs(g2b.shape),
            bs(wskip.shape), bs(bskip.shape),
        ],
        out_specs=pl.BlockSpec((1, H, Cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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
