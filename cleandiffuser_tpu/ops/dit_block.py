"""Pallas TPU kernel: fused adaLN-Zero DiT block (SURVEY §7 kernel #2).

One DiTBlock of nn_diffusion/dit.py (reference cleandiffuser/nn_diffusion/
dit.py:14-36) at planner-eval shapes (B ≈ 50-3200 trajectories, H ≤ 32
tokens, d_model 256-384):

    h  = modulate(LN(x), shift1, scale1)
    x  = x + gate1 * MHA(h)
    h2 = modulate(LN(x), shift2, scale2)
    out= x + gate2 * W2 @ gelu(W1 @ h2)

The kernel processes a tile of `envs_per_tile` trajectories per grid step
(tokens flattened to MXU-shaped (E*H, D) rows), keeps all five weight
matrices resident in VMEM across the grid, broadcasts the per-trajectory
adaLN modulation with a membership matmul, and runs attention as per-head
(E*H, E*H) dots under a block-diagonal trajectory mask. Every intermediate
(LN output, qkv, attention probs, gelu) lives only in VMEM — HBM sees one
read of x/mod and one write of out.

The per-trajectory modulation vector `mod` (6*D, from Dense(silu(t_emb)))
is computed OUTSIDE the kernel: it is O(B*D) work on O(B*D^2) weights and
XLA handles it; fusing it would force the (D, 6D) dense weights into VMEM
for no bandwidth win.

MEASURED (TPU v5e, f32, D=320, 10 heads, scan-amortized):
  B=3200 H=32 (diffuser/DD candidate eval):  XLA 14.0 ms -> pallas 7.2 ms
    (1.95x; 2.07x vs the actual flax DiTBlock apply)
  B=50   H=32 (single-candidate eval):       1.06x (wash)
  B=2500 H=4  (short-horizon):               0.75x (XLA wins)
=> PRODUCTION at B*H >= 2048 tokens behind DiT1d(use_pallas_block=True)
   (`use_pallas_dit` gate); XLA fallback otherwise. Equivalence asserted in
   tests/test_pallas_ops.py (rel err ~3e-3 from MXU f32 accumulation).
"""

from __future__ import annotations

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

__all__ = ["fused_dit_block", "dit_block_reference", "pack_dit_block_params",
           "PALLAS_AVAILABLE"]


def _layernorm(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps)


def _kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, n_heads: int, horizon: int, envs_per_tile: int):
    E, H = envs_per_tile, horizon
    T = E * H  # token rows in this tile
    D = x_ref.shape[-1]
    hd = D // n_heads

    x = x_ref[:].reshape(T, D)
    mod = mod_ref[:].reshape(E, 6 * D)

    # per-trajectory -> per-token broadcast as a membership matmul:
    # member[t, e] = 1 iff token t belongs to trajectory e
    tok_env = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0) // H
    env_col = jax.lax.broadcasted_iota(jnp.int32, (T, E), 1)
    member = (tok_env == env_col).astype(x.dtype)  # (T, E)
    mod_tok = jnp.dot(member, mod, preferred_element_type=jnp.float32)  # (T, 6D)
    # static slices only: Pallas TPU has no dynamic_slice lowering
    shift1, scale1, gate1, shift2, scale2, gate2 = [
        mod_tok[:, i * D:(i + 1) * D] for i in range(6)
    ]

    # ---- attention branch ----
    h = _layernorm(x) * (1.0 + scale1) + shift1
    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    q = qkv[:, :D] * (hd ** -0.5)
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]

    # block-diagonal trajectory mask over the flattened tokens
    row_env = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0) // H
    col_env = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) // H
    neg = jnp.where(row_env == col_env, 0.0, -1e30).astype(jnp.float32)

    heads = []
    for hidx in range(n_heads):  # static python loop: n_heads instances
        qh = q[:, hidx * hd:(hidx + 1) * hd]
        kh = k[:, hidx * hd:(hidx + 1) * hd]
        vh = v[:, hidx * hd:(hidx + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + neg  # (T, T)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))

    attn = jnp.concatenate(heads, axis=1)  # (T, D)
    attn = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    x = x + gate1 * attn

    # ---- mlp branch ----
    h2 = _layernorm(x) * (1.0 + scale2) + shift2
    h2 = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h2 = jax.nn.gelu(h2, approximate=True)
    h2 = jnp.dot(h2, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    # accumulators are f32 (preferred_element_type above); the store casts
    # back to the input dtype so bf16 sampling keeps inter-block activations
    # bf16 (half the HBM traffic on the bandwidth-bound sampler path)
    out_ref[:] = (x + gate2 * h2).reshape(E, H, D).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("n_heads", "envs_per_tile", "interpret"))
def fused_dit_block(x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
                    n_heads: int = 10, envs_per_tile: int = 4,
                    interpret: bool = False):
    """x: (B, H, D); mod: (B, 6D). Returns (B, H, D).

    B must be a multiple of envs_per_tile (pad the candidate batch — eval
    batches are 50*K with K in {50, 64}, both multiples of 4).
    """
    B, H, D = x.shape
    assert B % envs_per_tile == 0, (B, envs_per_tile)
    grid = (B // envs_per_tile,)
    kern = partial(_kernel, n_heads=n_heads, horizon=H,
                   envs_per_tile=envs_per_tile)
    const = lambda *_: (0, 0)  # weights: same block every step (fetched once)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((envs_per_tile, H, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, 6D) layout: block last-two dims == array last-two dims,
            # satisfying the Mosaic (8, 128) block-divisibility rule
            pl.BlockSpec((envs_per_tile, 1, 6 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * D, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((envs_per_tile, H, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D), x.dtype),
        interpret=interpret,
    )(x, mod.reshape(B, 1, 6 * D), wqkv, bqkv.reshape(1, -1), wo,
      bo.reshape(1, -1), w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


# ---------------------------------------------------------------------------
def pack_dit_block_params(block_params, d_model: int, n_heads: int):
    """Flatten a flax DiTBlock param subtree into the kernel's weight list.

    flax MultiHeadDotProductAttention stores query/key/value kernels as
    (D, n_heads, head_dim) and the out kernel as (n_heads, head_dim, D);
    they collapse to (D, 3D)/(D, D) with plain reshapes.
    """
    p = block_params
    attn = p["MultiHeadDotProductAttention_0"]
    D = d_model
    wq = np.asarray(attn["query"]["kernel"]).reshape(D, D)
    wk = np.asarray(attn["key"]["kernel"]).reshape(D, D)
    wv = np.asarray(attn["value"]["kernel"]).reshape(D, D)
    bq = np.asarray(attn["query"]["bias"]).reshape(D)
    bk = np.asarray(attn["key"]["bias"]).reshape(D)
    bv = np.asarray(attn["value"]["bias"]).reshape(D)
    wqkv = np.concatenate([wq, wk, wv], axis=1)  # (D, 3D)
    bqkv = np.concatenate([bq, bk, bv])
    wo = np.asarray(attn["out"]["kernel"]).reshape(D, D)
    bo = np.asarray(attn["out"]["bias"]).reshape(D)
    # Dense_0 = adaLN modulation (applied OUTSIDE the kernel);
    # Dense_1/Dense_2 = the MLP
    w1 = np.asarray(p["Dense_1"]["kernel"])
    b1 = np.asarray(p["Dense_1"]["bias"])
    w2 = np.asarray(p["Dense_2"]["kernel"])
    b2 = np.asarray(p["Dense_2"]["bias"])
    return [jnp.asarray(a) for a in (wqkv, bqkv, wo, bo, w1, b1, w2, b2)]


def dit_block_reference(x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
                        n_heads: int = 10):
    """Plain-XLA reference of the same math (for equivalence + timing)."""
    B, H, D = x.shape
    hd = D // n_heads
    shift1, scale1, gate1, shift2, scale2, gate2 = jnp.split(mod, 6, axis=-1)

    h = _layernorm(x) * (1 + scale1[:, None]) + shift1[:, None]
    qkv = h @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, H, n_heads, hd) * (hd ** -0.5)
    k = k.reshape(B, H, n_heads, hd)
    v = v.reshape(B, H, n_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, H, D)
    x = x + gate1[:, None] * (o @ wo + bo)

    h2 = _layernorm(x) * (1 + scale2[:, None]) + shift2[:, None]
    h2 = jax.nn.gelu(h2 @ w1 + b1, approximate=True)
    return x + gate2[:, None] * (h2 @ w2 + b2)


# ---------------------------------------------------------------------------
# Autodiff: kernel forward, XLA-reference backward (the kernel targets the
# sampling hot path; training steps differentiate through the same math via
# dit_block_reference, which XLA fuses well).
@partial(jax.custom_vjp, nondiff_argnums=(10,))
def dit_block_op(x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2, n_heads):
    return fused_dit_block(x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2,
                           n_heads=n_heads, envs_per_tile=_pick_tile(x.shape))


def _pick_tile(shape):
    B, H, _ = shape
    for ept in (8, 4, 5, 2, 1):
        if B % ept == 0 and ept * H <= 512:
            return ept
    return 1


def _dit_fwd(x, mod, *ws, n_heads):
    return dit_block_op(x, mod, *ws, n_heads), (x, mod) + ws


def _dit_bwd(n_heads, res, g):
    x, mod, *ws = res
    _, vjp = jax.vjp(
        lambda *a: dit_block_reference(*a, n_heads=n_heads), x, mod, *ws)
    return vjp(g)


dit_block_op.defvjp(
    lambda x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2, n_heads: _dit_fwd(
        x, mod, wqkv, bqkv, wo, bo, w1, b1, w2, b2, n_heads=n_heads),
    _dit_bwd,
)


def use_pallas_dit(x_shape) -> bool:
    """Shape/backend gate, measured on TPU v5e (ops/dit_block.py header):
    >=1.9x at B*H >= 2048 tokens; ~1.0x at 1600; <1x below."""
    if not PALLAS_AVAILABLE or jax.default_backend() != "tpu":
        return False
    B, H, _ = x_shape
    return B * H >= 2048 and H >= 8
