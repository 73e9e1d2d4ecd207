"""Pallas TPU kernel: fused per-step solver update (SURVEY §7 kernel #3).

One VP-SDE solver step (diffusion/vp_solvers.py solver_step — e.g. ddpm:
x = c_xt*xt + c_eps*eps_theta + c_noise*noise) including the Gaussian
noise DRAW. XLA executes this as (a) a threefry2x32 fusion that writes the
noise tensor to HBM and (b) an elementwise fusion that reads it back; the
kernel instead generates noise with the TPU hardware PRNG
(pltpu.prng_random_bits + Box-Muller) directly in VMEM, so HBM traffic
drops from 5 tensor passes to 3 (read xt, read eps, write x).

The coefficients are data-dependent scalars (they index alpha/sigma/std
tables with the scan carry `i`), so they arrive as a (1, 4) SMEM operand
computed on-device — no host sync.

Exactness: with c_noise == 0 the kernel is bit-comparable to XLA; with
noise the stream differs from jax.random.normal (different PRNG), which is
statistically irrelevant for the sampler (equivalence tested moment-wise).

MEASURED (TPU v5e, f32, scan-amortized) — NEGATIVE RESULT, NOT SHIPPED:
  (3200, 32, 23): XLA 251 us -> pallas 620 us (0.41x)
  (2500, 6):      XLA 152 us -> pallas 173 us (0.88x)
  (64, 257, 23):  XLA 185 us -> pallas 253 us (0.73x)
The in-kernel Box-Muller (log + cos transcendentals on the VPU) costs more
than XLA's fused threefry pipeline at these sizes, and XLA already fuses
the threefry bits generation INTO the elementwise update (no separate HBM
round-trip as hypothesized). The flax/XLA solver path stays the default;
this closes SURVEY §7's third kernel target as adjudicated (with
ops/film_resblock.py and ops/dit_block.py).
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

__all__ = ["fused_solver_update", "solver_update_reference", "PALLAS_AVAILABLE"]

_TWO_PI = 6.283185307179586


def _kernel(coef_ref, seed_ref, xt_ref, eps_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    c_xt = coef_ref[0, 0]
    c_eps = coef_ref[0, 1]
    c_noise = coef_ref[0, 2]

    x = c_xt * xt_ref[:] + c_eps * eps_ref[:]

    # Box-Muller from two uint32 draws; 24-bit mantissa uniforms in (0, 1]
    shape = x.shape
    # uint32 -> f32 casts are unsupported in Mosaic; route the 24-bit
    # payload through int32 (always non-negative after the shift)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = pltpu.bitcast(b1 >> 8, jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    u2 = pltpu.bitcast(b2 >> 8, jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    u1 = jnp.maximum(u1, 1e-7)
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)

    out_ref[:] = x + c_noise * z


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_solver_update(xt, eps_theta, coefs, seed, block_rows: int = 1024,
                        interpret: bool = False):
    """xt, eps_theta: same shape; coefs: (3,) [c_xt, c_eps, c_noise] device
    scalars; seed: int32 scalar. Returns c_xt*xt + c_eps*eps + c_noise*N."""
    shape = xt.shape
    flat = xt.reshape(-1, shape[-1]) if xt.ndim > 1 else xt.reshape(1, -1)
    eps2 = eps_theta.reshape(flat.shape)
    R, C = flat.shape
    br = min(block_rows, R)
    # pad rows to a multiple of the block
    pad = (-R) % br
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        eps2 = jnp.pad(eps2, ((0, pad), (0, 0)))
    Rp = flat.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C), jnp.float32),
        interpret=interpret,
    )(jnp.concatenate([coefs.reshape(-1), jnp.zeros((1,), coefs.dtype)]).reshape(1, 4),
      jnp.asarray(seed, jnp.int32).reshape(1), flat, eps2)
    if pad:
        out = out[:R]
    return out.reshape(shape)


def solver_update_reference(xt, eps_theta, coefs, rng):
    """Plain-XLA equivalent (threefry noise) for equivalence + timing."""
    noise = jax.random.normal(rng, xt.shape)
    return coefs[0] * xt + coefs[1] * eps_theta + coefs[2] * noise
