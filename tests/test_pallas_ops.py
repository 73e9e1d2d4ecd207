"""Numerical-equivalence tests for Pallas kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.ops import film_resblock_reference


def _make_inputs(B=2, H=16, Cin=32, Cout=64, K=3, film_scale=False, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    emb_dim = 2 * Cout if film_scale else Cout
    return dict(
        x=f(B, H, Cin), emb=f(B, emb_dim),
        w1=f(K, Cin, Cout), b1=f(Cout), g1s=jnp.ones(Cout), g1b=jnp.zeros(Cout),
        w2=f(K, Cout, Cout), b2=f(Cout), g2s=jnp.ones(Cout), g2b=jnp.zeros(Cout),
        wskip=f(Cin, Cout), bskip=f(Cout),
    )


def test_reference_matches_flax_math():
    """The reference implementation reproduces the flax ResidualBlock1d."""
    import flax.linen as nn

    from cleandiffuser_tpu.nn_diffusion.jannerunet import ResidualBlock1d

    B, H, Cin, Cout, K = 2, 16, 32, 64, 3
    block = ResidualBlock1d(out_dim=Cout, emb_dim=Cout, kernel_size=K)
    x = jnp.asarray(np.random.randn(B, H, Cin).astype(np.float32))
    emb_raw = jnp.asarray(np.random.randn(B, Cout).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x, emb_raw)
    out_flax = block.apply(params, x, emb_raw)

    p = params["params"]
    # flax block computes emb_proj = Dense(mish(emb)); fold it into the
    # fused op's FiLM-add input
    from cleandiffuser_tpu.utils.embeddings import mish

    emb_proj = mish(emb_raw) @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    groups = min(8, Cout // 4)
    out_ref = film_resblock_reference(
        x, emb_proj,
        p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
        p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
        p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
        p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
        p["Conv_2"]["kernel"][0], p["Conv_2"]["bias"],
        K=K, groups=groups,
    )
    np.testing.assert_allclose(np.asarray(out_flax), np.asarray(out_ref), atol=1e-4)


@pytest.mark.parametrize("film_scale", [False, True])
def test_pallas_kernel_matches_reference_interpret(film_scale):
    """Pallas kernel (interpret mode on CPU) == XLA reference."""
    from functools import partial

    import jax.experimental.pallas as pl

    from cleandiffuser_tpu.ops import film_resblock
    from cleandiffuser_tpu.ops.film_resblock import _kernel

    inputs = _make_inputs(film_scale=film_scale)
    out_ref = film_resblock_reference(**inputs, K=3, groups=8, film_scale=film_scale)

    # run the pallas kernel in interpreter mode (no TPU needed)
    B, H, Cin = inputs["x"].shape
    Cout = inputs["w1"].shape[-1]
    import jax.numpy as jnp

    kernel = partial(_kernel, K=3, groups=8, film_scale=film_scale, has_skip=True)
    from jax.experimental.pallas import tpu as pltpu

    bs = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, inputs["emb"].shape[-1]), lambda i: (i, 0)),
            bs(inputs["w1"].shape), bs(inputs["b1"].shape),
            bs(inputs["g1s"].shape), bs(inputs["g1b"].shape),
            bs(inputs["w2"].shape), bs(inputs["b2"].shape),
            bs(inputs["g2s"].shape), bs(inputs["g2b"].shape),
            bs(inputs["wskip"].shape), bs(inputs["bskip"].shape),
        ],
        out_specs=pl.BlockSpec((1, H, Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Cout), jnp.float32),
        interpret=True,
    )(*inputs.values())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-4)


# ---------------------------------------------------------------------------
# Fused adaLN-Zero DiT block (ops/dit_block.py)
# ---------------------------------------------------------------------------
def _dit_inputs(B=8, H=8, D=64, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    ws = [f(D, 3 * D), f(3 * D), f(D, D), f(D),
          f(D, 4 * D), f(4 * D), f(4 * D, D), f(D)]
    return f(B, H, D), f(B, 6 * D), ws


def test_dit_block_kernel_matches_reference_interpret():
    from cleandiffuser_tpu.ops.dit_block import (
        dit_block_reference,
        fused_dit_block,
    )

    x, mod, ws = _dit_inputs()
    ref = dit_block_reference(x, mod, *ws, n_heads=4)
    out = fused_dit_block(x, mod, *ws, n_heads=4, envs_per_tile=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_dit_block_kernel_preserves_bf16_dtype_interpret():
    """bf16 in -> bf16 out (inter-block activations stay half-width on the
    bf16 sampling path); values still track the f32 reference."""
    from cleandiffuser_tpu.ops.dit_block import (
        dit_block_reference,
        fused_dit_block,
    )

    x, mod, ws = _dit_inputs()
    ref = dit_block_reference(x, mod, *ws, n_heads=4)
    out = fused_dit_block(
        x.astype(jnp.bfloat16), mod.astype(jnp.bfloat16),
        *[w.astype(jnp.bfloat16) for w in ws],
        n_heads=4, envs_per_tile=2, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_dit_block_reference_matches_flax_block():
    """dit_block_reference == the flax DiTBlock used by the models."""
    from cleandiffuser_tpu.nn_diffusion.dit import DiTBlock
    from cleandiffuser_tpu.ops.dit_block import (
        dit_block_reference,
        pack_dit_block_params,
    )

    B, H, D, NH = 4, 8, 64, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32) * 0.1)
    te = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32) * 0.1)
    block = DiTBlock(D, NH)
    params = block.init(jax.random.PRNGKey(0), x, te)
    # randomize the zero-init adaLN so the comparison is non-trivial
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.default_rng(2).standard_normal(a.shape).astype(np.float32) * 0.1),
        params)
    out_flax = block.apply(params, x, te)
    p = params["params"]
    mod = jnp.dot(jax.nn.silu(te), p["Dense_0"]["kernel"]) + p["Dense_0"]["bias"]
    out_ref = dit_block_reference(x, mod, *pack_dit_block_params(p, D, NH),
                                  n_heads=NH)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_flax),
                               atol=2e-5, rtol=2e-5)


def test_dit_block_identity_at_init():
    """adaLN-Zero: zero-init gates make the block exactly identity
    (regression for the residual-from-modulated-h bug fixed in r2)."""
    from cleandiffuser_tpu.nn_diffusion.dit import DiTBlock, PallasDiTBlock

    B, H, D = 2, 8, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, D)),
                    jnp.float32)
    te = jnp.ones((B, D), jnp.float32)
    for cls in (DiTBlock, PallasDiTBlock):
        block = cls(D, 4)
        params = block.init(jax.random.PRNGKey(0), x, te)
        out = block.apply(params, x, te)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_pallas_dit_block_grad_flows():
    """The custom VJP (kernel fwd / reference bwd) yields finite grads."""
    from cleandiffuser_tpu.nn_diffusion.dit import PallasDiTBlock

    B, H, D = 2, 8, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, D)),
                    jnp.float32)
    te = jnp.ones((B, D), jnp.float32)
    block = PallasDiTBlock(D, 4)
    params = block.init(jax.random.PRNGKey(0), x, te)

    def loss(p):
        return (block.apply(p, x, te) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_dit1d_pallas_flag_shapes():
    from cleandiffuser_tpu.nn_diffusion import DiT1d

    m = DiT1d(in_dim=10, emb_dim=32, d_model=64, n_heads=4, depth=2,
              use_pallas_block=True)
    x = jnp.zeros((3, 8, 10))
    t = jnp.zeros((3,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (3, 8, 10)


# ---------------------------------------------------------------------------
# Fused solver update (ops/solver_update.py) — negative perf result; the
# kernel stays correct and tested
# ---------------------------------------------------------------------------
def test_solver_update_deterministic_equivalence_interpret():
    from cleandiffuser_tpu.ops.solver_update import (
        fused_solver_update,
        solver_update_reference,
    )

    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    coefs = jnp.asarray([0.97, -0.12, 0.0])  # c_noise = 0: exact
    from jax.experimental.pallas import tpu as pltpu

    ref = solver_update_reference(xt, eps, coefs, jax.random.PRNGKey(0))
    # TPU interpret mode: the plain CPU interpreter has no prng_seed rule
    out = fused_solver_update(xt, eps, coefs, 7, block_rows=32,
                              interpret=pltpu.InterpretParams())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_solver_update_noise_finite_and_seeded_interpret():
    """The interpreter emulates prng_random_bits with a constant stream, so
    distribution moments are only checkable on hardware (measured on the
    real chip: mu=-0.000, sd=1.000 — see ops/solver_update.py header).
    Here: noise output is finite and seed-deterministic."""
    from jax.experimental.pallas import tpu as pltpu

    from cleandiffuser_tpu.ops.solver_update import fused_solver_update

    coefs = jnp.asarray([0.0, 0.0, 1.0])  # pure noise
    ip = pltpu.InterpretParams()
    z1 = fused_solver_update(jnp.zeros((64, 128)), jnp.zeros((64, 128)),
                             coefs, 3, interpret=ip)
    z2 = fused_solver_update(jnp.zeros((64, 128)), jnp.zeros((64, 128)),
                             coefs, 3, interpret=ip)
    assert np.isfinite(np.asarray(z1)).all()
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
