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
