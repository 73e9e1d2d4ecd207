"""Shape-contract tests for all nn_diffusion backbones, nn_classifier heads,
and inverse-dynamics models (mirrors reference tests/test_dit.py etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.invdynamic import FancyMlpInvDynamic, MlpInvDynamic
from cleandiffuser_tpu.nn_classifier import HalfDiT1d, HalfJannerUNet1d, MLPNNClassifier
from cleandiffuser_tpu.nn_diffusion import (
    ChiTransformer,
    ChiUNet1d,
    DiT1Ref,
    DiT1d,
    DQLMlp,
    IDQLMlp,
    JannerUNet1d,
    MlpNNDiffusion,
    PearceMlp,
    PearceTransformer,
    SfBCUNet,
)

RNG = jax.random.PRNGKey(0)
B, H, D, OBS, ACT, EMB = 2, 16, 10, 7, 3, 64


def init_apply(mod, x, t, emb=None):
    params = mod.init({"params": RNG, "dropout": RNG}, x, t, emb)
    out = mod.apply(params, x, t, emb)
    return params, out


def test_jannerunet():
    x = jnp.ones((B, H, D))
    t = jnp.zeros((B,), jnp.int32)
    emb = jnp.ones((B, 32))
    for attention in (False, True):
        mod = JannerUNet1d(in_dim=D, model_dim=16, emb_dim=32, attention=attention)
        _, out = init_apply(mod, x, t, emb)
        assert out.shape == (B, H, D)
        assert np.all(np.isfinite(np.asarray(out)))


def test_jannerunet_no_cond():
    mod = JannerUNet1d(in_dim=D, model_dim=16, emb_dim=32)
    _, out = init_apply(mod, jnp.ones((B, H, D)), jnp.zeros((B,), jnp.int32), None)
    assert out.shape == (B, H, D)


def test_dit1d():
    mod = DiT1d(in_dim=D, emb_dim=EMB, d_model=64, n_heads=4, depth=2)
    x = jnp.ones((B, H, D))
    t = jnp.zeros((B,), jnp.int32)
    emb = jnp.ones((B, EMB))
    params, out = init_apply(mod, x, t, emb)
    assert out.shape == (B, H, D)
    # zero-init final layer -> output is exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit1ref():
    mod = DiT1Ref(in_dim=D, emb_dim=EMB, d_model=64, n_heads=4, depth=2)
    x = jnp.ones((B, H, 2 * D))
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), jnp.ones((B, EMB)))
    assert out.shape == (B, H, 2 * D)
    # reference half passes through unchanged
    np.testing.assert_allclose(np.asarray(out)[..., :D], 1.0, atol=1e-6)


def test_chiunet_global_cond():
    To = 2
    mod = ChiUNet1d(act_dim=ACT, obs_dim=OBS, To=To, model_dim=32, emb_dim=32)
    x = jnp.ones((B, 8, ACT))
    emb = jnp.ones((B, To, OBS))
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), emb)
    assert out.shape == (B, 8, ACT)


def test_chiunet_local_cond():
    mod = ChiUNet1d(
        act_dim=ACT, obs_dim=OBS, To=2, model_dim=32, emb_dim=32, obs_as_global_cond=False
    )
    x = jnp.ones((B, 8, ACT))
    emb = jnp.ones((B, 8, OBS))  # local cond aligned with Ta
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), emb)
    assert out.shape == (B, 8, ACT)


def test_chitransformer():
    Ta, To = 8, 2
    mod = ChiTransformer(act_dim=ACT, obs_dim=OBS, Ta=Ta, To=To, d_model=32, nhead=2, num_layers=2)
    x = jnp.ones((B, Ta, ACT))
    emb = jnp.ones((B, To, OBS))
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), emb)
    assert out.shape == (B, Ta, ACT)


def test_chitransformer_causality():
    """Token i of the output must not depend on future action tokens."""
    Ta, To = 8, 2
    mod = ChiTransformer(
        act_dim=ACT, obs_dim=OBS, Ta=Ta, To=To, d_model=32, nhead=2, num_layers=2,
        p_drop_attn=0.0,
    )
    x = jnp.asarray(np.random.randn(1, Ta, ACT).astype(np.float32))
    t = jnp.zeros((1,), jnp.int32)
    emb = jnp.asarray(np.random.randn(1, To, OBS).astype(np.float32))
    params = mod.init({"params": RNG, "dropout": RNG}, x, t, emb)
    out1 = mod.apply(params, x, t, emb)
    x2 = x.at[0, -1].set(100.0)  # perturb the last action token
    out2 = mod.apply(params, x2, t, emb)
    np.testing.assert_allclose(
        np.asarray(out1)[0, :-1], np.asarray(out2)[0, :-1], atol=1e-4
    )


def test_pearce_mlp():
    To = 3
    mod = PearceMlp(act_dim=ACT, To=To, emb_dim=32, hidden_dim=64)
    x = jnp.ones((B, ACT))
    emb = jnp.ones((B, To, 32))
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), emb)
    assert out.shape == (B, ACT)


def test_pearce_transformer():
    To = 3
    mod = PearceTransformer(act_dim=ACT, To=To, emb_dim=32, trans_emb_dim=16, nhead=4)
    x = jnp.ones((B, ACT))
    emb = jnp.ones((B, To, 32))
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), emb)
    assert out.shape == (B, ACT)


def test_sfbc_unet():
    mod = SfBCUNet(act_dim=ACT, emb_dim=32, hidden_dims=(64, 32, 16))
    x = jnp.ones((B, ACT))
    _, out = init_apply(mod, x, jnp.zeros((B,), jnp.float32), jnp.ones((B, 32)))
    assert out.shape == (B, ACT)


def test_mlp_family():
    for mod, xshape in [
        (MlpNNDiffusion(x_dim=5, emb_dim=16), (B, 5)),
        (DQLMlp(obs_dim=OBS, act_dim=ACT), (B, ACT)),
        (IDQLMlp(obs_dim=OBS, act_dim=ACT), (B, ACT)),
    ]:
        x = jnp.ones(xshape)
        emb = jnp.ones((B, OBS)) if xshape[-1] == ACT else None
        _, out = init_apply(mod, x, jnp.zeros((B,), jnp.int32), emb)
        assert out.shape == xshape


def test_half_jannerunet():
    mod = HalfJannerUNet1d(horizon=32, in_dim=D, out_dim=1, emb_dim=EMB, model_dim=16)
    x = jnp.ones((B, 32, D))
    t = jnp.zeros((B,), jnp.int32)
    params = mod.init(RNG, x, t, jnp.ones((B, EMB)))
    out = mod.apply(params, x, t, jnp.ones((B, EMB)))
    assert out.shape == (B, 1)
    out_nocond = mod.apply(params, x, t, None)
    assert out_nocond.shape == (B, 1)


def test_half_dit():
    mod = HalfDiT1d(in_dim=D, out_dim=1, emb_dim=EMB, d_model=64, n_heads=4, depth=2)
    x = jnp.ones((B, H, D))
    t = jnp.zeros((B,), jnp.int32)
    params = mod.init(RNG, x, t, None)
    out = mod.apply(params, x, t, None)
    assert out.shape == (B, 1)


def test_mlp_classifier():
    mod = MLPNNClassifier(x_dim=5, out_dim=1, emb_dim=16, hidden_dims=(32,))
    params = mod.init(RNG, jnp.ones((B, 5)), jnp.zeros((B,), jnp.int32), None)
    out = mod.apply(params, jnp.ones((B, 5)), jnp.zeros((B,), jnp.int32), None)
    assert out.shape == (B, 1)


def test_inv_dynamic():
    for cls in (MlpInvDynamic, FancyMlpInvDynamic):
        inv = cls(OBS, ACT, hidden_dim=32)
        o = np.random.randn(8, OBS).astype(np.float32)
        a = np.random.randn(8, ACT).astype(np.float32)
        o2 = np.random.randn(8, OBS).astype(np.float32)
        log = inv.update(o, a, o2)
        assert np.isfinite(log["loss"])
        pred = inv.predict(o, o2)
        assert pred.shape == (8, ACT)
        assert np.all(np.abs(np.asarray(pred)) <= 1.0)
