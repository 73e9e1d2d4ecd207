"""Tests for EDM, Rectified Flow, and Consistency Model engines."""

import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.diffusion import (
    ContinuousConsistencyModel,
    ContinuousEDM,
    ContinuousRectifiedFlow,
    DiscreteRectifiedFlow,
)
from cleandiffuser_tpu.nn_condition import IdentityCondition
from cleandiffuser_tpu.nn_diffusion import DQLMlp

OBS, ACT = 7, 3


def _x_cond(n=8):
    return (
        np.random.randn(n, ACT).astype(np.float32),
        np.random.randn(n, OBS).astype(np.float32),
    )


def make_edm(**kw):
    return ContinuousEDM(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16), IdentityCondition(dropout=0.0), **kw
    )


def test_edm_update_and_sample():
    engine = make_edm()
    x0, cond = _x_cond()
    log = engine.update(x0, cond)
    assert np.isfinite(log["loss"])
    for solver in ("euler", "heun"):
        out, _ = engine.sample(
            jnp.zeros((4, ACT)), solver=solver, sample_steps=4,
            condition_cfg=jnp.asarray(cond[:4]), w_cfg=1.0,
        )
        assert out.shape == (4, ACT)
        assert np.all(np.isfinite(np.asarray(out)))


def test_edm_preconditioning_identities():
    engine = make_edm(sigma_data=0.5)
    sigma = jnp.asarray([0.002, 1.0, 80.0])
    cs, co, ci = engine.c_skip(sigma), engine.c_out(sigma), engine.c_in(sigma)
    # EDM invariants: c_skip^2 + (c_out/sigma_data*...)— check boundary behavior
    np.testing.assert_allclose(np.asarray(cs)[0], 1.0, atol=1e-4)  # low noise: skip ~ 1
    assert np.asarray(cs)[-1] < 1e-4  # high noise: skip ~ 0
    np.testing.assert_allclose(
        np.asarray(ci), 1 / np.sqrt(0.25 + np.asarray(sigma) ** 2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(co), np.asarray(sigma) * 0.5 / np.sqrt(0.25 + np.asarray(sigma) ** 2),
        rtol=1e-5,
    )


@pytest.mark.parametrize("cls", [DiscreteRectifiedFlow, ContinuousRectifiedFlow])
def test_rf_update_and_sample(cls):
    kwargs = {"diffusion_steps": 32} if cls is DiscreteRectifiedFlow else {}
    engine = cls(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16), IdentityCondition(dropout=0.0), **kwargs
    )
    x0, cond = _x_cond()
    log = engine.update(x0, cond)
    assert np.isfinite(log["loss"])
    out, _ = engine.sample(
        jnp.zeros((4, ACT)), sample_steps=4, condition_cfg=jnp.asarray(cond[:4]), w_cfg=1.0
    )
    assert out.shape == (4, ACT)
    assert np.all(np.isfinite(np.asarray(out)))
    # reflow-style update with explicit x1
    x1 = np.random.randn(8, ACT).astype(np.float32)
    log = engine.update(x0, cond, x1=jnp.asarray(x1))
    assert np.isfinite(log["loss"])


def test_rf_one_step_straight_flow():
    """A perfectly straight learned flow recovers x0 in ONE Euler step."""
    import flax.linen as nn

    x0_true = jnp.asarray(np.random.randn(1, ACT).astype(np.float32))

    class OracleVel(nn.Module):
        @nn.compact
        def __call__(self, x, t, emb=None, train=False):
            # v = x0 - x1; for straight flow from xt: x1 = (xt - (1-t)x0)/t
            tt = t[:, None].astype(jnp.float32)
            x1 = (x - (1 - tt) * x0_true) / jnp.maximum(tt, 1e-6)
            return x0_true - x1

        # continuous t in [0,1]

    engine = ContinuousRectifiedFlow(OracleVel())
    engine.init(jnp.zeros((4, ACT)))
    out, _ = engine.sample(jnp.zeros((4, ACT)), sample_steps=1)
    np.testing.assert_allclose(np.asarray(out), np.tile(np.asarray(x0_true), (4, 1)), atol=1e-3)


def test_cm_training_and_sample():
    engine = ContinuousConsistencyModel(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        IdentityCondition(dropout=0.0),
        s0=4,
        s1=8,
        curriculum_cycle=100,
    )
    x0, cond = _x_cond()
    for _ in range(3):
        log = engine.update(x0, cond, loss_type="training")
        assert np.isfinite(log["loss"])
    assert engine.cur_logger.k == 3
    out, _ = engine.sample(jnp.zeros((4, ACT)), sample_steps=3, condition_cfg=jnp.asarray(cond[:4]))
    assert out.shape == (4, ACT)
    assert np.all(np.isfinite(np.asarray(out)))
    # one-step sampling
    out1, _ = engine.sample(jnp.zeros((4, ACT)), sample_steps=1)
    assert np.all(np.isfinite(np.asarray(out1)))


def test_cm_distillation():
    edm = make_edm()
    x0, cond = _x_cond()
    edm.update(x0, cond)
    cm = ContinuousConsistencyModel(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16), IdentityCondition(dropout=0.0)
    )
    cm.prepare_distillation(edm, distillation_N=6)
    log = cm.update(x0, cond, loss_type="distillation")
    assert np.isfinite(log["loss"])
    out, _ = cm.sample(jnp.zeros((4, ACT)), sample_steps=2, condition_cfg=jnp.asarray(cond[:4]))
    assert np.all(np.isfinite(np.asarray(out)))


def test_cm_distillation_property_mismatch_raises():
    edm = make_edm(sigma_data=0.7)
    edm.init(jnp.zeros((2, ACT)))
    cm = ContinuousConsistencyModel(DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16))
    with pytest.raises(ValueError):
        cm.prepare_distillation(edm)
