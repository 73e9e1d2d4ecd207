"""VE / VP / iDDPM-DDIM Karras-ODE engines (diffusion/karras_ode.py;
reference veode.py / vpode.py / edmddim.py).

Strategy mirrors tests/test_diffusion_sde.py: (a) golden table checks of the
closed-form schedules, (b) oracle-network convergence — with a network that
makes D(x; sigma) == x0 exactly, the probability-flow ODE must transport any
initial noise onto x0 as sigma -> sigma_min, (c) end-to-end train/sample
smoke with a real MLP backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.diffusion import EDMDDIM, VEODE, VPODE
from cleandiffuser_tpu.nn_diffusion import DQLMlp

OBS, ACT = 3, 2


class _Oracle:
    """flax-free oracle module factory: F such that D == x0."""

    def __new__(cls, engine, x0):
        import flax.linen as nn

        inv = {
            VEODE: lambda tn: 2.0 * jnp.exp(tn),
            VPODE: lambda tn: engine._sigma_of_t(tn / (engine.diffusion_steps - 1)),
            EDMDDIM: lambda tn: tn,
        }[type(engine)]

        class Oracle(nn.Module):
            @nn.compact
            def __call__(self, xin, tn, emb=None, train=False):
                sigma = inv(tn)
                ci = engine.c_in(sigma)[:, None]
                cs = engine.c_skip(sigma)[:, None]
                co = engine.c_out(sigma)[:, None]
                x = xin / ci
                return (x0 - cs * x) / co

        return Oracle()


def _make(engine_cls, nn_diffusion=None, **kw):
    return engine_cls(nn_diffusion if nn_diffusion is not None
                      else DQLMlp(obs_dim=OBS, act_dim=ACT), **kw)


# ---------------------------------------------------------------------------
def test_ve_tables_golden():
    eng = _make(VEODE, sigma_min=0.02, sigma_max=100.0)
    t, sigma, scale = eng.ode_tables(10)
    assert len(sigma) == 11
    np.testing.assert_allclose(sigma[0], 100.0, rtol=1e-6)
    np.testing.assert_allclose(sigma[-1], 0.02, rtol=1e-6)
    # geometric grid: constant ratio
    r = sigma[1:] / sigma[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-5)
    np.testing.assert_allclose(t, sigma**2, rtol=1e-6)
    np.testing.assert_allclose(scale, 1.0)


def test_vp_tables_golden():
    eng = _make(VPODE, beta_min=0.1, beta_max=20.0)
    t, sigma, scale = eng.ode_tables(8)
    # sigma(t) = sqrt(exp(0.5 beta_d t^2 + beta_min t) - 1), scale = 1/sqrt(1+sigma^2)
    beta_d = 20.0 - 0.1
    np.testing.assert_allclose(
        sigma, np.sqrt(np.exp(0.5 * beta_d * t**2 + 0.1 * t) - 1.0), rtol=1e-6)
    np.testing.assert_allclose(scale, 1.0 / np.sqrt(1.0 + sigma**2), rtol=1e-6)
    assert t[0] == 1.0 and np.isclose(t[-1], 1e-3)
    # the VP forward marginal is variance-preserving: scale^2 (1 + sigma^2) == 1
    np.testing.assert_allclose(scale**2 * (1 + sigma**2), 1.0, rtol=1e-6)


def test_edmddim_tables_golden():
    eng = _make(EDMDDIM, diffusion_steps=100, j0=8)
    t, sigma, scale = eng.ode_tables(10)
    assert np.all(np.diff(sigma) < 0) and np.all(sigma > 0)
    np.testing.assert_allclose(t, sigma)
    np.testing.assert_allclose(scale, 1.0)
    # u-recursion consistency: u[j-1]^2 + 1 == (u[j]^2 + 1) * bar_ratio
    u = eng._u
    j = np.arange(100 + 1)
    bar = np.sin(j / (100 * (0.008 + 1)) * np.pi / 2.0) ** 2
    tmp = np.maximum(bar[:-1] / bar[1:], 0.001)
    np.testing.assert_allclose(
        (u[:-1] ** 2 + 1.0) * tmp[:-1], u[1:] ** 2 + 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("engine_cls,steps,atol", [
    (VEODE, 50, 0.08),
    (VPODE, 50, 0.08),
    (EDMDDIM, 50, 0.15),
])
def test_oracle_ode_converges_to_x0(engine_cls, steps, atol):
    x0_true = jnp.asarray(np.random.default_rng(0).standard_normal((1, ACT)),
                          jnp.float32)
    probe = _make(engine_cls)
    eng = _make(engine_cls, nn_diffusion=_Oracle(probe, x0_true))
    eng.init(jnp.zeros((4, ACT)))
    out, _ = eng.sample(jnp.zeros((4, ACT)), solver="euler", sample_steps=steps)
    np.testing.assert_allclose(np.asarray(out), np.tile(x0_true, (4, 1)),
                               atol=atol)


def test_oracle_heun_tightens_euler():
    x0_true = jnp.asarray(np.random.default_rng(1).standard_normal((1, ACT)),
                          jnp.float32)
    probe = _make(VEODE)
    eng = _make(VEODE, nn_diffusion=_Oracle(probe, x0_true))
    eng.init(jnp.zeros((8, ACT)))
    err = {}
    for solver in ("euler", "heun"):
        out, _ = eng.sample(jnp.zeros((8, ACT)), solver=solver, sample_steps=12,
                            rng=jax.random.PRNGKey(0))
        err[solver] = float(jnp.abs(out - x0_true).max())
    assert err["heun"] <= err["euler"] + 1e-6


@pytest.mark.parametrize("engine_cls", [VEODE, VPODE, EDMDDIM])
def test_train_and_sample_smoke(engine_cls):
    eng = _make(engine_cls)
    eng.init(jnp.zeros((4, ACT)), jnp.zeros((4, OBS)))
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((16, ACT)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((16, OBS)), jnp.float32)
    for _ in range(3):
        log = eng.update(x0, cond)
    assert np.isfinite(log["loss"])
    out, _ = eng.sample(jnp.zeros((4, ACT)), solver="euler", sample_steps=8,
                        condition_cfg=cond[:4], w_cfg=1.0)
    assert out.shape == (4, ACT)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_mix_mode_runs():
    eng = _make(VPODE)
    eng.init(jnp.zeros((2, ACT)), jnp.zeros((2, OBS)))
    out, _ = eng.sample(jnp.zeros((2, ACT)), solver="heun", sample_steps=6,
                        condition_cfg=jnp.zeros((2, OBS)), w_cfg=1.5)
    assert np.isfinite(np.asarray(out)).all()
