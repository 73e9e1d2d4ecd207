"""Parallel-in-time (Picard) DDIM sampler: K batched sweeps over the whole
denoise grid instead of N sequential net calls (ParaDiGMS, arXiv:2305.16317;
PAPERS.md). Exactness: the triangular system converges to sequential DDIM in
K = N sweeps; useful K is much smaller."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.diffusion import ContinuousDiffusionSDE, DiscreteDiffusionSDE
from cleandiffuser_tpu.nn_condition import MLPCondition
from cleandiffuser_tpu.nn_diffusion import DQLMlp

OBS, ACT, B, N = 5, 3, 8, 12


def _engine(cls, **kw):
    eng = cls(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        MLPCondition(in_dim=OBS, out_dim=16, hidden_dims=(16,)),
        rng=0,
        **kw,
    )
    prior = jnp.zeros((B, ACT))
    cond = jnp.asarray(np.random.RandomState(0).randn(B, OBS), jnp.float32)
    eng.init(prior, cond)
    return eng, prior, cond


@pytest.mark.parametrize("cls,kw", [
    (DiscreteDiffusionSDE, {"diffusion_steps": N}),
    (ContinuousDiffusionSDE, {}),
])
def test_picard_full_sweeps_match_sequential_ddim(cls, kw):
    eng, prior, cond = _engine(cls, **kw)
    rng = jax.random.PRNGKey(3)
    x_seq, _ = eng.sample(prior, solver="ddim", sample_steps=N,
                          condition_cfg=cond, w_cfg=1.0, rng=rng)
    x_par, log = eng.sample_parallel(prior, sample_steps=N, picard_iters=N,
                                     condition_cfg=cond, w_cfg=1.0, rng=rng)
    np.testing.assert_allclose(np.asarray(x_par), np.asarray(x_seq),
                               atol=2e-4, rtol=1e-3)
    assert float(log["picard_residual"]) < 1e-4


def test_picard_few_sweeps_close_and_residual_monotone():
    eng, prior, cond = _engine(DiscreteDiffusionSDE, diffusion_steps=N)
    rng = jax.random.PRNGKey(5)
    x_seq, _ = eng.sample(prior, solver="ddim", sample_steps=N,
                          condition_cfg=cond, w_cfg=1.0, rng=rng)
    x_par, _ = eng.sample_parallel(prior, sample_steps=N, picard_iters=N // 2,
                                   condition_cfg=cond, w_cfg=1.0, rng=rng)
    err = np.max(np.abs(np.asarray(x_par) - np.asarray(x_seq)))
    scale = max(np.max(np.abs(np.asarray(x_seq))), 1.0)
    assert err / scale < 0.05, err

    # more sweeps -> smaller error
    x_more, _ = eng.sample_parallel(prior, sample_steps=N,
                                    picard_iters=N - 2,
                                    condition_cfg=cond, w_cfg=1.0, rng=rng)
    err_more = np.max(np.abs(np.asarray(x_more) - np.asarray(x_seq)))
    assert err_more <= err + 1e-6


def test_picard_uncond_and_cfg_mix_run():
    # uncond: engine trained without a condition branch
    eng_u = DiscreteDiffusionSDE(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        diffusion_steps=N, rng=0)
    prior = jnp.zeros((B, ACT))
    eng_u.init(prior, jnp.zeros((B, OBS)))
    x_u, _ = eng_u.sample_parallel(prior, sample_steps=N, picard_iters=4,
                                   rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x_u)).all()
    # CFG mix (doubled batch inside the sweep)
    eng, prior, cond = _engine(DiscreteDiffusionSDE, diffusion_steps=N)
    x_m, _ = eng.sample_parallel(prior, sample_steps=N, picard_iters=4,
                                 condition_cfg=cond, w_cfg=1.5,
                                 rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x_m)).all()


def test_picard_respects_fix_mask():
    fix_mask = np.zeros((ACT,), np.float32)
    fix_mask[0] = 1.0
    eng = DiscreteDiffusionSDE(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        MLPCondition(in_dim=OBS, out_dim=16, hidden_dims=(16,)),
        fix_mask=fix_mask, diffusion_steps=N, rng=0)
    prior = jnp.asarray(np.random.RandomState(2).randn(B, ACT), jnp.float32)
    cond = jnp.asarray(np.random.RandomState(0).randn(B, OBS), jnp.float32)
    eng.init(prior, cond)
    x, _ = eng.sample_parallel(prior, sample_steps=N, picard_iters=4,
                               condition_cfg=cond, w_cfg=1.0,
                               rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(x)[:, 0], np.asarray(prior)[:, 0],
                               atol=1e-6)
