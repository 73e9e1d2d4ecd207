"""Engine tests for Discrete/Continuous DiffusionSDE.

Mirrors reference tests/test_diffusion_sde.py strategy: build engines with a
small backbone, run `update` and `sample` across all solver strings, check
finiteness + shapes. Adds golden math tests the reference lacks: DDIM with
an exact (zero-eps) model must invert the forward process on a linear toy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.classifier import CumRewClassifier, MSEClassifier
from cleandiffuser_tpu.diffusion import (
    SUPPORTED_SOLVERS,
    ContinuousDiffusionSDE,
    DiscreteDiffusionSDE,
)
from cleandiffuser_tpu.nn_classifier import MLPNNClassifier
from cleandiffuser_tpu.nn_condition import IdentityCondition, MLPCondition
from cleandiffuser_tpu.nn_diffusion import DQLMlp, MlpNNDiffusion

OBS, ACT = 7, 3


def make_discrete(**kw):
    return DiscreteDiffusionSDE(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        IdentityCondition(dropout=0.0),
        diffusion_steps=32,
        **kw,
    )


def make_continuous(**kw):
    return ContinuousDiffusionSDE(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        IdentityCondition(dropout=0.0),
        **kw,
    )


@pytest.mark.parametrize("make", [make_discrete, make_continuous])
def test_update_finite(make):
    engine = make()
    x0 = np.random.randn(8, ACT).astype(np.float32)
    cond = np.random.randn(8, OBS).astype(np.float32)
    log = engine.update(x0, cond)
    assert np.isfinite(log["loss"])
    log2 = engine.update(x0, cond)
    assert np.isfinite(log2["loss"])
    assert int(engine.state.step) == 2


@pytest.mark.parametrize("solver", SUPPORTED_SOLVERS)
@pytest.mark.parametrize("make", [make_discrete, make_continuous])
def test_sample_all_solvers(make, solver):
    engine = make()
    x0 = np.random.randn(4, ACT).astype(np.float32)
    cond = np.random.randn(4, OBS).astype(np.float32)
    engine.update(x0, cond)
    prior = jnp.zeros((4, ACT))
    out, log = engine.sample(prior, solver=solver, sample_steps=4, condition_cfg=cond, w_cfg=1.0)
    assert out.shape == (4, ACT)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sample_cfg_mix_and_temperature():
    engine = make_discrete()
    x0 = np.random.randn(4, ACT).astype(np.float32)
    cond = np.random.randn(4, OBS).astype(np.float32)
    engine.update(x0, cond)
    prior = jnp.zeros((4, ACT))
    out, _ = engine.sample(
        prior, solver="ddim", sample_steps=4, condition_cfg=cond, w_cfg=1.5, temperature=0.5
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_sample_history():
    engine = make_discrete()
    x0 = np.random.randn(2, ACT).astype(np.float32)
    engine.update(x0)
    out, log = engine.sample(jnp.zeros((2, ACT)), solver="ddpm", sample_steps=5, preserve_history=True)
    assert log["sample_history"].shape == (2, 5, ACT)


def test_fix_mask_pins_prior():
    fix_mask = np.zeros((ACT,), np.float32)
    fix_mask[0] = 1.0
    engine = make_discrete(fix_mask=fix_mask)
    x0 = np.random.randn(4, ACT).astype(np.float32)
    engine.update(x0)
    prior = jnp.asarray(np.tile(np.array([[5.0, 0.0, 0.0]], np.float32), (4, 1)))
    out, _ = engine.sample(prior, solver="ddpm", sample_steps=4)
    np.testing.assert_allclose(np.asarray(out)[:, 0], 5.0, atol=1e-5)


def test_clip_prediction():
    engine = make_discrete(x_max=jnp.ones(ACT), x_min=-jnp.ones(ACT))
    x0 = np.random.randn(4, ACT).astype(np.float32)
    engine.update(x0)
    out, _ = engine.sample(jnp.zeros((4, ACT)), solver="ddpm", sample_steps=4)
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-5)


def test_diffusion_x_steps():
    engine = make_discrete()
    engine.update(np.random.randn(2, ACT).astype(np.float32))
    out, _ = engine.sample(
        jnp.zeros((2, ACT)), solver="ddpm", sample_steps=4, diffusion_x_sampling_steps=3
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_warm_start():
    engine = make_discrete()
    engine.update(np.random.randn(2, ACT).astype(np.float32))
    ref = jnp.ones((2, ACT)) * 0.3
    out, _ = engine.sample(
        jnp.zeros((2, ACT)),
        solver="ddim",
        sample_steps=4,
        warm_start_reference=ref,
        warm_start_forward_level=0.5,
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_classifier_guided_sampling():
    nn_cls = MLPNNClassifier(x_dim=ACT, out_dim=1, emb_dim=16, hidden_dims=(32,))
    classifier = CumRewClassifier(nn_cls)
    engine = make_discrete(classifier=classifier)
    x0 = np.random.randn(4, ACT).astype(np.float32)
    R = np.random.randn(4, 1).astype(np.float32)
    engine.update(x0)
    xt, t, _ = engine.add_noise(jax.random.PRNGKey(0), jnp.asarray(x0))
    classifier.update(xt, t, jnp.asarray(R))
    out, log = engine.sample(
        jnp.zeros((4, ACT)), solver="ddpm", sample_steps=4, condition_cg=jnp.asarray(R), w_cg=1.0
    )
    assert np.all(np.isfinite(np.asarray(out)))
    assert log["log_p"].shape == (4, 1)


def test_mse_classifier_gradients():
    nn_cls = MLPNNClassifier(x_dim=ACT, out_dim=2, emb_dim=16, hidden_dims=(32,))
    classifier = MSEClassifier(nn_cls, temperature=2.0)
    x = jnp.asarray(np.random.randn(4, ACT).astype(np.float32))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.asarray(np.random.randn(4, 2).astype(np.float32))
    classifier.init(x, t, y)
    logp, grad = classifier.gradients(classifier.inference_params, x, t, y)
    assert logp.shape == (4, 1)
    assert grad.shape == x.shape
    assert np.all(np.isfinite(np.asarray(grad)))


def test_ddim_inverts_forward_exactly():
    """With a perfect eps-model (returning the true eps used in forward
    diffusion of a known x0), DDIM from any start must recover x0 at the
    final step when starting at the correct noisy point.

    We use the analytic solution: if model predicts eps* = (xt - alpha*x0)/sigma
    for a fixed known x0, then every DDIM step maps xt exactly onto the
    trajectory of x0, so the terminal sample equals alpha_0 x0 + sigma_0 eps0
    with eps0 determined by initial condition. For eps* consistent with
    x_theta == x0, DDIM yields x_theta at every step, so final x ~= x0 as
    sigma_0 -> ~0.
    """
    import flax.linen as nn

    T = 128

    class Oracle(nn.Module):
        x0: jnp.ndarray
        alpha: jnp.ndarray
        sigma: jnp.ndarray

        @nn.compact
        def __call__(self, x, t, emb=None, train=False):
            a = self.alpha[t][:, None]
            s = self.sigma[t][:, None]
            return (x - a * self.x0) / s

    x0_true = jnp.asarray(np.random.randn(1, ACT).astype(np.float32))
    tmp = DiscreteDiffusionSDE(
        DQLMlp(obs_dim=OBS, act_dim=ACT), diffusion_steps=T, noise_schedule="linear"
    )
    oracle = Oracle(x0=x0_true, alpha=tmp.alpha, sigma=tmp.sigma)
    engine = DiscreteDiffusionSDE(oracle, diffusion_steps=T, noise_schedule="linear")
    engine.init(jnp.zeros((4, ACT)))
    out, _ = engine.sample(jnp.zeros((4, ACT)), solver="ddim", sample_steps=32)
    np.testing.assert_allclose(np.asarray(out), np.tile(x0_true, (4, 1)), atol=0.05)


def test_x0_prediction_mode():
    engine = DiscreteDiffusionSDE(
        DQLMlp(obs_dim=OBS, act_dim=ACT), diffusion_steps=16, predict_noise=False
    )
    x0 = np.random.randn(4, ACT).astype(np.float32)
    log = engine.update(x0)
    assert np.isfinite(log["loss"])
    out, _ = engine.sample(jnp.zeros((4, ACT)), solver="ddpm", sample_steps=4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_condition_mlp_cfg_training():
    engine = DiscreteDiffusionSDE(
        MlpNNDiffusion(x_dim=ACT, emb_dim=32),
        MLPCondition(in_dim=OBS, out_dim=32, hidden_dims=(32,)),
        diffusion_steps=16,
    )
    x0 = np.random.randn(8, ACT).astype(np.float32)
    cond = np.random.randn(8, OBS).astype(np.float32)
    log = engine.update(x0, cond)
    assert np.isfinite(log["loss"])
    out, _ = engine.sample(
        jnp.zeros((4, ACT)), sample_steps=4, condition_cfg=jnp.asarray(cond[:4]), w_cfg=1.2
    )
    assert out.shape == (4, ACT)


def test_save_load_roundtrip(tmp_path):
    engine = make_discrete()
    x0 = np.random.randn(4, ACT).astype(np.float32)
    engine.update(x0)
    p = str(tmp_path / "ckpt.pkl")
    engine.save(p)
    before = jax.tree_util.tree_leaves(engine.state.params)[0].copy()
    engine.update(x0)
    engine.load(p)
    after = jax.tree_util.tree_leaves(engine.state.params)[0]
    np.testing.assert_allclose(np.asarray(before), np.asarray(after), atol=1e-7)
