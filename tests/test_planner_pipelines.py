"""End-to-end smoke tests for Diffuser and Decision Diffuser pipelines."""

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset, fake_d4rl_dataset
from cleandiffuser_tpu.pipelines.dd import DDPipeline
from cleandiffuser_tpu.pipelines.diffuser import DiffuserPipeline


def test_diffuser_train_and_plan():
    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=2000, ep_len=200)
    ds = D4RLMuJoCoDataset(raw, horizon=8, max_path_length=200)
    pipe = DiffuserPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, horizon=8, model_dim=16,
        diffusion_steps=8, sampling_steps=4,
        diffusion_gradient_steps=100, classifier_gradient_steps=100,
    )
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        log = pipe.train_step(ds.sample_batch(k, 8))
        assert np.isfinite(log["loss"])
        assert np.isfinite(log["classifier_loss"])

    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    act, info = pipe.act(obs, num_candidates=4)
    assert act.shape == (2, ds.a_dim)
    assert np.all(np.abs(np.asarray(act)) <= 1.0)
    assert info["traj"].shape == (2, 8, ds.o_dim + ds.a_dim)
    # first-state inpainting must pin the observed state
    np.testing.assert_allclose(
        np.asarray(info["traj"])[:, 0, : ds.o_dim], obs, atol=1e-4
    )


def test_dd_train_and_plan():
    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=2000, ep_len=200)
    ds = D4RLMuJoCoDataset(raw, horizon=8, max_path_length=200)
    pipe = DDPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, horizon=8,
        emb_dim=32, d_model=64, n_heads=4, depth=2,
        diffusion_gradient_steps=100, invdyn_gradient_steps=100,
        sampling_steps=4, return_scale=100.0,
    )
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        log = pipe.train_step(ds.sample_batch(k, 8))
        assert np.isfinite(log["loss"])
        assert np.isfinite(log["invdyn_loss"])

    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    act, info = pipe.act(obs, target_return=0.9)
    assert act.shape == (2, ds.a_dim)
    assert np.all(np.abs(np.asarray(act)) <= 1.0)
    np.testing.assert_allclose(np.asarray(info["traj"])[:, 0], obs, atol=1e-4)
