"""End-to-end smoke test for the DQL pipeline on synthetic data."""

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoTDDataset, fake_d4rl_qlearning_dataset
from cleandiffuser_tpu.pipelines.dql import DQLPipeline


def test_dql_train_and_act():
    raw = fake_d4rl_qlearning_dataset("halfcheetah-medium-v2", n_steps=2000, ep_len=200)
    ds = D4RLMuJoCoTDDataset(raw)
    pipe = DQLPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim,
        diffusion_steps=5, sampling_steps=5, gradient_steps=100,
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        rng, k = jax.random.split(rng)
        batch = ds.sample_batch(k, 32)
        log = pipe.train_step(batch)
        losses.append(float(log["bc_loss"]))
    assert all(np.isfinite(losses))
    assert int(pipe.actor.state.step) == 5

    obs = np.random.randn(4, ds.o_dim).astype(np.float32)
    act = pipe.act(obs, num_candidates=8)
    assert act.shape == (4, ds.a_dim)
    assert np.all(np.abs(np.asarray(act)) <= 1.0 + 1e-5)


def test_dql_save_load(tmp_path):
    raw = fake_d4rl_qlearning_dataset(n_steps=1000, ep_len=100)
    ds = D4RLMuJoCoTDDataset(raw)
    pipe = DQLPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=10)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
    pipe.train_step(batch)
    p = str(tmp_path / "dql.pkl")
    pipe.save(p)
    pipe2 = DQLPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=10)
    pipe2.load(p)
    a = jax.tree_util.tree_leaves(pipe.actor.state.params)[0]
    b = jax.tree_util.tree_leaves(pipe2.actor.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
