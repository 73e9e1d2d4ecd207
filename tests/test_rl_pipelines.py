"""Smoke tests for IDQL, EDP, SfBC, QGPO, SynthER pipelines."""

import jax
import numpy as np

from cleandiffuser_tpu.dataset import (
    D4RLMuJoCoDataset,
    D4RLMuJoCoTDDataset,
    fake_d4rl_dataset,
    fake_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.edp import EDPPipeline
from cleandiffuser_tpu.pipelines.idql import IDQLPipeline
from cleandiffuser_tpu.pipelines.qgpo import QGPOPipeline
from cleandiffuser_tpu.pipelines.sfbc import SfBCPipeline
from cleandiffuser_tpu.pipelines.synther import SynthERPipeline, TD3BC
from cleandiffuser_tpu.utils.normalizers import GaussianNormalizer


def _td_ds(n=1500):
    return D4RLMuJoCoTDDataset(fake_d4rl_qlearning_dataset(n_steps=n, ep_len=150))


def test_idql():
    ds = _td_ds()
    pipe = IDQLPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=100,
                        actor_hidden_dim=64, critic_hidden_dim=64)
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        log = pipe.train_step(ds.sample_batch(k, 16))
        assert all(np.isfinite(v) for v in log.values())
    act = pipe.act(np.random.randn(3, ds.o_dim).astype(np.float32), num_candidates=8)
    assert act.shape == (3, ds.a_dim)


def test_edp():
    ds = _td_ds()
    pipe = EDPPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=100,
                       sampling_steps=5)
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        log = pipe.train_step(ds.sample_batch(k, 16))
        assert all(np.isfinite(v) for v in log.values())
    act = pipe.act(np.random.randn(3, ds.o_dim).astype(np.float32), num_candidates=8)
    assert act.shape == (3, ds.a_dim)


def test_sfbc():
    raw = fake_d4rl_dataset(n_steps=1200, ep_len=60)
    ds = D4RLMuJoCoDataset(raw, horizon=4, max_path_length=60)
    pipe = SfBCPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, hidden_dim=64,
                        monte_carlo_samples=2)
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        rng, k = jax.random.split(rng)
        log = pipe.bc_train_step(ds.sample_batch(k, 8))
        assert np.isfinite(log["loss"])
    # critic training on dataset windows
    batch = ds.sample_batch(jax.random.PRNGKey(1), 8)
    val_normalizer = GaussianNormalizer(ds.seq_val)
    obs = np.asarray(batch["obs"]["state"]).reshape(-1, ds.o_dim)
    act = np.asarray(batch["act"]).reshape(-1, ds.a_dim)
    val = np.random.randn(obs.shape[0], 1).astype(np.float32)
    log = pipe.critic_train_step(obs, act, val)
    assert np.isfinite(log["critic_loss"])
    # MC re-evaluation over a small slab of trajectories
    new_val, new_norm = pipe.monte_carlo_reevaluate(
        ds.seq_obs[:2], ds.seq_rew[:2], ds.seq_val[:2], ds.tml_and_not_timeout[:0],
        val_normalizer, sampling_steps=2, batch_paths=2,
    )
    assert new_val.shape == ds.seq_val[:2].shape
    assert np.all(np.isfinite(new_val))
    act_out = pipe.act(np.random.randn(2, ds.o_dim).astype(np.float32),
                       num_candidates=4, top_k_average=2, sampling_steps=2)
    assert act_out.shape == (2, ds.a_dim)


def test_qgpo():
    ds = _td_ds(800)
    pipe = QGPOPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, K=4)
    rng = jax.random.PRNGKey(0)
    log = pipe.bc_train_step(ds.sample_batch(rng, 16))
    assert np.isfinite(log["loss"])
    sup = pipe.collect_supported_actions(ds.next_obs[:64], batch_size=32, sampling_steps=2)
    assert sup.shape == (64, 4, ds.a_dim)
    batch = ds.sample_batch(jax.random.PRNGKey(1), 16)
    batch = dict(batch)
    batch["supported_act"] = sup[:16]
    log = pipe.q_train_step(batch)
    assert np.isfinite(log["q_loss"])
    log = pipe.cep_train_step(batch)
    assert np.isfinite(log["loss"])
    act = pipe.act(np.random.randn(2, ds.o_dim).astype(np.float32), w_cg=1.0,
                   num_candidates=4, sampling_steps=2)
    assert act.shape == (2, ds.a_dim)


def test_synther_and_td3bc():
    ds = _td_ds(800)
    pipe = SynthERPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=8,
                           hidden_dim=64, n_blocks=2, gradient_steps=100)
    rng = jax.random.PRNGKey(0)
    log = pipe.train_step(ds.sample_batch(rng, 16))
    assert np.isfinite(log["loss"])
    trans = pipe.generate_transitions(40, batch_size=32, sampling_steps=4)
    assert trans.shape == (40, ds.o_dim * 2 + ds.a_dim + 2)
    assert np.all(np.isfinite(trans))
    # chunk clamps to the request and distinct (batch, steps) recompile
    trans_small = pipe.generate_transitions(8, batch_size=10_000, sampling_steps=2)
    assert trans_small.shape == (8, ds.o_dim * 2 + ds.a_dim + 2)
    assert set(pipe._gen_fns) == {(32, 4), (8, 2)}

    agent = TD3BC(obs_dim=ds.o_dim, act_dim=ds.a_dim, gradient_steps=100)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        log = agent.update(ds.sample_batch(k, 16))
        assert all(np.isfinite(v) for v in log.values())
    act = agent.act(np.random.randn(3, ds.o_dim).astype(np.float32))
    assert act.shape == (3, ds.a_dim)
