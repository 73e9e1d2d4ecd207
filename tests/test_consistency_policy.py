"""Staged consistency-policy pipeline smoke test."""

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoTDDataset, fake_d4rl_qlearning_dataset
from cleandiffuser_tpu.pipelines import ConsistencyPolicyPipeline


def test_consistency_policy_stages():
    ds = D4RLMuJoCoTDDataset(fake_d4rl_qlearning_dataset(n_steps=800, ep_len=100))
    pipe = ConsistencyPolicyPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, hidden_dim=64,
        s0=4, s1=8, curriculum_cycle=50,
    )
    rng = jax.random.PRNGKey(0)

    batch = ds.sample_batch(rng, 32)
    log = pipe.iql_train_step(batch)
    assert np.isfinite(log["loss_v"]) and np.isfinite(log["loss_q"])

    log = pipe.edm_train_step(batch)
    assert np.isfinite(log["loss"])

    pipe.prepare_distillation(distillation_N=6)
    log = pipe.cd_train_step(batch)
    assert np.isfinite(log["loss"])

    log = pipe.ct_train_step(batch)
    assert np.isfinite(log["loss"])

    obs = np.random.randn(3, ds.o_dim).astype(np.float32)
    for model, steps in [("edm", 3), ("cd", 2), ("ct", 1)]:
        act = pipe.act(obs, model=model, num_candidates=4, sampling_steps=steps)
        assert act.shape == (3, ds.a_dim)
        assert np.all(np.abs(np.asarray(act)) <= 1.0 + 1e-5)
