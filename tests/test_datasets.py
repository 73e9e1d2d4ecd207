"""Hermetic dataset tests using synthetic D4RL-format data."""

import jax
import numpy as np
import pytest

from cleandiffuser_tpu.dataset import (
    D4RLAntmazeDataset,
    D4RLAntmazeTDDataset,
    D4RLKitchenDataset,
    D4RLMuJoCoDataset,
    D4RLMuJoCoTDDataset,
    DV_D4RLMuJoCoSeqDataset,
    MultiHorizonD4RLMuJoCoDataset,
    fake_d4rl_dataset,
    fake_d4rl_qlearning_dataset,
)


@pytest.fixture(scope="module")
def raw():
    return fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=3000, ep_len=200)


@pytest.fixture(scope="module")
def raw_td():
    return fake_d4rl_qlearning_dataset("halfcheetah-medium-v2", n_steps=3000, ep_len=200)


def test_seq_dataset_shapes(raw):
    ds = D4RLMuJoCoDataset(raw, horizon=16, max_path_length=200)
    assert len(ds) > 0
    item = ds[0]
    assert item["obs"]["state"].shape == (16, 17)
    assert item["act"].shape == (16, 6)
    assert item["rew"].shape == (16, 1)
    assert item["val"].shape == (1,)

    batch = ds.sample_batch(jax.random.PRNGKey(0), 32)
    assert batch["obs"]["state"].shape == (32, 16, 17)
    assert batch["act"].shape == (32, 6)[0:1] + (16, 6)  # (32, 16, 6)
    assert batch["val"].shape == (32, 1)


def test_seq_dataset_device_matches_host(raw):
    """The device gather must agree with host __getitem__."""
    ds = D4RLMuJoCoDataset(raw, horizon=8, max_path_length=200)
    batch = ds.sample_batch(jax.random.PRNGKey(1), 4)
    # verify each device row corresponds to SOME valid window with matching stats
    obs = np.asarray(batch["obs"]["state"])
    assert np.all(np.isfinite(obs))
    # check a specific known index through both paths
    path_idx, start = ds.indices[5]
    host = ds[5]
    np.testing.assert_allclose(
        host["obs"]["state"], ds.seq_obs[path_idx, start : start + 8], atol=0
    )


def test_mc_value_recursion(raw):
    ds = D4RLMuJoCoDataset(raw, horizon=4, max_path_length=200, discount=0.99)
    # val[t] = rew[t] + discount * val[t+1]
    v = ds.seq_val[0]
    r = ds.seq_rew[0]
    np.testing.assert_allclose(v[:-1], r[:-1] + 0.99 * v[1:], rtol=1e-4, atol=1e-4)


def test_terminal_penalty():
    raw = fake_d4rl_dataset("halfcheetah-medium-v2", n_steps=3000, ep_len=150, seed=3)
    ds = D4RLMuJoCoDataset(raw, horizon=4, max_path_length=150, terminal_penalty=-100)
    if len(ds.tml_and_not_timeout):
        p, t = ds.tml_and_not_timeout[0]
        assert ds.seq_rew[p, t, 0] == -100.0


def test_td_dataset(raw_td):
    ds = D4RLMuJoCoTDDataset(raw_td)
    item = ds[0]
    assert item["obs"]["state"].shape == (17,)
    assert item["next_obs"]["state"].shape == (17,)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 64)
    assert batch["obs"]["state"].shape == (64, 17)
    assert batch["act"].shape == (64, 6)
    assert batch["rew"].shape == (64, 1)
    assert batch["tml"].shape == (64, 1)
    # normalized obs should be ~zero-mean unit-var
    assert abs(float(ds.obs.mean())) < 0.1


def test_multi_horizon(raw):
    ds = MultiHorizonD4RLMuJoCoDataset(raw, horizons=(8, 16), max_path_length=200)
    items = ds[0]
    assert items[0]["horizon"] == 8
    assert items[0]["data"]["obs"]["state"].shape == (8, 17)
    assert items[1]["data"]["obs"]["state"].shape == (16, 17)
    b0 = ds.sample_batch(jax.random.PRNGKey(0), 16, horizon_idx=0)
    b1 = ds.sample_batch(jax.random.PRNGKey(0), 16, horizon_idx=1)
    assert b0["obs"]["state"].shape == (16, 8, 17)
    assert b1["obs"]["state"].shape == (16, 16, 17)


def test_dv_dataset_stride(raw):
    ds = DV_D4RLMuJoCoSeqDataset(raw, horizon=4, max_path_length=200, stride=2)
    item = ds[0]
    assert item["obs"]["state"].shape == (4, 17)
    assert ds.seq_val.min() >= -1 - 1e-6 and ds.seq_val.max() <= 1 + 1e-6
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    assert batch["obs"]["state"].shape == (8, 4, 17)
    # stride gather equals host strided window
    path_idx, start = ds.indices[0]
    np.testing.assert_allclose(
        ds[0]["obs"]["state"], ds.seq_obs[path_idx, start : start + 7 : 2]
    )


def test_antmaze_dataset():
    raw = fake_d4rl_dataset("antmaze-medium-play-v2", n_steps=3000, ep_len=300)
    ds = D4RLAntmazeDataset(raw, horizon=8, max_path_length=301)
    assert len(ds) > 0
    assert ds[0]["obs"]["state"].shape == (8, 29)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    assert batch["obs"]["state"].shape == (8, 8, 29)


def test_antmaze_td_reward_tune():
    raw = fake_d4rl_qlearning_dataset("antmaze-medium-play-v2", n_steps=2000, ep_len=300)
    ds_iql = D4RLAntmazeTDDataset(dict(raw), reward_tune="iql")
    ds_none = D4RLAntmazeTDDataset(dict(raw), reward_tune="none")
    np.testing.assert_allclose(ds_iql.rew, ds_none.rew - 1.0, atol=1e-6)


def test_kitchen_dataset():
    raw = fake_d4rl_dataset("kitchen-mixed-v0", n_steps=2000, ep_len=200)
    ds = D4RLKitchenDataset(raw, horizon=8, max_path_length=280)
    assert len(ds) > 0
    assert ds[0]["obs"]["state"].shape == (8, 60)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    assert batch["obs"]["state"].shape == (8, 8, 60)


def test_fake_dims_match_eval_envs():
    """Hermetic fallback data must carry the EVAL env's obs/act dims for
    every task tier the CLIs expose, including tiers absent from
    FAKE_ENV_SPECS (antmaze-umaze-v2 once fell back to halfcheetah's 17/6
    and broke hermetic inference on the 29-dim AntMaze wrapper)."""
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_qlearning_dataset

    for env_name, (o_dim, a_dim) in (
        ("antmaze-umaze-v2", (29, 8)),
        ("antmaze-umaze-diverse-v2", (29, 8)),
        ("antmaze-ultra-play-v2", (29, 8)),   # prefix fallback
        ("hopper-expert-v2", (11, 3)),        # prefix fallback
        ("kitchen-complete-v0", (60, 9)),     # prefix fallback
        ("maze2d-umaze-v1", (4, 2)),
    ):
        d = fake_d4rl_qlearning_dataset(env_name, n_steps=64, ep_len=16)
        assert d["observations"].shape[1] == o_dim, env_name
        assert d["actions"].shape[1] == a_dim, env_name
