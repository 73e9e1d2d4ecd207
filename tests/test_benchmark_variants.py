"""Tests for the antmaze/kitchen/maze2d benchmark-variant machinery:
per-benchmark eval bookkeeping, max-Q backup, DD val_shift, and the
IQL-value-conditioned DiffuserLite helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------- eval loop
class _StubEnv:
    """Emits reward 1.0 on every step, terminates after `T` steps."""

    def __init__(self, T=5):
        self.T, self.t = T, 0

    @property
    def action_space(self):
        import gymnasium as gym

        return gym.spaces.Box(-1, 1, (2,))

    @property
    def observation_space(self):
        import gymnasium as gym

        return gym.spaces.Box(-np.inf, np.inf, (3,))

    def reset(self, seed=None, **kw):
        self.t = 0
        return np.zeros(3, np.float32), {}

    def step(self, action):
        self.t += 1
        return np.zeros(3, np.float32), 1.0, self.t >= self.T, False, {}

    def close(self):
        pass


class _IdNormalizer:
    def normalize(self, x):
        return x

    def unnormalize(self, x):
        return x


def _run_eval(reward_mode, monkeypatch, T=5, max_steps=10):
    from cleandiffuser_tpu.pipelines import runner

    monkeypatch.setattr(
        runner, "d4rl_eval_loop", runner.d4rl_eval_loop  # keep ref
    )
    import cleandiffuser_tpu.pipelines.data_loading as dl

    monkeypatch.setattr(
        dl, "make_eval_env_fns",
        lambda env_name, n: [lambda: _StubEnv(T) for _ in range(n)],
    )
    monkeypatch.setattr(dl, "get_normalized_score_fn", lambda env_name: (lambda r: r))
    return runner.d4rl_eval_loop(
        lambda nobs: np.zeros((2, 2), np.float32), "stub", _IdNormalizer(),
        num_envs=2, num_episodes=1, max_steps=max_steps,
        reward_mode=reward_mode,
    )


def test_eval_loop_antmaze_clips_to_one(monkeypatch):
    # 5 reward-1 steps then terminate -> raw 5, antmaze clips to 1
    rewards = _run_eval("antmaze", monkeypatch)
    assert np.allclose(rewards, 1.0)


def test_eval_loop_kitchen_clips_to_four(monkeypatch):
    rewards = _run_eval("kitchen", monkeypatch, T=8, max_steps=10)
    assert np.allclose(rewards, 4.0)


def test_eval_loop_mujoco_masks_after_done(monkeypatch):
    # mujoco bookkeeping freezes reward once cum_done is set: the step that
    # sets done is masked too -> 4 of the 5 reward-1 steps count
    rewards = _run_eval("mujoco", monkeypatch)
    assert np.allclose(rewards, 4.0)


def test_eval_loop_passes_ep_reward(monkeypatch):
    from cleandiffuser_tpu.pipelines import runner
    import cleandiffuser_tpu.pipelines.data_loading as dl

    monkeypatch.setattr(
        dl, "make_eval_env_fns",
        lambda env_name, n: [lambda: _StubEnv(3) for _ in range(n)],
    )
    monkeypatch.setattr(dl, "get_normalized_score_fn", lambda env_name: (lambda r: r))
    seen = []

    def act_fn(nobs, ep_reward=None):
        seen.append(None if ep_reward is None else ep_reward.copy())
        return np.zeros((1, 2), np.float32)

    runner.d4rl_eval_loop(act_fn, "stub", _IdNormalizer(), 1, 1,
                          max_steps=5, reward_mode="kitchen")
    assert seen[0] is not None and seen[0][0] == 0.0
    assert seen[1][0] == 1.0  # running reward reaches the policy


# ------------------------------------------------------------- max-Q backup
def test_dql_max_q_backup_train_step():
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_qlearning_dataset
    from cleandiffuser_tpu.dataset import D4RLAntmazeTDDataset
    from cleandiffuser_tpu.pipelines import DQLPipeline

    ds = D4RLAntmazeTDDataset(
        fake_d4rl_qlearning_dataset("antmaze-medium-play-v2", n_steps=2000)
    )
    pipe = DQLPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=2,
                       sampling_steps=2, gradient_steps=10, max_q_backup=4)
    log = pipe.train_step(ds.sample_batch(jax.random.PRNGKey(0), 8))
    assert np.isfinite(float(log["critic_loss"]))
    assert np.isfinite(float(log["bc_loss"]))


def test_edp_max_q_backup_train_step():
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_qlearning_dataset
    from cleandiffuser_tpu.dataset import D4RLAntmazeTDDataset
    from cleandiffuser_tpu.pipelines import EDPPipeline

    ds = D4RLAntmazeTDDataset(
        fake_d4rl_qlearning_dataset("antmaze-medium-play-v2", n_steps=2000)
    )
    pipe = EDPPipeline(obs_dim=ds.o_dim, act_dim=ds.a_dim, diffusion_steps=4,
                       sampling_steps=2, gradient_steps=10, max_q_backup=4)
    log = pipe.train_step(ds.sample_batch(jax.random.PRNGKey(0), 8))
    assert np.isfinite(float(log["critic_loss"]))


# ------------------------------------------------------------- DD val shift
def test_dd_val_shift_changes_condition_scale():
    from cleandiffuser_tpu.pipelines import DDPipeline

    pipe = DDPipeline(obs_dim=3, act_dim=2, horizon=4, emb_dim=16, d_model=32,
                      n_heads=2, depth=1, return_scale=100.0, val_shift=1.0,
                      diffusion_gradient_steps=10, invdyn_gradient_steps=10)
    batch = {
        "obs": {"state": np.random.randn(4, 4, 3).astype(np.float32)},
        "act": np.random.randn(4, 4, 2).astype(np.float32),
        "val": np.full((4, 1), -50.0, np.float32),
    }
    log = pipe.train_step(batch)
    assert np.isfinite(float(log["loss"]))


# ------------------------------------------- DiffuserLite value conditioning
def test_antmaze_level_values():
    from cleandiffuser_tpu.pipelines.diffuserlite_value import antmaze_level_values

    B, H = 2, 6
    rew = np.full((B, H, 1), -1.0, np.float32)  # iql-tuned step reward
    rew[0, 3] = 0.0  # success at t=3 in batch 0
    pred = np.full((B, H, 1), 0.5, np.float32)
    batch = {"rew": jnp.asarray(rew), "pred_val": jnp.asarray(pred)}

    v1 = np.asarray(antmaze_level_values(batch, level=1, discount=0.99))
    # success within window -> 1 / steps-to-success; none -> 0
    assert v1[0, 0] == pytest.approx(1.0 / 4.0)
    assert v1[1, 0] == pytest.approx(0.0)

    v0 = np.asarray(antmaze_level_values(batch, level=0, discount=0.99))
    assert np.all(np.isfinite(v0))
    # batch 1 never succeeds: val = (sum disc*(-1) masked w/ tail bootstrap)/100 + 1
    assert v0[1, 0] < 1.0


def test_kitchen_level_values():
    from cleandiffuser_tpu.pipelines.diffuserlite_value import kitchen_level_values

    rew = np.zeros((2, 4, 1), np.float32)
    rew[0, 1] = 1.0
    batch = {"rew": jnp.asarray(rew)}
    v0 = np.asarray(kitchen_level_values(batch, 0, discount=0.99))
    assert v0[0, 0] == pytest.approx(0.99 / 100.0)
    v1 = np.asarray(kitchen_level_values(batch, 1, discount=0.99))
    assert v1[0, 0] == pytest.approx(0.25)


def test_iql_value_multihorizon_dataset():
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset
    from cleandiffuser_tpu.dataset import MultiHorizonD4RLAntmazeDataset
    from cleandiffuser_tpu.pipelines.diffuserlite_value import (
        IQLValueMultiHorizonDataset,
    )
    from cleandiffuser_tpu.utils.iql import IQL

    base = MultiHorizonD4RLAntmazeDataset(
        fake_d4rl_dataset("antmaze-medium-play-v2", n_steps=3000, ep_len=300),
        horizons=(5, 9), max_path_length=1001,
    )
    iql = IQL(base.o_dim, base.a_dim, hidden_dim=32)
    ds = IQLValueMultiHorizonDataset(base, iql)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 4, horizon_idx=1)
    assert batch["rew"].shape == (4, 9, 1)
    assert batch["pred_val"].shape == (4, 9, 1)
    assert np.all(np.isfinite(np.asarray(batch["pred_val"])))


# ------------------------------------------------------- config error probe
def test_unknown_task_override_error():
    from pathlib import Path

    from cleandiffuser_tpu.utils.config import load_config

    cfg_dir = Path(__file__).resolve().parents[1] / "configs/dql/antmaze"
    with pytest.raises(ValueError, match="Unknown task"):
        load_config(cfg_dir, "antmaze", ["task=not-a-task"])


# ---------------------------------------------------- DV antmaze pad reward
def test_dv_antmaze_pad_reward_modes():
    from cleandiffuser_tpu.dataset.fake import fake_d4rl_dataset
    from cleandiffuser_tpu.dataset import DV_D4RLAntmazeSeqDataset

    raw = fake_d4rl_dataset("antmaze-medium-play-v2", n_steps=3000, ep_len=300)
    cont = DV_D4RLAntmazeSeqDataset(raw, horizon=4, continous_reward_at_done=True)
    stop = DV_D4RLAntmazeSeqDataset(raw, horizon=4, continous_reward_at_done=False)
    # padding past episode end: tuned success (0) when continuing, tuned
    # step reward (-1) when not
    p0 = next(p for p, L in enumerate(cont.path_lengths) if L < cont.seq_rew.shape[1])
    L = cont.path_lengths[p0]
    assert cont.seq_rew[p0, L:].max() == 0.0 and cont.seq_rew[p0, L:].min() == 0.0
    assert np.allclose(stop.seq_rew[p0, L:], -1.0)
