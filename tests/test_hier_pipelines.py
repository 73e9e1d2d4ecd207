"""Smoke tests for DiffuserLite, AdaptDiffuser, and Veteran pipelines."""

import jax
import numpy as np
import pytest

from cleandiffuser_tpu.dataset import (
    D4RLMuJoCoDataset,
    D4RLMuJoCoTDDataset,
    DV_D4RLMuJoCoSeqDataset,
    MultiHorizonD4RLMuJoCoDataset,
    fake_d4rl_dataset,
    fake_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.adaptdiffuser import AdaptDiffuserPipeline
from cleandiffuser_tpu.pipelines.diffuserlite import (
    DiffuserLitePipeline,
    compute_temporal_horizons,
)
from cleandiffuser_tpu.pipelines.veteran import VeteranPipeline


def test_temporal_horizons():
    # reference values: [5,5,9] -> [129, 33, 9]
    assert compute_temporal_horizons([5, 5, 9]) == [129, 33, 9]


def test_diffuserlite():
    raw = fake_d4rl_dataset(n_steps=3000, ep_len=200)
    ths = compute_temporal_horizons([3, 3, 5])
    ds = MultiHorizonD4RLMuJoCoDataset(raw, horizons=ths, max_path_length=200)
    pipe = DiffuserLitePipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, planning_horizons=(3, 3, 5),
        emb_dim=32, d_model=64, n_heads=4, depth=1,
        diffusion_gradient_steps=100, return_scale=100.0,
    )
    rng = jax.random.PRNGKey(0)
    batches = [ds.sample_batch(rng, 8, horizon_idx=i) for i in range(3)]
    log = pipe.train_step(batches)
    assert all(np.isfinite(v) for v in log.values())
    # reflow pairs + reflow step
    pairs = pipe.prepare_reflow_pairs(batches, sampling_steps=2)
    assert pairs[0]["x0"].shape == (8, 3, ds.o_dim)
    log = pipe.reflow_step(pairs)
    assert all(np.isfinite(v) for v in log.values())
    # hierarchical planning (R1: 3 steps; R2: 1 step)
    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    for steps in (3, 1):
        act, info = pipe.act(obs, sample_steps=steps)
        assert act.shape == (2, ds.a_dim)
        assert np.all(np.isfinite(np.asarray(act)))


def test_adaptdiffuser():
    raw = fake_d4rl_dataset(n_steps=1500, ep_len=150)
    ds = D4RLMuJoCoDataset(raw, horizon=8, max_path_length=150)
    pipe = AdaptDiffuserPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, horizon=8, model_dim=16,
        diffusion_steps=8, sampling_steps=4,
        diffusion_gradient_steps=100, classifier_gradient_steps=100,
    )
    rng = jax.random.PRNGKey(0)
    pipe.train_step(ds.sample_batch(rng, 8))
    start_obs = np.random.randn(8, ds.o_dim).astype(np.float32)
    traj, logp = pipe.generate_and_filter(start_obs, metric_value=-1e9)
    assert traj.shape[1:] == (8, ds.o_dim + ds.a_dim)
    assert traj.shape[0] == 8  # threshold -inf keeps all
    log = pipe.finetune_step(traj)
    assert np.isfinite(log["loss"])


@pytest.mark.parametrize("guidance", ["MCSS", "cfg", "cg"])
def test_veteran(guidance):
    raw = fake_d4rl_dataset(n_steps=1500, ep_len=150)
    ds = DV_D4RLMuJoCoSeqDataset(raw, horizon=8, max_path_length=150)
    td = D4RLMuJoCoTDDataset(fake_d4rl_qlearning_dataset(n_steps=800, ep_len=150))
    pipe = VeteranPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, planner_horizon=8,
        guidance_type=guidance, planner_net="transformer" if guidance != "cg" else "unet",
        planner_emb_dim=32, planner_d_model=64, unet_dim=16,
        gradient_steps=100, planner_sampling_steps=3, policy_sampling_steps=2,
        use_weighted_regression=(guidance == "MCSS"),
    )
    rng = jax.random.PRNGKey(0)
    planner_batch = ds.sample_batch(rng, 8)
    policy_batch = ds.sample_batch(jax.random.PRNGKey(1), 8)
    log = pipe.train_step(planner_batch, policy_batch)
    assert all(np.isfinite(v) for v in log.values()), log
    log = pipe.train_expected_value_step(td.sample_batch(jax.random.PRNGKey(2), 32))
    assert np.isfinite(log["loss_v"])
    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    act, traj = pipe.act(obs, num_candidates=4)
    assert act.shape == (2, ds.a_dim)
    assert np.all(np.isfinite(np.asarray(act)))


def test_veteran_critic_selector_and_checkpoint_roundtrip(tmp_path):
    """maze2d-style MCSS (DVHorizonCritic candidate ranking,
    veteran_d4rl_maze2d.py:373-375) + full-pipeline save/load: a loaded
    pipeline must act identically to the trained one."""
    raw = fake_d4rl_dataset(n_steps=1500, ep_len=150)
    ds = DV_D4RLMuJoCoSeqDataset(raw, horizon=8, max_path_length=150)
    kw = dict(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, planner_horizon=8,
        guidance_type="MCSS", planner_net="transformer",
        planner_emb_dim=32, planner_d_model=64,
        gradient_steps=100, planner_sampling_steps=3, policy_sampling_steps=2,
        mcss_selector="critic",
    )
    pipe = VeteranPipeline(**kw)
    rng = jax.random.PRNGKey(0)
    pipe.train_step(ds.sample_batch(rng, 8), ds.sample_batch(rng, 8))
    ckpt = str(tmp_path / "veteran.pkl")
    pipe.save(ckpt)

    pipe2 = VeteranPipeline(**{**kw, "rng": 7})
    pipe2.load(ckpt)
    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    act1, traj1 = pipe.act(obs, num_candidates=4, rng=jax.random.PRNGKey(5))
    act2, traj2 = pipe2.act(obs, num_candidates=4, rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(act1), np.asarray(act2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj1), np.asarray(traj2), atol=1e-5)


def test_veteran_goal_inpaint_pins_final_xy():
    """goal_inpaint=true (maze2d extension): the selected plan's final xy
    must equal the provided goal exactly (fix_mask re-pinning each denoise
    step), while the act path stays finite; without a goal the same pipeline
    must NOT pin the final state."""
    raw = fake_d4rl_dataset(n_steps=1500, ep_len=150)
    ds = DV_D4RLMuJoCoSeqDataset(raw, horizon=8, max_path_length=150)
    pipe = VeteranPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, planner_horizon=8,
        guidance_type="MCSS", planner_net="transformer",
        planner_emb_dim=32, planner_d_model=64,
        gradient_steps=100, planner_sampling_steps=3, policy_sampling_steps=2,
        mcss_selector="critic", goal_inpaint=True,
    )
    rng = jax.random.PRNGKey(0)
    pipe.train_step(ds.sample_batch(rng, 8), ds.sample_batch(rng, 8))
    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    goal = np.array([[0.5, -0.25], [1.0, 2.0]], np.float32)
    act, traj = pipe.act(obs, num_candidates=4, rng=jax.random.PRNGKey(3),
                         goal_normed=goal)
    traj = np.asarray(traj)
    np.testing.assert_allclose(traj[:, -1, :2], goal, atol=1e-6)
    np.testing.assert_allclose(traj[:, 0, : ds.o_dim], obs, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(act)))
    # no goal passed -> the override mask must not be used
    _, traj_free = pipe.act(obs, num_candidates=4, rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(traj_free)[:, -1, :2], goal, atol=1e-3)


def test_veteran_gi_pin_idx_pins_midplan():
    """gi_pin_idx=k pins the goal at plan index k instead of H-1 (the d4rl
    maze2d score counts first-reach time; earlier pins demand a
    time-optimal traverse) — the tail beyond the pin stays free."""
    raw = fake_d4rl_dataset(n_steps=1500, ep_len=150)
    ds = DV_D4RLMuJoCoSeqDataset(raw, horizon=8, max_path_length=150)
    pipe = VeteranPipeline(
        obs_dim=ds.o_dim, act_dim=ds.a_dim, planner_horizon=8,
        guidance_type="MCSS", planner_net="transformer",
        planner_emb_dim=32, planner_d_model=64,
        gradient_steps=100, planner_sampling_steps=3, policy_sampling_steps=2,
        mcss_selector="critic", goal_inpaint=True, gi_pin_idx=3,
    )
    rng = jax.random.PRNGKey(0)
    pipe.train_step(ds.sample_batch(rng, 8), ds.sample_batch(rng, 8))
    obs = np.random.randn(2, ds.o_dim).astype(np.float32)
    goal = np.array([[0.5, -0.25], [1.0, 2.0]], np.float32)
    _, traj = pipe.act(obs, num_candidates=4, rng=jax.random.PRNGKey(3),
                       goal_normed=goal)
    traj = np.asarray(traj)
    np.testing.assert_allclose(traj[:, 3, :2], goal, atol=1e-6)
    np.testing.assert_allclose(traj[:, 0, : ds.o_dim], obs, atol=1e-6)
    assert not np.allclose(traj[:, -1, :2], goal, atol=1e-3)


def test_eval_loop_threads_goal_normed():
    """d4rl_eval_loop must hand act_fn the per-env goal xy normalized with
    the state normalizer's position dims."""
    import gymnasium as gym

    from cleandiffuser_tpu.pipelines import runner as runner_mod

    class FakeGoalEnv:
        action_space = gym.spaces.Box(-1, 1, (2,), np.float32)
        observation_space = gym.spaces.Box(-np.inf, np.inf, (4,), np.float32)
        goal = np.array([3.0, 1.0], np.float32)

        def __init__(self):
            self.t = 0

        def reset(self, seed=None):
            self.t = 0
            return np.zeros(4, np.float32), {}

        def step(self, action):
            self.t += 1
            return np.zeros(4, np.float32), 0.0, False, self.t >= 3, {}

        def close(self):
            pass

    class IdNormalizer:
        def normalize(self, x):
            return (x - 1.0) / 2.0

    seen = {}

    def act_fn(nobs, goal_normed):
        seen["goal"] = np.array(goal_normed)
        return np.zeros((nobs.shape[0], 2), np.float32)

    import cleandiffuser_tpu.pipelines.data_loading as dl

    def fake_env_fns(env_name, num_envs):
        return [FakeGoalEnv for _ in range(num_envs)]

    orig = dl.make_eval_env_fns
    dl.make_eval_env_fns = fake_env_fns
    try:
        runner_mod.d4rl_eval_loop(
            act_fn, "maze2d-umaze-v1", IdNormalizer(), num_envs=2,
            num_episodes=1, max_steps=3, reward_mode="maze2d")
    finally:
        dl.make_eval_env_fns = orig
    # goal (3,1) normalized elementwise: ((3-1)/2, (1-1)/2) = (1.0, 0.0)
    np.testing.assert_allclose(seen["goal"], [[1.0, 0.0], [1.0, 0.0]], atol=1e-6)
