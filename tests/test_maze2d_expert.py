"""Waypoint-expert maze2d data generation + d4rl eval semantics.

Covers cleandiffuser_tpu/env/maze2d_expert.py (the d4rl
generate_maze2d_datasets.py re-creation on PointMaze physics) and the
maze2d reward-latch bookkeeping in runner.d4rl_eval_loop (reference
veteran_d4rl_maze2d.py:442-446).
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")
pytest.importorskip("gymnasium_robotics")

from cleandiffuser_tpu.env.d4rl_eval import (
    MAZE2D_EVAL_MAX_STEPS,
    make_maze2d_env,
)
from cleandiffuser_tpu.env.maze2d_expert import (
    WaypointController,
    generate_maze2d_dataset,
)


@pytest.fixture(scope="module")
def small_umaze_data():
    return generate_maze2d_dataset("maze2d-umaze-v1", n_steps=1500, seed=3)


def test_generator_schema_and_goal_events(small_umaze_data):
    data = small_umaze_data
    assert set(data) == {"observations", "actions", "rewards", "terminals",
                         "timeouts"}
    n = data["rewards"].shape[0]
    assert data["observations"].shape == (n, 4)
    assert data["actions"].shape == (n, 2)
    assert np.all(np.abs(data["actions"]) <= 1.0)
    assert np.all(np.isfinite(data["observations"]))
    # the waypoint expert must actually reach goals (d4rl umaze averages a
    # goal every ~50-100 steps); the DV dataset scans for these events
    assert data["rewards"].sum() >= 5
    assert data["terminals"].sum() == 0 and data["timeouts"][-1] == 1


def test_dv_dataset_consumes_generated_stream(small_umaze_data):
    from cleandiffuser_tpu.dataset import DV_D4RLMaze2DSeqDataset

    ds = DV_D4RLMaze2DSeqDataset(
        dict(small_umaze_data), horizon=32, discount=1.0,
        center_mapping=True, reward_tune="iql",
        continous_reward_at_done=True, stride=15,
    )
    assert len(ds) > 0
    batch = ds.sample_batch(__import__("jax").random.PRNGKey(0), 4)
    for leaf in (batch["obs"]["state"], batch["act"], batch["val"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_expert_scores_on_eval_env():
    """The waypoint expert run against the FIXED-goal eval env must latch
    the goal well before the d4rl horizon — validates eval env semantics
    (continuing task, fixed goal, reward 1 inside radius) and controller."""
    env = make_maze2d_env("maze2d-umaze-v1")
    obs, _ = env.reset(seed=0)
    ctrl = WaypointController(env.env.unwrapped.maze)
    finished, ep_reward = False, 0.0
    for t in range(MAZE2D_EVAL_MAX_STEPS["maze2d-umaze-v1"]):
        act = ctrl.act(obs, env.goal)
        obs, rew, term, trunc, _ = env.step(act)
        finished |= rew == 1.0
        ep_reward += float(finished)
        if trunc or term:
            break
    assert finished, "expert never reached the eval goal"
    # scores-since-first-reach: expert should bank most of the horizon
    assert ep_reward > 0.3 * MAZE2D_EVAL_MAX_STEPS["maze2d-umaze-v1"]
    env.close()


def test_eval_loop_maze2d_latch_semantics(monkeypatch):
    """d4rl_eval_loop reward_mode='maze2d' must count steps since the first
    reward==1 event, not accumulate raw reward."""
    from cleandiffuser_tpu.pipelines import runner as runner_mod

    class FakeEnv:
        action_space = gym.spaces.Box(-1, 1, (2,), np.float32)
        observation_space = gym.spaces.Box(-np.inf, np.inf, (4,), np.float32)

        def __init__(self):
            self.t = 0

        def reset(self, seed=None):
            self.t = 0
            return np.zeros(4, np.float32), {}

        def step(self, action):
            self.t += 1
            rew = 1.0 if self.t == 3 else 0.0  # at goal only at t=3
            return np.zeros(4, np.float32), rew, False, self.t >= 10, {}

        def close(self):
            pass

    class Identity:
        def normalize(self, x):
            return x

    monkeypatch.setattr(
        runner_mod, "d4rl_eval_loop", runner_mod.d4rl_eval_loop)
    import cleandiffuser_tpu.pipelines.data_loading as dl

    monkeypatch.setattr(dl, "make_eval_env_fns",
                        lambda env_name, n: [FakeEnv for _ in range(n)])
    scores = runner_mod.d4rl_eval_loop(
        lambda nobs: np.zeros((2, 2), np.float32),
        "maze2d-umaze-v1", Identity(), num_envs=2, num_episodes=1,
        max_steps=10, reward_mode="maze2d",
    )
    # latched at t=3 -> 8 rewarded steps (t=3..10); normalized vs d4rl range
    lo, hi = 23.85, 161.86
    expected = (8.0 - lo) / (hi - lo)
    assert np.allclose(scores, expected, atol=1e-6)
