"""d4rl-layout eval env wrappers: observation dimensions must match the
datasets' layouts exactly (found only at inference time otherwise)."""

import numpy as np
import pytest

gr = pytest.importorskip("gymnasium_robotics")


def test_antmaze_wrapper_is_29_dim():
    from cleandiffuser_tpu.env import make_antmaze_env

    env = make_antmaze_env("antmaze-medium-play-v2")
    obs, _ = env.reset(seed=0)
    assert obs.shape == (29,)
    obs2, rew, te, tr, _ = env.step(env.action_space.sample())
    assert obs2.shape == (29,)
    # first two dims are the xy position (d4rl layout)
    assert np.isfinite(obs[:2]).all()
    env.close()


def test_maze2d_wrapper_is_4_dim():
    from cleandiffuser_tpu.env import make_maze2d_env

    env = make_maze2d_env("maze2d-umaze-v1")
    obs, _ = env.reset(seed=0)
    assert obs.shape == (4,)
    assert env.goal.shape == (2,)
    env.close()


def test_kitchen_wrapper_is_60_dim():
    from cleandiffuser_tpu.env import make_kitchen_env

    env = make_kitchen_env(["microwave", "kettle", "bottom burner", "light switch"])
    obs, _ = env.reset(seed=0)
    assert obs.shape == (60,)
    # layout: robot qpos 9 | obj qpos 21 | goal 30 (goal only filled at
    # the task elements)
    goal = obs[30:]
    assert np.count_nonzero(goal) > 0
    env.close()


class _StubFranka:
    """Minimal FrankaKitchen stand-in: 59-dim observation
    [qp 9 | qvel 9 | obj_qp 21 | obj_qvel 20], controllable object block."""

    def __init__(self):
        self.obj = np.zeros(21, np.float32)

    def _obs(self):
        o = np.zeros(59, np.float32)
        o[18:39] = self.obj
        return {"observation": o, "desired_goal": {}}

    def reset(self, **kwargs):
        self.obj[:] = 0.0
        return self._obs(), {}

    def step(self, action):
        return self._obs(), 0.0, False, False, {}


def test_kitchen_d4rl_completion_rule():
    """The wrapper scores with the EXACT d4rl rule (reference
    env/kitchen/base.py:87-119): obs-distance < 0.3, +1 once per task,
    removal from the open set, terminate when empty."""
    from cleandiffuser_tpu.env.kitchen import (
        D4RL_ELEMENT_GOALS,
        D4RL_ELEMENT_INDICES,
        KitchenLowdimWrapper,
    )

    stub = _StubFranka()
    env = KitchenLowdimWrapper(stub, ["microwave", "kettle"])
    obs, _ = env.reset()
    assert obs.shape == (60,)

    # nothing at goal -> no reward (kettle zeros are far from its goal)
    _, rew, term, _, info = env.step(np.zeros(9))
    assert rew == 0.0 and not term and info["completed_tasks"] == set()

    # drive the microwave joint to its d4rl goal -> +1, removed, once
    mw_obj_idx = D4RL_ELEMENT_INDICES["microwave"] - 9
    stub.obj[mw_obj_idx] = D4RL_ELEMENT_GOALS["microwave"]
    _, rew, term, _, info = env.step(np.zeros(9))
    assert rew == 1.0 and not term and info["completed_tasks"] == {"microwave"}
    _, rew, term, _, _ = env.step(np.zeros(9))
    assert rew == 0.0 and not term  # pays only once

    # complete the kettle -> +1 and termination (open set empty)
    kt_obj_idx = D4RL_ELEMENT_INDICES["kettle"] - 9
    stub.obj[kt_obj_idx] = D4RL_ELEMENT_GOALS["kettle"]
    _, rew, term, _, info = env.step(np.zeros(9))
    assert rew == 1.0 and term
    assert info["completed_tasks"] == {"microwave", "kettle"}

    # threshold is a 0.3 NORM ball: just inside counts, just outside doesn't
    env.reset()
    stub.obj[:] = 0.0
    stub.obj[mw_obj_idx] = D4RL_ELEMENT_GOALS["microwave"] + 0.29
    _, rew, _, _, _ = env.step(np.zeros(9))
    assert rew == 1.0
    env.reset()
    stub.obj[mw_obj_idx] = D4RL_ELEMENT_GOALS["microwave"] + 0.31
    _, rew, _, _, _ = env.step(np.zeros(9))
    assert rew == 0.0


def test_eval_env_fns_mapping():
    from cleandiffuser_tpu.pipelines.data_loading import (
        get_normalized_score_fn,
        make_eval_env_fns,
    )

    assert len(make_eval_env_fns("antmaze-large-diverse-v2", 3)) == 3
    # longest-prefix score ranges
    f = get_normalized_score_fn("maze2d-medium-v1")
    assert abs(f(277.39) - 1.0) < 1e-3
    f = get_normalized_score_fn("kitchen-mixed-v0")
    assert f(4.0) == pytest.approx(1.0)


def test_kitchen_wrapper_composes_with_multistep():
    """Regression: KitchenLowdimWrapper must be a gymnasium.Env —
    MultiStepWrapper(gym.Wrapper) asserts it (dbc/dp kitchen eval crashed)."""
    from cleandiffuser_tpu.env import MultiStepWrapper, make_kitchen_env

    env = MultiStepWrapper(make_kitchen_env(["microwave"]), n_obs_steps=2,
                           n_action_steps=1, max_episode_steps=5)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (2, 60)
    obs, rew, term, trunc, _ = env.step(np.zeros((1, 9)))
    assert obs.shape == (2, 60) and np.isfinite(rew)
    env.close()


def test_kitchen_constants_match_vendored_relay_policy_learning():
    """gymnasium_robotics' FrankaKitchen derives from the SAME
    relay_policy_learning source the reference vendors
    (ref:cleandiffuser/env/kitchen/base.py:12-30): element indices, goal
    values, and the 0.3 bonus threshold are numerically identical, so the
    task-completion semantics of our eval env are EXACT, not approximate.
    This pins the cross-library identity against upstream drift."""
    gr = pytest.importorskip(
        "gymnasium_robotics.envs.franka_kitchen.kitchen_env")
    from cleandiffuser_tpu.env.kitchen import (
        D4RL_ELEMENT_GOALS,
        D4RL_ELEMENT_INDICES,
    )

    assert gr.BONUS_THRESH == 0.3
    assert set(gr.OBS_ELEMENT_GOALS) == set(D4RL_ELEMENT_GOALS)
    for task, goal in D4RL_ELEMENT_GOALS.items():
        np.testing.assert_array_equal(gr.OBS_ELEMENT_GOALS[task], goal)
        np.testing.assert_array_equal(gr.OBS_ELEMENT_INDICES[task],
                                      D4RL_ELEMENT_INDICES[task])
