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
