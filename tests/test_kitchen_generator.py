"""Unit tests for tools/make_kitchen_dataset.py (the scripted-IK Franka
Kitchen demonstrator that replaces d4rl's undownloadable human demos).

Fast tier: pure-math and schema pieces. The sim-driving end-to-end test
(one scripted episode completing a task) is slow-tier."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.make_kitchen_dataset import (  # noqa: E402
    EVAL_TASKS,
    MAX_PATH,
    rotz,
    roty,
    to_qlearning,
)


def test_eval_tasks_pin_the_pipeline_eval_set():
    """The demonstrator must collect on EXACTLY the task set the eval env
    scores (pipelines/data_loading.py make_eval_env_fns kitchen branch) —
    a drift here silently trains on goals eval never checks."""
    import inspect

    from cleandiffuser_tpu.pipelines import data_loading

    src = inspect.getsource(data_loading.make_eval_env_fns)
    for task in EVAL_TASKS:
        assert f'"{task}"' in src
    assert MAX_PATH == 280  # d4rl kitchen budget (dataset max_path_length)


def test_rot_helpers_are_rotations():
    for R in (rotz(0.7), roty(-1.2)):
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)
    # rotz rotates xy, fixes z; roty rotates xz, fixes y
    assert np.allclose(rotz(np.pi / 2) @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    assert np.allclose(roty(np.pi / 2) @ [0, 0, 1], [1, 0, 0], atol=1e-12)


def test_to_qlearning_drops_both_boundary_kinds():
    n = 8
    data = {
        "observations": np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        "actions": np.zeros((n, 1), np.float32),
        "rewards": np.zeros((n,), np.float32),
        "terminals": np.zeros((n,), np.float32),
        "timeouts": np.zeros((n,), np.float32),
    }
    data["terminals"][3] = 1.0  # all-tasks-done termination
    data["timeouts"][5] = 1.0   # budget boundary
    q = to_qlearning(data)
    # rows 3 and 5 dropped (their next_observation crosses an episode
    # boundary), plus the final row
    assert q["observations"].shape[0] == n - 3
    starts = q["observations"][:, 0].tolist()
    assert 6.0 not in starts and 10.0 not in starts and 14.0 not in starts


def test_densify_rewards_matches_d4rl_latched_count():
    """Dataset rewards follow d4rl's stored-hdf5 kitchen semantics:
    rewards[t] = tasks completed so far in the episode (latched count),
    resetting at every episode boundary (terminal OR timeout)."""
    from tools.make_kitchen_dataset import densify_rewards

    data = {
        "observations": np.zeros((8, 2), np.float32),
        "actions": np.zeros((8, 1), np.float32),
        #          ep0: r=[0,1,0,1] -> dense [0,1,1,2]; ep1: [1,0] -> [1,1]
        "rewards": np.array([0, 1, 0, 1, 1, 0, 0, 1], np.float32),
        "terminals": np.array([0, 0, 0, 1, 0, 0, 0, 0], np.float32),
        "timeouts": np.array([0, 0, 0, 0, 0, 1, 0, 0], np.float32),
    }
    out = densify_rewards(data)
    assert out["rewards"].tolist() == [0, 1, 1, 2, 1, 1, 0, 1]
    # idempotence guard: input data untouched
    assert data["rewards"].tolist() == [0, 1, 0, 1, 1, 0, 0, 1]


@pytest.mark.slow
def test_scripted_demonstrator_completes_a_task():
    """One full scripted episode on the real FrankaKitchen sim must
    complete at least one d4rl subtask and log the 60-dim layout."""
    pytest.importorskip("gymnasium_robotics")
    from tools.make_kitchen_dataset import rollout_episodes

    data, comp = rollout_episodes(2, seed=123, noise=0.0, log_every=100)
    assert data["observations"].shape[-1] == 60
    assert data["actions"].shape[-1] == 9
    assert np.abs(data["actions"]).max() <= 1.0 + 1e-6
    assert comp.sum() >= 1            # at least one completion overall
    assert data["rewards"].sum() == comp.sum()  # +1 per completion
    # every episode boundary is flagged exactly once
    n_eps = int((data["timeouts"] + data["terminals"]).clip(0, 1).sum())
    assert n_eps == 2
