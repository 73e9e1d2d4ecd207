"""Tests for the on-device MPC PushT expert (env/pusht_expert.py).

The expert stands in for the reference's human-teleop demos
(reference pipelines/dp_pusht.py:139 `pusht_cchi_v7_replay.zarr`): every
kept episode must actually reach the env's 0.95-coverage success
threshold, i.e. the demos are expert-grade by construction.
"""

import jax
import numpy as np
import pytest

from cleandiffuser_tpu.env.pusht_expert import (
    PushTExpertMPC,
    generate_pusht_expert_trajectories,
)

# reduced planning budget for CPU tests (prod default: K=160, iters=4)
FAST_MPC = dict(n_samples=96, n_iters=3)


@pytest.fixture(scope="module")
def expert_traj():
    mpc = PushTExpertMPC(**FAST_MPC)
    traj = mpc.rollout(jax.random.PRNGKey(0), 4, 100)
    return jax.tree_util.tree_map(np.asarray, traj)


def test_mpc_solves_most_resets(expert_traj):
    # with the reduced budget the planner should still solve >=half of a
    # 4-env batch within 100 control steps
    success = expert_traj["done"].any(axis=0)
    assert success.sum() >= 2, f"only {success.sum()}/4 solved"
    assert expert_traj["reward"].max() == 1.0


def test_mpc_traj_shapes_and_ranges(expert_traj):
    T, B = 100, 4
    assert expert_traj["obs"].shape == (T, B, 5)
    assert expert_traj["action"].shape == (T, B, 2)
    assert expert_traj["keypoint"].shape == (T, B, 9, 2)
    # actions are waypoints inside the workspace walls
    assert expert_traj["action"].min() >= 5.0
    assert expert_traj["action"].max() <= 507.0
    assert np.isfinite(expert_traj["obs"]).all()


def test_expert_trajectory_extraction():
    eps, covs = generate_pusht_expert_trajectories(
        n_episodes=4, max_steps=100, seed=0, batch=4, mpc_kwargs=FAST_MPC)
    assert len(covs) == 4
    assert len(eps) >= 2  # failures are dropped
    for ep in eps:
        t = len(ep["state"])
        assert 0 < t <= 100
        assert ep["action"].shape == (t, 2)
        assert ep["keypoint"].shape == (t, 9, 2)


def test_expert_demo_buffer_with_images():
    from cleandiffuser_tpu.dataset import generate_pusht_demos

    rb = generate_pusht_demos(
        n_episodes=2, max_steps=100, seed=1, expert=True, with_images=True,
        image_size=32, mpc_kwargs=FAST_MPC,
    )
    if rb.n_episodes == 0:
        pytest.skip("no episode solved under the reduced test budget")
    assert set(rb.keys()) >= {"state", "action", "keypoint", "img"}
    assert rb["img"].dtype == np.uint8
    assert rb["img"].shape[1:] == (32, 32, 3)
    assert rb["state"].shape[0] == rb["action"].shape[0] == rb["img"].shape[0]
