"""Unit tests for tools/make_antmaze_dataset.py (the d4rl-recipe antmaze
dataset generator: BFS waypoints + SAC navigator + continuing-task logging,
reference d4rl scripts/generation recipe re-created on gymnasium_robotics).

These pin the pieces a chip-scale generation run depends on: the waypoint
planner's maze geometry, the flip detector that substitutes for the env's
discarded termination signal, and the reset_target goal-resampling wiring
(without it the logged stream is mostly goal-loitering)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.make_antmaze_dataset import (  # noqa: E402
    GOAL_RADIUS,
    WaypointPlanner,
    Navigator,
    make_envs,
    to_qlearning,
    unhealthy,
)


class _FakeMaze:
    """Minimal stand-in for gymnasium_robotics' Maze (u-maze layout)."""

    maze_map = [[1, 1, 1, 1, 1],
                [1, 0, 0, 0, 1],
                [1, 1, 1, 0, 1],
                [1, 0, 0, 0, 1],
                [1, 1, 1, 1, 1]]
    maze_size_scaling = 4.0

    def cell_rowcol_to_xy(self, cell):
        r, c = cell
        s = self.maze_size_scaling
        nrows, ncols = len(self.maze_map), len(self.maze_map[0])
        return np.array([(c - ncols / 2 + 0.5) * s,
                         (nrows / 2 - r - 0.5) * s], np.float32)


def test_bfs_path_routes_around_walls():
    planner = WaypointPlanner(_FakeMaze())
    start = planner.cell_to_xy((3, 1))   # bottom-left free cell
    goal = planner.cell_to_xy((1, 1))    # top-left free cell
    pts = planner.path(start, goal)
    # u-maze: must detour through the right corridor (col 3), not go
    # straight up through the (2, 1) wall
    cells = [planner.xy_to_cell(p) for p in pts]
    assert (2, 3) in cells
    assert all(_FakeMaze.maze_map[r][c] == 0 for r, c in cells)
    assert np.allclose(pts[-1], goal)


def test_navigator_replans_on_goal_change():
    planner = WaypointPlanner(_FakeMaze())
    nav = Navigator(planner)
    xy = planner.cell_to_xy((3, 1))
    g1 = planner.cell_to_xy((1, 1))
    wp1 = nav.waypoint(xy, g1)
    n_wps = len(nav.wps)
    g2 = planner.cell_to_xy((3, 3))
    nav.waypoint(xy, g2)
    assert not np.allclose(nav.goal, g1)
    assert len(nav.wps) <= n_wps  # fresh plan toward the nearer goal
    del wp1


def test_navigator_carrot_keeps_commanded_vector_large():
    """The carrot target sits LOOKAHEAD metres along the path — never the
    raw next waypoint (whose approach shrinks the commanded vector to ~0
    and stalls the gait) — and clamps to the goal at the path's end."""
    from tools.make_antmaze_dataset import LOOKAHEAD

    planner = WaypointPlanner(_FakeMaze())
    nav = Navigator(planner)
    xy = planner.cell_to_xy((3, 1))          # (-4, -4)
    goal = planner.cell_to_xy((3, 3))        # (4, -4): straight corridor
    tgt = nav.waypoint(xy, goal)
    assert np.allclose(tgt, xy + [LOOKAHEAD, 0.0])   # carrot, not (0,-4)
    # 1m from the goal: carrot clamps to the goal point itself
    near = goal - np.array([1.0, 0.0], np.float32)
    tgt = nav.waypoint(near, goal)
    assert np.allclose(tgt, goal)


def test_stuck_tracker_flags_parked_envs_only():
    from tools.make_antmaze_dataset import StuckTracker

    tr = StuckTracker(2, window=5, min_move=0.5)
    moving = np.array([0.0, 0.0], np.float32)
    for t in range(5):
        xy = np.stack([[0.2 * (t + 1), 0.0],       # env0 walks
                       [moving[0], moving[1]]])     # env1 parked
        stuck = tr.update(xy.astype(np.float32))
    assert stuck.tolist() == [False, True]
    # after the flag the tracker re-anchors: no immediate re-flag
    assert tr.update(xy.astype(np.float32)).tolist() == [False, False]


def test_unhealthy_flags_flipped_torso_z():
    obs = {"observation": np.array([[0.6, 0.0], [0.1, 0.0], [1.3, 0.0]],
                                   np.float32)}
    assert unhealthy(obs).tolist() == [False, True, True]


def test_to_qlearning_drops_episode_boundaries_keeps_goal_rewards():
    n = 10
    data = {
        "observations": np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        "actions": np.zeros((n, 1), np.float32),
        "rewards": np.zeros((n,), np.float32),
        "terminals": np.zeros((n,), np.float32),
        "timeouts": np.zeros((n,), np.float32),
    }
    data["rewards"][3] = 1.0   # goal-reach transition (NOT a boundary:
    data["timeouts"][6] = 1.0  # reset_target keeps the episode going)
    q = to_qlearning(data)
    assert q["observations"].shape[0] == n - 2  # last row + boundary row
    assert q["rewards"].sum() == 1.0            # reward-1 transition kept
    # next_observations never cross the timeout boundary
    assert not any(np.allclose(o, data["observations"][7])
                   for o in q["next_observations"][q["observations"][:, 0] == 12.0])


@pytest.mark.slow
def test_make_envs_resamples_goal_on_reach():
    """reset_target=True wiring: teleport the ant onto the goal and step —
    the goal must move (update_goal), keeping the logged stream navigating
    instead of loitering (d4rl generation semantics)."""
    gym_rob = pytest.importorskip("gymnasium_robotics")
    del gym_rob
    envs, obs = make_envs("AntMaze_UMaze-v5", 1, seed=0)
    env = envs.envs[0].unwrapped
    goal_before = env.goal.copy()
    # place the torso at the goal xy
    qpos = env.ant_env.data.qpos.copy()
    qpos[:2] = goal_before
    env.ant_env.set_state(qpos, env.ant_env.data.qvel.copy())
    _, rew, _, _, info = envs.envs[0].step(np.zeros(8, np.float32))
    assert rew > 0 or info.get("success")
    assert np.linalg.norm(env.goal - goal_before) > GOAL_RADIUS
    envs.close()


def test_relabel_fixed_goal_marks_post_step_positions():
    from tools.make_antmaze_dataset import relabel_fixed_goal

    goal = np.array([-4.0, 4.0], np.float32)
    # 6-step stream; positions of rows 2 and 5 are inside the goal radius.
    xy = np.array([[0, 0], [-3.0, 3.0], [-4.1, 4.2], [0, 0],
                   [9, 9], [-4.0, 4.0]], np.float32)
    obs = np.concatenate([xy, np.zeros((6, 27), np.float32)], -1)
    data = {
        "observations": obs,
        "actions": np.zeros((6, 8), np.float32),
        "rewards": np.full((6,), 0.77, np.float32),  # collection-goal junk
        "terminals": np.zeros((6,), np.float32),
        # row 3 ends an episode -> row 4 starts a new one
        "timeouts": np.array([0, 0, 0, 1, 0, 0], np.float32),
    }
    out = relabel_fixed_goal(data, goal)
    # reward[j] = 1 iff obs[j+1] is within the radius AND same episode:
    # row 1 -> row 2 in-goal = 1; row 4 -> row 5 in-goal = 1; row 2's next
    # (row 3) is out; row 3 is a boundary (timeout) so even if row 4 were
    # in-goal it would be 0; last row has no next -> 0.
    assert out["rewards"].tolist() == [0, 1, 0, 0, 1, 0]
    assert out["terminals"].tolist() == out["rewards"].tolist()
    # inputs not mutated
    assert data["rewards"][0] == np.float32(0.77)


@pytest.mark.slow
def test_antmaze_eval_env_pins_fixed_d4rl_task():
    """Eval resets must pin the FIXED d4rl task: same exact (noise-free)
    goal at the goal-cell center on every reset, start at the reset cell —
    gymnasium's all-open AntMaze-v5 maps would otherwise resample a random
    goal per reset, which the goal-free 29-dim obs cannot express."""
    from cleandiffuser_tpu.env.d4rl_eval import make_antmaze_env

    env = make_antmaze_env("antmaze-umaze-v2")
    inner = env.env.unwrapped
    goals = []
    for seed in (0, 1, 2):
        obs, _ = env.reset(seed=seed)
        assert obs.shape == (29,)
        goals.append(inner.goal.copy())
        # start near the reset cell (3,1) center (-4,-4); ant reset noise
        # is small (0.1 uniform on qpos)
        assert np.linalg.norm(obs[:2] - np.array([-4.0, -4.0])) < 1.0
    goals = np.stack(goals)
    assert np.allclose(goals, goals[0])          # fixed across resets
    assert np.allclose(goals[0], [-4.0, 4.0])    # exactly the cell center
    env.close()


@pytest.mark.slow
def test_fixed_task_rollout_envs_terminate_at_goal():
    """make_envs(fixed_cells=...) must pin the task below the vector env
    (autoresets stay pinned) and terminate on goal reach so the env's own
    sparse reward doubles as the d4rl-relabeled reward."""
    import gymnasium as gym

    envs, obs = make_envs("AntMaze_UMaze-v5", 2, seed=0,
                          fixed_cells=((1, 1), (3, 1)))
    assert np.allclose(obs["desired_goal"], [[-4.0, 4.0], [-4.0, 4.0]])
    # teleport one ant onto the goal and step: sparse reward + termination
    e0 = envs.envs[0].unwrapped
    qpos = e0.data.qpos.copy()
    qpos[:2] = [-4.0, 4.0]
    e0.ant_env.set_state(qpos, e0.data.qvel.copy())
    _, rew, term, _, _ = envs.step(np.zeros((2, 8), np.float32))
    assert rew[0] > 0 and bool(term[0])
    # the autoreset (next step under gymnasium>=1.0) stays on the pinned
    # task: desired_goal remains the fixed cell center
    nobs, *_ = envs.step(np.zeros((2, 8), np.float32))
    assert np.allclose(nobs["desired_goal"][0], [-4.0, 4.0])
    envs.close()
