"""Generate d4rl-style antmaze datasets on REAL MuJoCo Ant physics.

d4rl's antmaze suites were produced by a goal-reaching ant policy driven
through mazes by a waypoint planner (d4rl locomotion/maze_env.py +
wrappers; the policy reaches the NEXT WAYPOINT, the planner plans
cell-BFS paths to the episode goal). d4rl is not installable here, so
this tool re-creates that recipe on gymnasium_robotics AntMaze-v5:

1. Train SAC (cleandiffuser_tpu.utils.sac — replay ring + updates on the
   chip, one fused dispatch per n_envs env steps) on waypoint-reaching:
   policy input = [ant obs (27) | waypoint xy relative to torso (2)],
   dense progress reward toward the waypoint; waypoints come from the
   same BFS planner used at logging time, so train == deploy.
2. Gate on full-maze navigation success (deterministic policy, BFS
   waypoints, fresh episodes), then log `--rollout-steps` of the
   STOCHASTIC policy navigating the maze exactly as d4rl did: sparse
   reward (success indicator), goals resampled by the env's continuing
   task, timeouts every `--episode-len` steps.

Output: the standard snapshot schema (`<name>.npz` + `.qlearning.npz`)
in `$CLEANDIFFUSER_DATA`, 29-dim d4rl antmaze obs layout
[xy | qpos[2:] | qvel] (env/d4rl_eval.py AntMazeD4RLWrapper), which flips
the antmaze CLIs from synthetic to real data with zero code change.

Usage:
    python tools/make_antmaze_dataset.py antmaze-umaze-v2 [--seed 0]
"""

import argparse
import sys
import time
from collections import deque
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.env.d4rl_eval import (ANTMAZE_EVAL_CELLS,
                                             ANTMAZE_GYM_IDS,
                                             U_MAZE_DIVERSE_MAP)

OBS27 = 27       # qpos[2:] (13) + qvel (14); v5 appends contact forces
WAYPOINT_RADIUS = 1.0   # advance to next waypoint within this distance
LOOKAHEAD = 2.5  # carrot target distance along the path (see Navigator)
GOAL_RADIUS = 0.45      # d4rl success threshold
POLICY_OBS = OBS27 + 2  # + relative carrot-target xy


# ---------------------------------------------------------------------------
# Waypoint planner: BFS over the maze grid
# ---------------------------------------------------------------------------
class WaypointPlanner:
    def __init__(self, maze):
        self.maze = maze
        self.grid = np.asarray(
            [[1 if c == 1 else 0 for c in row] for row in maze.maze_map])

    def xy_to_cell(self, xy):
        # invert cell_rowcol_to_xy: x = (col - ncols/2 + .5)*s, y = (nrows/2 - row - .5)*s
        s = self.maze.maze_size_scaling
        col = int(round(xy[0] / s + self.grid.shape[1] / 2 - 0.5))
        row = int(round(self.grid.shape[0] / 2 - 0.5 - xy[1] / s))
        return (int(np.clip(row, 0, self.grid.shape[0] - 1)),
                int(np.clip(col, 0, self.grid.shape[1] - 1)))

    def cell_to_xy(self, cell):
        return np.asarray(self.maze.cell_rowcol_to_xy(cell), np.float32)

    def path(self, start_xy, goal_xy):
        """BFS cell path -> list of waypoint xy (ending at goal_xy)."""
        start, goal = self.xy_to_cell(start_xy), self.xy_to_cell(goal_xy)
        if start == goal:
            return [np.asarray(goal_xy, np.float32)]
        prev, seen = {}, {start}
        q = deque([start])
        while q:
            cur = q.popleft()
            if cur == goal:
                break
            r, c = cur
            for nxt in ((r + 1, c), (r - 1, c), (r, c + 1), (r, c - 1)):
                if (0 <= nxt[0] < self.grid.shape[0]
                        and 0 <= nxt[1] < self.grid.shape[1]
                        and self.grid[nxt] == 0 and nxt not in seen):
                    seen.add(nxt)
                    prev[nxt] = cur
                    q.append(nxt)
        if goal not in prev and goal != start:
            return [np.asarray(goal_xy, np.float32)]  # unreachable: beeline
        cells = [goal]
        while cells[-1] != start:
            cells.append(prev[cells[-1]])
        cells.reverse()
        pts = [self.cell_to_xy(c) for c in cells[1:]]
        pts[-1:] = [np.asarray(goal_xy, np.float32)]
        return pts


class Navigator:
    """Per-env waypoint state: replan when the env's goal changes OR the
    ant teleports (an episode reset — with a FIXED goal the goal-change
    trigger alone would leave the new episode on the old, fully-popped
    path and the policy beelining into walls; normal steps move <0.2m, a
    reset jumps several meters).

    `waypoint` returns a CARROT target: the point LOOKAHEAD metres ahead
    of the ant along the remaining piecewise path, not the raw next
    waypoint. Raw waypoints shrink the commanded vector to ~0 on every
    approach, so the policy decelerates 8 times per maze traverse (and a
    700-step d4rl eval budget only fits the traverse at sustained speed);
    a constant-magnitude carrot keeps it at full gait and cuts corners
    smoothly. Near the path end the carrot clamps to the goal point."""

    TELEPORT = 2.0

    def __init__(self, planner):
        self.planner = planner
        self.goal = None
        self.last_xy = None
        self.wps = []

    def waypoint(self, xy, goal):
        if (self.goal is None
                or np.linalg.norm(goal - self.goal) > 1e-6
                or np.linalg.norm(xy - self.last_xy) > self.TELEPORT):
            self.goal = goal.copy()
            self.wps = self.planner.path(xy, goal)
        self.last_xy = xy.copy()
        while len(self.wps) > 1 and (
                np.linalg.norm(xy - self.wps[0]) < WAYPOINT_RADIUS):
            self.wps.pop(0)
        # carrot: LOOKAHEAD metres ahead along [xy | remaining waypoints]
        rem = LOOKAHEAD
        a = xy
        for b in self.wps:
            seg = float(np.linalg.norm(b - a))
            if rem <= seg:
                return (a + (b - a) * (rem / max(seg, 1e-9))).astype(
                    np.float32)
            rem -= seg
            a = b
        return np.asarray(self.wps[-1], np.float32)


class StuckTracker:
    """Movement watchdog: flags envs that moved < `min_move` over the last
    `window` steps. The SAC ant has rest-point attractors (e.g. a z≈0.38
    crouch the flip detector's z<0.2 band misses) where the deterministic
    policy freezes forever; training treats a stuck flag like a flip
    (terminate + reset, so SAC learns the state has zero value) and
    rollout/eval responds with a random-action kick."""

    def __init__(self, n, window=40, min_move=0.5):
        self.window, self.min_move = window, min_move
        self.count = np.zeros(n, np.int64)
        self.anchor = None

    def update(self, xy):
        if self.anchor is None:
            self.anchor = xy.copy()
        self.count += 1
        moved = (np.linalg.norm(xy - self.anchor, axis=-1)
                 >= self.min_move)
        stuck = (self.count >= self.window) & ~moved
        renew = moved | (self.count >= self.window)
        self.anchor[renew] = xy[renew]
        self.count[renew] = 0
        return stuck

    def reset(self, i, xy_i):
        if self.anchor is not None:
            self.anchor[i] = xy_i
        self.count[i] = 0


# ---------------------------------------------------------------------------
def _pin_task(env, cells):
    """Inject fixed (goal_cell, reset_cell) options into EVERY reset — sits
    BELOW the vector env so autoresets after goal-reach termination stay on
    the pinned task. Everything else passes through."""
    import gymnasium as gym

    goal_cell, reset_cell = cells
    options = {"goal_cell": np.asarray(goal_cell, np.int64),
               "reset_cell": np.asarray(reset_cell, np.int64)}

    class PinTask(gym.Wrapper):
        def reset(self, **kwargs):
            # vector envs pass options=None explicitly — replace None too
            if kwargs.get("options") is None:
                kwargs["options"] = options
            return self.env.reset(**kwargs)

    return PinTask(env)


def make_envs(gym_id, n_envs, seed, mk_kwargs=None, fixed_cells=None):
    import gymnasium as gym
    import gymnasium_robotics  # noqa: F401 (registers AntMaze_*-v5)

    def mk():
        if fixed_cells is not None:
            # d4rl's non-diverse recipe: every episode IS the eval task —
            # start at reset_cell, terminate on reaching the exact
            # (noise-free) goal_cell center; the env's own sparse reward
            # is then already the d4rl-relabeled reward.
            env = gym.make(gym_id, continuing_task=False,
                           **(mk_kwargs or {}))
            env.unwrapped.position_noise_range = 0.0
            return _pin_task(env, fixed_cells)
        # reset_target=True is load-bearing: with the default (False) the
        # continuing task NEVER resamples the goal on reach (maze_v4
        # update_goal gates on it), so the ant would loiter at the goal for
        # the rest of every episode and the logged stream would be mostly
        # stationary — unlike d4rl's, whose generation script re-commands a
        # new goal on every reach.
        return gym.make(gym_id, continuing_task=True, reset_target=True,
                        **(mk_kwargs or {}))

    envs = gym.vector.SyncVectorEnv([mk for _ in range(n_envs)])
    obs, _ = envs.reset(seed=seed)
    return envs, obs


def unhealthy(obs_dict):
    """Flipped/fallen ants: torso z outside Ant's healthy range.

    AntMazeEnv.step discards the inner ant's termination and
    compute_terminated always returns False for continuing tasks, so flips
    must be detected from the observation (obs[0] is qpos z — x/y are
    excluded from the ant obs and live in achieved_goal)."""
    z = obs_dict["observation"][:, 0]
    return (z < 0.2) | (z > 1.0)


def policy_obs(obs_dict):
    """[obs27 | waypoint - xy] rows from the dict batch + navigators."""
    return obs_dict["observation"][:, :OBS27].astype(np.float32)


def navigate_eval(gym_id, planner, actor_params, episodes=8, seed=0,
                  max_steps=700, mk_kwargs=None, fixed_cells=None):
    """Deterministic-policy navigation success rate (+ random-action kicks
    out of stuck states). With `fixed_cells` this is THE metric that
    matters: the full pinned d4rl traverse within the d4rl step budget —
    random short goal-reaches can gate 1.00 while the long task sits at 0."""
    import gymnasium as gym
    import gymnasium_robotics  # noqa: F401

    from cleandiffuser_tpu.utils.sac import NumpyActor

    pi = NumpyActor(actor_params)
    env = gym.make(gym_id, continuing_task=False, **(mk_kwargs or {}))
    if fixed_cells is not None:
        env.unwrapped.position_noise_range = 0.0
        env = _pin_task(env, fixed_cells)
    rng = np.random.default_rng(seed + 31)
    succ = 0
    for ep in range(episodes):
        o, _ = env.reset(seed=seed + ep)
        nav = Navigator(planner)
        stuck = StuckTracker(1)
        kick = 0
        for t in range(max_steps):
            xy = o["achieved_goal"].astype(np.float32)
            wp = nav.waypoint(xy, o["desired_goal"].astype(np.float32))
            if stuck.update(xy[None])[0]:
                kick = 10
            if kick > 0:
                a = rng.uniform(-1, 1, 8).astype(np.float32)
                kick -= 1
            else:
                pin = np.concatenate([o["observation"][:OBS27], wp - xy])
                a = pi(pin[None].astype(np.float32))[0]
            o, r, te, tr, info = env.step(a)
            if info.get("success", False) or r > 0:
                succ += 1
                break
            if te or tr:
                break
    env.close()
    return succ / episodes


def train_sac_navigator(gym_id, planner, seed=0, n_envs=64,
                        max_steps=3_000_000, warmup=20_000,
                        eval_every=50_000, success_gate=0.75,
                        out_dir=Path("dev/d4rl"), name="antmaze",
                        mk_kwargs=None, eval_cells=None):
    from cleandiffuser_tpu.utils.sac import SAC, DeviceCollector

    envs, obs = make_envs(gym_id, n_envs, seed, mk_kwargs)
    sac = SAC(POLICY_OBS, 8, rng=seed)
    col = DeviceCollector(sac, 1_000_000, n_envs)
    host_rng = np.random.default_rng(seed)
    env_ids = np.arange(n_envs, dtype=np.int32)
    navs = [Navigator(planner) for _ in range(n_envs)]
    stuck_tr = StuckTracker(n_envs)

    def build_pin(obs):
        xy = obs["achieved_goal"].astype(np.float32)
        wps = np.stack([navs[i].waypoint(xy[i],
                                         obs["desired_goal"][i].astype(np.float32))
                        for i in range(n_envs)])
        return np.concatenate([policy_obs(obs), wps - xy], -1), xy, wps

    pin, xy, wps = build_pin(obs)
    prev_done = np.zeros((n_envs,), bool)
    new, steps, t0 = None, 0, time.time()
    best = (0.0, None)
    while steps < max_steps:
        if steps < warmup:
            act = host_rng.uniform(-1, 1, (n_envs, 8)).astype(np.float32)
            if new is not None:
                col.step(pin, new, update=False)
        else:
            act, log = col.step(pin, new, update=True)
        nobs, rew, term, trunc, info = envs.step(act)
        # env term is always False under continuing_task; detect flips from
        # the obs so a flip costs the episode (term cuts the bootstrap,
        # which SAC learns to avoid) instead of logging junk until timeout.
        # Stuck rest-points (no movement for a window) terminate the same
        # way: their value goes to ~0, so the policy learns to stay in
        # motion instead of parking in the z≈0.38 crouch attractor.
        nxy_now = nobs["achieved_goal"].astype(np.float32)
        flipped = unhealthy(nobs) | stuck_tr.update(nxy_now)
        # dense carrot-progress reward + small survival bonus, from the
        # PRE-reset positions (term=1 cuts the bootstrap for flipped envs,
        # so their post-reset next_obs is never used as a target). The
        # survival term stays well below typical progress (full gait is
        # ~0.9/step at x10) so loitering is never competitive.
        d_now = np.linalg.norm(nxy_now - wps, axis=-1)
        d_prev = np.linalg.norm(xy - wps, axis=-1)
        shaped = (d_prev - d_now) * 10.0 + 0.25
        for i in np.nonzero(flipped)[0]:
            o_i, _ = envs.envs[i].reset()
            for k in nobs:
                nobs[k][i] = o_i[k]
            navs[i] = Navigator(planner)
            stuck_tr.reset(i, o_i["achieved_goal"].astype(np.float32))
        npin, nxy, nwps = build_pin(nobs)
        done = np.logical_or(flipped, trunc)
        valid = ~prev_done
        new = {"obs": pin, "act": act.astype(np.float32),
               "rew": shaped.astype(np.float32), "next_obs": npin,
               "term": flipped.astype(np.float32),
               "done": done.astype(np.float32),
               "env": env_ids, "mask": valid.astype(np.float32)}
        prev_done = done
        pin, xy, wps = npin, nxy, nwps
        obs = nobs
        steps += n_envs
        if steps % eval_every < n_envs and steps >= warmup:
            sr = navigate_eval(gym_id, planner, sac.snapshot_actor(),
                               seed=seed + 99, fixed_cells=eval_cells)
            sps = steps / max(time.time() - t0, 1e-9)
            print(f"[antmaze-sac:{name}] {steps} steps ({sps:.0f}/s) "
                  f"nav success={sr:.2f}", flush=True)
            if sr > best[0]:
                best = (sr, sac.snapshot_actor())
                sac.save(str(out_dir / f"{name}_sac_best.pkl"))
            if sr >= success_gate:
                break
    envs.close()
    if best[1] is None:
        best = (0.0, sac.snapshot_actor())
    print(f"[antmaze-sac:{name}] done: best nav success {best[0]:.2f}",
          flush=True)
    return best[1], best[0]


def rollout_dataset(gym_id, planner, actor_params, n_steps, seed=0,
                    n_envs=16, episode_len=700, mk_kwargs=None,
                    fixed_cells=None):
    """Log the d4rl antmaze stream: 29-dim obs, sparse reward, timeout
    boundaries every `episode_len` steps (episode-contiguous, env-major).

    With `fixed_cells` (d4rl's non-diverse recipe) every episode runs the
    pinned eval task and TERMINATES on goal reach; the env's sparse reward
    is then exactly the d4rl-relabeled reward and `terminals` records the
    goal-reach transitions. Without it, goals resample randomly (diverse
    recipe) and rewards/terminals must be relabeled afterwards against the
    fixed eval goal (`relabel_fixed_goal`)."""
    import gymnasium as gym

    from cleandiffuser_tpu.utils.sac import NumpyActor

    pi = NumpyActor(actor_params)
    rng = np.random.default_rng(seed + 7)
    envs, obs = make_envs(gym_id, n_envs, seed + 1000, mk_kwargs,
                          fixed_cells=fixed_cells)
    navs = [Navigator(planner) for _ in range(n_envs)]
    stuck_tr = StuckTracker(n_envs)
    kick = np.zeros((n_envs,), np.int64)
    per = n_steps // n_envs
    cols = {k: np.zeros((n_envs, per) + s, np.float32) for k, s in
            (("observations", (29,)), ("actions", (8,)), ("rewards", ()),
             ("terminals", ()), ("timeouts", ()))}
    fill = np.zeros((n_envs,), np.int64)
    age = np.zeros((n_envs,), np.int64)
    prev_done = np.zeros((n_envs,), bool)
    while fill.min() < per:
        xy = obs["achieved_goal"].astype(np.float32)
        goal = obs["desired_goal"].astype(np.float32)
        wps = np.stack([navs[i].waypoint(xy[i], goal[i])
                        for i in range(n_envs)])
        pin = np.concatenate([policy_obs(obs), wps - xy], -1)
        act = pi(pin, rng)
        # random-action kicks out of stuck rest-points (the kicks are
        # logged as data — behavior noise, exactly like d4rl's streams)
        kick[stuck_tr.update(xy)] = 10
        kicked = kick > 0
        if kicked.any():
            act[kicked] = rng.uniform(
                -1, 1, (int(kicked.sum()), 8)).astype(np.float32)
            kick[kicked] -= 1
        nobs, rew, term, trunc, _ = envs.step(act)
        age += 1
        timeout = age >= episode_len
        # env term is always False (continuing task); hard-reset flipped
        # ants ourselves so they don't log junk until the timeout
        flipped = unhealthy(nobs)
        d4rl_obs = np.concatenate([xy, policy_obs(obs)], -1)
        valid = np.logical_and(~prev_done, fill < per)
        for i in np.nonzero(valid)[0]:
            j = fill[i]
            cols["observations"][i, j] = d4rl_obs[i]
            cols["actions"][i, j] = act[i]
            # the env's sparse reward: 1 iff the POST-step position is
            # within 0.45 of the pre-update goal — d4rl's convention (the
            # goal-reaching transition itself carries the 1; the goal is
            # then resampled by reset_target and navigation continues)
            cols["rewards"][i, j] = float(rew[i])
            # fixed-task episodes terminate on goal reach (continuing_task
            # =False) — record it so TD targets stop bootstrapping there,
            # matching d4rl's relabeled terminals. Diverse streams have no
            # MDP terminals until relabel_fixed_goal sets them.
            cols["terminals"][i, j] = (float(term[i])
                                       if fixed_cells is not None else 0.0)
            # fold the env's own truncation in too: if a gym id ever
            # registers max_episode_steps != episode_len, the autoreset
            # boundary must still be flagged or to_qlearning would keep a
            # cross-episode transition into a post-reset observation
            cols["timeouts"][i, j] = float(timeout[i] or flipped[i]
                                           or trunc[i])
            fill[i] += 1
        # hard-reset timed-out or fallen envs (fresh episode boundary)
        done = np.logical_or(np.logical_or(term, trunc),
                             np.logical_or(timeout, flipped))
        for i in np.nonzero(done)[0]:
            age[i] = 0
            navs[i] = Navigator(planner)
        if done.any():
            # SyncVectorEnv autoresets on term/trunc; force-reset the rest
            for i in np.nonzero((timeout | flipped) & ~(term | trunc))[0]:
                o_i, _ = envs.envs[i].reset()
                for k in obs:
                    nobs[k][i] = o_i[k]
        prev_done = np.logical_or(term, trunc)
        obs = nobs
    envs.close()
    data = {k: v.reshape((n_envs * per,) + v.shape[2:]) for k, v in cols.items()}
    for i in range(n_envs):
        row = (i + 1) * per - 1
        data["timeouts"][row] = 1.0
    return data


def to_qlearning(data):
    keep = ~(data["timeouts"][:-1] > 0)
    return {
        "observations": data["observations"][:-1][keep],
        "actions": data["actions"][:-1][keep],
        "next_observations": data["observations"][1:][keep],
        "rewards": data["rewards"][:-1][keep],
        "terminals": data["terminals"][:-1][keep],
    }


def relabel_fixed_goal(data, goal_xy, radius=GOAL_RADIUS):
    """Relabel a random-goal (diverse) stream against the FIXED eval goal.

    d4rl's antmaze datasets carry rewards relative to the fixed evaluation
    target, not the random goals the collection policy chased (d4rl
    relabels during generation) — that is the entire learning signal for
    offline RL, since the 29-dim obs has no goal. reward[j] = 1 iff the
    post-step position (obs[j+1] xy, same episode) is within `radius` of
    `goal_xy`; terminals mirror rewards (reaching the eval goal ends the
    eval MDP: the eval env runs continuing_task=False)."""
    xy = data["observations"][:, :2]
    rew = np.zeros_like(data["rewards"])
    within = np.linalg.norm(xy - np.asarray(goal_xy, np.float32),
                            axis=-1) <= radius
    # post-step position of row j is row j+1's logged (pre-step) position,
    # valid only when j is not an episode boundary
    rew[:-1] = within[1:].astype(np.float32)
    rew[:-1][data["timeouts"][:-1] > 0] = 0.0
    out = dict(data)
    out["rewards"] = rew
    out["terminals"] = rew.copy()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("envs", nargs="+",
                    help="d4rl antmaze names, e.g. antmaze-umaze-v2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-envs", type=int, default=64)
    ap.add_argument("--max-steps", type=int, default=3_000_000)
    ap.add_argument("--rollout-steps", type=int, default=1_000_000)
    ap.add_argument("--success-gate", type=float, default=0.75)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--rollout-only", action="store_true",
                    help="skip SAC training; load <name>_sac_best.pkl")
    ap.add_argument("--train-only", action="store_true",
                    help="train + save the SAC navigator, write no data "
                         "(rollouts are host-numpy: run them on CPU later "
                         "with --rollout-only while the chip does other "
                         "work)")
    ap.add_argument("--relabel-only", action="store_true",
                    help="rewrite rewards/terminals of an existing <name>"
                         ".npz against the fixed eval goal; no simulation")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import gymnasium as gym
    import gymnasium_robotics  # noqa: F401

    if args.out is None:
        from cleandiffuser_tpu.pipelines.data_loading import DATA_DIR
        out_dir = DATA_DIR
    else:
        out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.envs:
        gym_id = ANTMAZE_GYM_IDS[name]
        # "diverse" variants resample goals over the open maze; umaze has
        # no Diverse_G layout in gymnasium_robotics, so pass the same
        # custom 'c'-cell map the eval env uses (env/d4rl_eval.py)
        mk_kwargs = ({"maze_map": U_MAZE_DIVERSE_MAP}
                     if name == "antmaze-umaze-diverse-v2" else None)
        goal_cell, reset_cell = ANTMAZE_EVAL_CELLS[name]
        probe = gym.make(gym_id, **(mk_kwargs or {}))
        planner = WaypointPlanner(probe.unwrapped.maze)
        goal_xy = np.asarray(
            probe.unwrapped.maze.cell_rowcol_to_xy(np.asarray(goal_cell)),
            np.float32)
        probe.close()

        if args.relabel_only:
            raw = dict(np.load(out_dir / f"{name}.npz"))
            data = relabel_fixed_goal(raw, goal_xy)
        else:
            if args.rollout_only:
                import pickle
                with open(out_dir / f"{name}_sac_best.pkl", "rb") as f:
                    actor, sr = pickle.load(f).actor, float("nan")
            else:
                actor, sr = train_sac_navigator(
                    gym_id, planner, seed=args.seed, n_envs=args.n_envs,
                    max_steps=args.max_steps,
                    success_gate=args.success_gate,
                    out_dir=out_dir, name=name, mk_kwargs=mk_kwargs,
                    # gate on the PINNED eval traverse (standard map),
                    # never on random — often short — goal-reaches
                    eval_cells=(goal_cell, reset_cell))
                if args.train_only:
                    continue
            # non-diverse d4rl recipe = goal-directed episodes of the eval
            # task itself (env rewards/terminals already correct); diverse
            # = random goals everywhere, relabeled afterwards
            diverse = "diverse" in name
            print(f"[data:{name}] rolling out x{args.rollout_steps} "
                  f"(nav success {sr:.2f}, "
                  f"{'diverse' if diverse else 'fixed-task'})", flush=True)
            data = rollout_dataset(
                gym_id, planner, actor, args.rollout_steps,
                seed=args.seed, mk_kwargs=mk_kwargs,
                fixed_cells=None if diverse else (goal_cell, reset_cell))
            if diverse:
                data = relabel_fixed_goal(data, goal_xy)
        np.savez_compressed(out_dir / f"{name}.npz", **data)
        np.savez_compressed(out_dir / f"{name}.qlearning.npz",
                            **to_qlearning(data))
        print(f"[data] wrote {name}: {data['rewards'].shape[0]} steps, "
              f"success frac {data['rewards'].mean():.4f}, "
              f"terminal frac {data['terminals'].mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
