"""Generate d4rl-style Franka Kitchen datasets with a scripted IK demonstrator.

d4rl's kitchen suites are human VR teleop demos (relay_policy_learning;
reference dataset/d4rl_kitchen_dataset.py:10 consumes them). The demos
cannot be downloaded here, so this tool re-creates the data distribution
with a scripted demonstrator on gymnasium_robotics FrankaKitchen-v1:

- 6-DOF damped-least-squares differential IK on the `end_effector` site
  (actions ARE the env's joint-velocity commands, so logged actions replay
  exactly), with integral correction for the arm's steady-state droop.
- Per-task manipulation scripts against named sites/joints: grasp the
  microwave door bar and drag it along its hinge arc (wrist tracking the
  door angle), straddle + arc-drag the light-switch lever, pick the kettle
  by its bar (wrist rolled 90°) and carry it to the rear burner, grasp the
  burner knob paddle and roll the wrist to twist it.
- Episodes run a random subset/order of the kitchen-mixed eval set
  {microwave, kettle, bottom burner, light switch} with waypoint jitter
  and action noise — partial undirected sequences, the kitchen-MIXED
  data regime (no single episode need complete everything).

The stream is logged THROUGH KitchenLowdimWrapper (env/kitchen.py), so
observations are the 60-dim d4rl layout and rewards/terminals follow the
exact d4rl completion rule the eval pipeline scores with.

Output: `<name>.npz` (+ `.qlearning.npz`) in $CLEANDIFFUSER_DATA, schema
{observations, actions, rewards, terminals, timeouts}, max episode 280
steps (dataset/d4rl_kitchen.py max_path_length).

Usage:
    python tools/make_kitchen_dataset.py kitchen-mixed-v0 \
        [--episodes 400] [--seed 0]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EVAL_TASKS = ["microwave", "kettle", "bottom burner", "light switch"]
MAX_PATH = 280  # d4rl kitchen episode budget (dataset + eval convention)


def rotz(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def roty(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


class KitchenScripter:
    """Scripted demonstrator on a KitchenLowdimWrapper env.

    All env interaction goes through `self.step` so every transition is
    logged; scripts early-exit the moment the d4rl completion registers
    (wrapper reward > 0), which keeps episodes fast (the 0.3 bonus
    threshold fires well before the nominal joint target)."""

    def __init__(self, env, rng, noise=0.05, jitter=0.01):
        import mujoco

        self.env = env                      # KitchenLowdimWrapper
        self.rng = rng
        self.noise = noise
        self._mj = mujoco
        u = env.env.unwrapped
        self.m, self.d = u.robot_env.model, u.robot_env.data
        self.sid = mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_SITE,
                                     "end_effector")
        self.site = {n: mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_SITE, n)
                     for n in ("microhandle_site", "light_site",
                               "kettle_site", "knob2_site", "slide_site",
                               "hinge_site2")}
        self.jadr = {}
        self.anchor = {}
        for jn in ("microwave", "light_switch", "knob_Joint_2",
                   "slide_cabinet", "right_hinge_cabinet", "kettle"):
            j = mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_JOINT, jn)
            self.jadr[jn] = int(self.m.jnt_qposadr[j])
            self.anchor[jn] = self.d.xanchor[j][:2].copy()
        self.R0 = self.d.site_xmat[self.sid].reshape(3, 3).copy()
        # fingertip-pad midpoint: the outermost capsule pair on the two
        # finger bodies. The GRASP POINT is ~4.2cm from the end_effector
        # site along the hand axis — servoing the site to a 1.4cm target
        # (the burner-knob paddle) puts the pads 4-6cm off it.
        self._ftips = []
        for bn in ("panda0_leftfinger", "panda0_rightfinger"):
            b = mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_BODY, bn)
            caps = [g for g in range(self.m.ngeom)
                    if self.m.geom_bodyid[g] == b and self.m.geom_type[g]
                    == mujoco.mjtGeom.mjGEOM_CAPSULE]
            self._ftips.append(max(caps, key=lambda g: np.linalg.norm(
                self.d.geom_xpos[g] - self.d.site_xpos[self.sid])))
        self.grip_off = np.zeros(3)
        self.I = np.zeros(3)
        self.steps = 0
        self.task_reward = 0.0
        self.done = False
        self.trace = []
        self.jit = lambda: rng.normal(0.0, jitter, 3)

    # -- env plumbing ----------------------------------------------------
    def step(self, action):
        a = np.clip(action + self.rng.normal(0.0, self.noise, 9), -1, 1)
        obs, rew, term, trunc, info = self.env.step(a.astype(np.float64))
        self.trace.append((self.last_obs, a.astype(np.float32),
                           float(rew), bool(term)))
        self.last_obs = obs
        self.steps += 1
        self.task_reward += rew
        self.done = term or self.steps >= MAX_PATH - 1
        return obs

    def reset(self, seed=None):
        obs, _ = self.env.reset(seed=seed)
        self.last_obs = obs
        self.I[:] = 0.0
        self.steps = 0
        self.task_reward = 0.0
        self.done = False
        self.trace = []
        # home wrist orientation must come from the POST-reset state: at
        # construction time a shared env still holds the previous
        # episode's final pose, and every script's Rdes derives from R0
        self.R0 = self.d.site_xmat[self.sid].reshape(3, 3).copy()
        gm = 0.5 * (self.d.geom_xpos[self._ftips[0]]
                    + self.d.geom_xpos[self._ftips[1]])
        self.grip_off = self.R0.T @ (gm - self.d.site_xpos[self.sid])
        return obs

    # -- IK --------------------------------------------------------------
    def ik6(self, target, Rdes, grip, gain=9.0, wrot=0.4):
        jacp = np.zeros((3, self.m.nv))
        jacr = np.zeros((3, self.m.nv))
        self._mj.mj_jacSite(self.m, self.d, jacp, jacr, self.sid)
        J = np.vstack([jacp[:, :7], jacr[:, :7]])
        Rcur = self.d.site_xmat[self.sid].reshape(3, 3)
        Rerr = Rdes @ Rcur.T
        w = 0.5 * np.array([Rerr[2, 1] - Rerr[1, 2],
                            Rerr[0, 2] - Rerr[2, 0],
                            Rerr[1, 0] - Rerr[0, 1]])
        dx = np.concatenate([target - self.d.site_xpos[self.sid], wrot * w])
        dq = J.T @ np.linalg.solve(J @ J.T + 0.02 * np.eye(6), dx)
        a = np.zeros(9)
        a[:7] = np.clip(dq * gain, -1, 1)
        a[7:] = grip
        return a

    def eef(self):
        return self.d.site_xpos[self.sid]

    def servo(self, tfun, Rfun, grip, steps, tol=0.015, ki=0.1,
              stop=None, at_grip=False):
        """`at_grip=True` drives the FINGERTIP-PAD midpoint to the target
        (site target shifted back by the hand-frame grip offset) — needed
        for small grasp targets like the burner-knob paddle."""
        for _ in range(steps):
            if self.done or (stop is not None and stop()):
                return
            tgt = np.asarray(tfun(), np.float64)
            if at_grip:
                tgt = tgt - Rfun() @ self.grip_off
            err = tgt - self.eef()
            if tol is not None and np.linalg.norm(err) < tol:
                return
            self.I = np.clip(self.I + ki * err, -0.08, 0.08)
            self.step(self.ik6(tgt + self.I, Rfun(), grip))

    def hold_close(self, Rfun, n=10):
        for _ in range(n):
            if self.done:
                return
            self.step(self.ik6(self.eef() + self.I, Rfun(), -1.0))

    # -- tasks -----------------------------------------------------------
    def _task_done(self, before):
        return self.task_reward > before

    def begin_task(self):
        """Between-task reset: clear the servo integral (contact pressure
        accumulated while dragging poisons the next approach) and retreat
        to a clutter-free staging pose so every script starts from a
        comparable arm configuration (tasks chained after another task
        otherwise fail: the approach collides or the wrist is wound)."""
        self.I[:] = 0.0
        self.servo(lambda: np.array([-0.35, 0.25, 2.1]),
                   lambda: self.R0, 1.0, 30, tol=0.06)
        self.I[:] = 0.0

    def microwave(self, budget=150):
        """Grasp the door bar, drag it along the hinge arc (wrist tracks
        the door angle); regrasp on slip."""
        self.begin_task()
        t0, r0 = self.steps, self.task_reward
        hs = self.site["microhandle_site"]
        hinge = self.anchor["microwave"]
        qa = self.jadr["microwave"]
        ang = lambda: float(self.d.qpos[qa])
        Rf = lambda: rotz(ang()) @ self.R0
        jit = self.jit()
        while (not self._task_done(r0) and not self.done
               and self.steps - t0 < budget):
            self.servo(lambda: self.d.site_xpos[hs]
                       + rotz(ang()) @ np.array([0.0, -0.08, 0.0]) + jit,
                       Rf, 1.0, 60, tol=0.02)
            self.servo(lambda: self.d.site_xpos[hs] + np.array([0, 0.005, 0]),
                       Rf, 1.0, 30, tol=0.013)
            self.hold_close(Rf, 8)
            for _ in range(70):
                if self._task_done(r0) or self.done:
                    break
                h = self.d.site_xpos[hs].copy()
                h[:2] = hinge + rotz(-0.4)[:2, :2] @ (h[:2] - hinge)
                self.step(self.ik6(h + self.I, Rf(), -1.0))
                if np.linalg.norm(self.eef() - self.d.site_xpos[hs]) > 0.07:
                    break  # slipped: regrasp
        return self._task_done(r0)

    def light_switch(self, budget=110):
        self.begin_task()
        t0, r0 = self.steps, self.task_reward
        ls = self.site["light_site"]
        anch = self.anchor["light_switch"]
        qa = self.jadr["light_switch"]
        Rf = lambda: rotz(float(self.d.qpos[qa])) @ self.R0
        jit = self.jit()
        while (not self._task_done(r0) and not self.done
               and self.steps - t0 < budget):
            self.servo(lambda: self.d.site_xpos[ls]
                       + np.array([0.0, -0.07, 0.0]) + jit, Rf, 1.0, 60,
                       tol=0.02)
            self.servo(lambda: self.d.site_xpos[ls] + np.array([0, 0.01, 0]),
                       Rf, 1.0, 30, tol=0.013)
            self.hold_close(Rf, 8)
            for _ in range(60):
                if self._task_done(r0) or self.done:
                    break
                h = self.d.site_xpos[ls].copy()
                h[:2] = anch + rotz(-0.5)[:2, :2] @ (h[:2] - anch)
                self.step(self.ik6(h + self.I, Rf(), -1.0))
                if np.linalg.norm(self.eef() - self.d.site_xpos[ls]) > 0.06:
                    break
        return self._task_done(r0)

    def kettle(self, budget=170):
        """Pick by the top bar (wrist rolled 90 deg so the fingers close
        vertically), carry to the rear burner, set down."""
        self.begin_task()
        t0, r0 = self.steps, self.task_reward
        qa = self.jadr["kettle"]
        kq = lambda: self.d.qpos[qa:qa + 3]
        Rg = roty(-np.pi / 2) @ self.R0
        Rf = lambda: Rg
        jit = self.jit()
        bar = lambda: kq() + np.array([-0.004, -0.002, 0.259])
        for _ in range(2):  # one grasp retry if the fingers closed on air
            self.servo(lambda: bar() + np.array([0.0, -0.12, 0.04]) + jit,
                       Rf, 1.0, 70, tol=0.025)
            self.servo(bar, Rf, 1.0, 40, tol=0.013)
            self.hold_close(Rf, 10)
            if float(self.d.qpos[7] + self.d.qpos[8]) > 0.012:
                break  # bar between the fingers
            # closed on air: reopen above the bar and re-approach
            self.servo(lambda: bar() + np.array([0.0, -0.10, 0.06]),
                       Rf, 1.0, 15, tol=0.03)
        self.servo(lambda: np.array([-0.25, 0.40, 2.05]), Rf, -1.0, 40,
                   tol=0.03)
        goal = np.array([-0.234, 0.745, 2.02]) + self.jit()
        done_fn = lambda: self._task_done(r0)
        self.servo(lambda: goal, Rf, -1.0, 80, tol=0.03, stop=done_fn)
        self.servo(lambda: np.array([-0.234, 0.748, 1.89]), Rf, -1.0, 50,
                   tol=0.02, stop=done_fn)
        for _ in range(10):
            if self.done or self._task_done(r0):
                break
            self.step(self.ik6(self.eef(), Rg, 1.0))
        del t0, budget
        return self._task_done(r0)

    def bottom_burner(self, budget=150):
        """Grasp the knob paddle, roll the wrist about +y to twist it.

        The twist monitors knob-angle progress: a grasp that closed on air
        or slipped mid-twist stalls the angle while the wrist keeps
        rolling — detected every 12 steps, triggering a reopen + regrasp
        (the round-4 script twisted blind and lost ~60% of attempts)."""
        self.begin_task()
        t0, r0 = self.steps, self.task_reward
        knob = self.d.site_xpos[self.site["knob2_site"]].copy()
        qa = self.jadr["knob_Joint_2"]
        jit = self.jit()
        while (not self._task_done(r0) and not self.done
               and self.steps - t0 < budget):
            # (re)grasp with the wrist pre-rolled to the CURRENT blade
            # angle — after a partial twist the blade is no longer
            # vertical, and a home-angle approach closes across it
            q0 = -float(self.d.qpos[qa])
            Rg = roty(q0) @ self.R0
            self.servo(lambda: knob + np.array([0.0, -0.08, 0.0]) + jit,
                       lambda: Rg, 1.0, 40, tol=0.02, at_grip=True)
            self.servo(lambda: knob, lambda: Rg, 1.0, 35, tol=0.013,
                       at_grip=True)
            self.hold_close(lambda: Rg, 8)
            # the wrist roll pivots about the EEF SITE, but the fingers
            # grip offset from it — rolling with the site pinned at the
            # knob center translates the fingertips and drags the paddle
            # off. Command the site along the compensating arc so the
            # GRIP POINT stays on the knob axis while the hand rolls.
            u = self.R0.T @ (knob - self.eef())  # hand-frame grip lever
            k, last_ang, stall = 0, float(self.d.qpos[qa]), 0
            while (not self._task_done(r0) and not self.done
                   and self.steps - t0 < budget):
                k += 1
                th = min(1.15, q0 + 0.02 * k)
                R = roty(th)
                self.step(self.ik6(knob - R @ roty(-q0) @ self.R0
                                   @ u + self.I, R @ self.R0, -1.0))
                if k % 12 == 0:
                    ang = float(self.d.qpos[qa])
                    stall = stall + 1 if ang > last_ang - 0.02 else 0
                    last_ang = ang
                    if stall >= 2 or th >= 1.15:
                        break  # angle not advancing: regrasp
            if not self._task_done(r0):
                self.I[:] = 0.0
                self.servo(lambda: knob + np.array([0.0, -0.08, 0.02]),
                           lambda: self.R0, 1.0, 10, tol=0.03)
        return self._task_done(r0)

    TASKS = {"microwave": microwave, "light switch": light_switch,
             "kettle": kettle, "bottom burner": bottom_burner}


def rollout_episodes(n_episodes, seed=0, tasks=EVAL_TASKS, noise=0.05,
                     log_every=20):
    """Roll demonstration episodes; returns d4rl arrays + per-episode
    completion counts."""
    from cleandiffuser_tpu.env.kitchen import make_kitchen_env

    rng = np.random.default_rng(seed)
    env = make_kitchen_env(tasks)
    cols = {k: [] for k in ("observations", "actions", "rewards",
                            "terminals", "timeouts")}
    completions = []
    t0 = time.time()
    # order families measured at 10-ep resolution (logs/probe_kitchen_*):
    # microwave must go FIRST (90-100% at pos0, ~0% at pos2+ — the open
    # door walls off later approaches), the burner knob is unreachable
    # after the kettle lands beside it, and kettle-first wastes ~180
    # steps. A/B measure 2.2 completions/ep; C (light-first) 1.7 adds
    # start diversity; 10% stays fully random for mixed-regime coverage.
    FAMILIES = [
        (0.40, ["microwave", "bottom burner", "kettle"]),
        (0.35, ["microwave", "kettle", "light switch"]),
        (0.15, ["light switch", "kettle", "bottom burner"]),
    ]
    COST = {"microwave": 70, "light switch": 90, "bottom burner": 105,
            "kettle": 140}
    fam_p = np.array([p for p, _ in FAMILIES] + [0.10])
    for ep in range(n_episodes):
        sc = KitchenScripter(env, rng, noise=noise)
        sc.reset(seed=seed * 100_003 + ep)
        pick = rng.choice(len(fam_p), p=fam_p)
        order = (list(rng.permutation(tasks)) if pick == len(FAMILIES)
                 else [t for t in FAMILIES[pick][1] if t in tasks])
        # mixed regime: sometimes drop the tail of the sequence
        if rng.uniform() < 0.15:
            order = order[: rng.integers(2, len(order) + 1)]
        got = 0
        for task in order:
            if sc.done:
                break
            # only skip hopeless attempts: kettle at pos2 still wins 62%
            # of tight-budget tries (probe), so the gate stays loose
            if MAX_PATH - 1 - sc.steps < 0.35 * COST.get(task, 100):
                continue  # cannot plausibly fit — try a cheaper one
            got += bool(KitchenScripter.TASKS[task](sc))
        # pad a few settle steps so short episodes keep context
        for _ in range(min(5, MAX_PATH - 1 - sc.steps)):
            if sc.done:
                break
            sc.step(sc.ik6(sc.eef(), sc.R0, 1.0))
        completions.append(got)
        T = len(sc.trace)
        for i, (obs, act, rew, term) in enumerate(sc.trace):
            cols["observations"].append(obs)
            cols["actions"].append(act)
            cols["rewards"].append(rew)
            cols["terminals"].append(float(term))
            cols["timeouts"].append(float(i == T - 1 and not term))
        if (ep + 1) % log_every == 0:
            sps = sum(len(c) for c in [cols["rewards"]]) and (
                len(cols["rewards"]) / max(time.time() - t0, 1e-9))
            print(f"[kitchen-demo] ep {ep + 1}/{n_episodes}: "
                  f"mean completions "
                  f"{np.mean(completions[-log_every:]):.2f}, "
                  f"{len(cols['rewards'])} steps ({sps:.0f}/s)", flush=True)
    env.close()
    data = {
        "observations": np.asarray(cols["observations"], np.float32),
        "actions": np.asarray(cols["actions"], np.float32),
        "rewards": np.asarray(cols["rewards"], np.float32),
        "terminals": np.asarray(cols["terminals"], np.float32),
        "timeouts": np.asarray(cols["timeouts"], np.float32),
    }
    return data, np.asarray(completions)


def densify_rewards(data):
    """Convert sparse newly-completed bonuses to d4rl's stored-hdf5 kitchen
    reward semantics: rewards[t] = number of tasks completed SO FAR in the
    episode (the latched count — completions persist once achieved), i.e.
    the per-episode cumulative sum of the sparse bonuses. d4rl's kitchen
    hdf5 files store this dense count (that is what makes the reference's
    DD return_scale=400 / target_return=0.85 coherent: ~2-3 tasks held for
    ~150 remaining steps ≈ 340 discounted return; with sparse ≤4-total
    rewards the conditioning value would be ~100x out of distribution).
    The EVAL env still pays the sparse bonus (reference
    env/kitchen/base.py:87-119 with REMOVE_TASKS_WHEN_COMPLETE), clipped
    to [0, 4] — only the dataset rewards are dense."""
    rew = np.asarray(data["rewards"], np.float32)
    ends = (np.asarray(data["terminals"]) > 0) | (np.asarray(data["timeouts"]) > 0)
    out = np.empty_like(rew)
    start = 0
    for end in np.flatnonzero(ends):
        out[start:end + 1] = np.cumsum(rew[start:end + 1])
        start = end + 1
    if start < len(rew):  # trailing open episode
        out[start:] = np.cumsum(rew[start:])
    return {**data, "rewards": out}


def to_qlearning(data):
    keep = ~((data["timeouts"][:-1] > 0) | (data["terminals"][:-1] > 0))
    return {
        "observations": data["observations"][:-1][keep],
        "actions": data["actions"][:-1][keep],
        "next_observations": data["observations"][1:][keep],
        "rewards": data["rewards"][:-1][keep],
        "terminals": data["terminals"][:-1][keep],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", default="kitchen-mixed-v0")
    ap.add_argument("--episodes", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.out is None:
        from cleandiffuser_tpu.pipelines.data_loading import DATA_DIR
        out_dir = DATA_DIR
    else:
        out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    data, comp = rollout_episodes(args.episodes, seed=args.seed,
                                  noise=args.noise)
    data = densify_rewards(data)
    np.savez_compressed(out_dir / f"{args.name}.npz", **data)
    np.savez_compressed(out_dir / f"{args.name}.qlearning.npz",
                        **to_qlearning(data))
    print(f"[data] wrote {args.name}: {data['rewards'].shape[0]} steps, "
          f"{len(comp)} episodes, completions mean {comp.mean():.2f} "
          f"(dist {np.bincount(comp, minlength=5).tolist()}), "
          f"reward/step {data['rewards'].mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
