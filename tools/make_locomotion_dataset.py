"""Generate d4rl-style locomotion datasets on REAL MuJoCo-v5 physics.

d4rl's locomotion suites were produced by training SAC online and logging
policies at two capability levels (d4rl paper §4):
  medium        1M steps sampled from a partially-trained policy
  medium-replay the replay buffer accumulated up to the medium point
  medium-expert 1M medium + 1M fully-trained-policy steps concatenated

d4rl is not installable here, so this tool re-creates the recipe with
cleandiffuser_tpu.utils.sac on gymnasium's -v5 envs and writes the
standard snapshot schema into `$CLEANDIFFUSER_DATA`
(<d4rl-name>.npz + .qlearning.npz), which flips the locomotion CLIs from
synthetic to real data with zero code change
(pipelines/data_loading.py resolution order). Scores measured against
these datasets carry the documented v2-vs-v5 dynamics caveat
(BASELINE.md "Eval-environment fidelity caveats").

TPU layout: MuJoCo steps on the host, but the replay ring and all SAC
updates live ON THE CHIP — one fused dispatch per n_envs env steps
(utils/sac.py DeviceCollector), so the ~30ms tunnel round-trip is
amortized over 128 env steps + 128 gradient updates. Evaluation and
dataset rollouts use the host-numpy actor (NumpyActor) and never touch
the device. Pass --platform cpu to run fully on the CPU backend.

Usage:
    python tools/make_locomotion_dataset.py halfcheetah [--seed 0]
    python tools/make_locomotion_dataset.py --all
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GYM_IDS = {
    "halfcheetah": "HalfCheetah-v5",
    "hopper": "Hopper-v5",
    "walker2d": "Walker2d-v5",
}
# normalized-score capability gates for the policy snapshots, set to the
# MEASURED d4rl dataset behavior averages (tools/dataset_quality.py
# D4RL_DATASET_AVG; medium-expert implies the expert halves). Gating is on
# the STOCHASTIC policy return — the datasets are rolled out stochastically,
# and gating on the deterministic mean action systematically overshoots the
# data quality (round 4 measured walker2d-medium at 0.468 against a 0.620
# target with a 0.60 deterministic gate).
MEDIUM_TARGET = {"halfcheetah": 0.405, "hopper": 0.446, "walker2d": 0.62}
EXPERT_TARGET = {"halfcheetah": 0.88, "hopper": 0.95, "walker2d": 1.00}


def _score_fn(env_prefix):
    from cleandiffuser_tpu.pipelines.data_loading import D4RL_SCORE_RANGES

    lo, hi = D4RL_SCORE_RANGES[env_prefix]
    return lambda ret: (ret - lo) / (hi - lo)


def evaluate_mean(env_id, actor_params, episodes=5, seed=0,
                  stochastic=False):
    """Mean return of the snapshot; `stochastic=True` samples actions from
    the policy exactly like `rollout` does, so gate decisions measure the
    return level of the data that will actually be logged."""
    import gymnasium as gym

    from cleandiffuser_tpu.utils.sac import NumpyActor

    pi = NumpyActor(actor_params)
    rng = np.random.default_rng(seed + 31) if stochastic else None
    env = gym.make(env_id)
    rets = []
    for ep in range(episodes):
        obs, _ = env.reset(seed=seed + ep)
        done, ret = False, 0.0
        while not done:
            act = pi(obs[None].astype(np.float32), rng)[0]
            obs, rew, term, trunc, _ = env.step(act)
            ret += float(rew)
            done = term or trunc
        rets.append(ret)
    env.close()
    return float(np.mean(rets))


def train_sac(env_prefix, seed=0, n_envs=128, max_steps=3_000_000,
              warmup=10_000, eval_every=25_000, out_dir=Path("dev/d4rl"),
              log_every=25_000, stop_at_medium=False):
    """Online SAC (device-resident ring+updates); returns
    (sac, medium_actor, expert_actor, medium_replay_export)."""
    import gymnasium as gym

    from cleandiffuser_tpu.utils.sac import SAC, DeviceCollector

    env_id = GYM_IDS[env_prefix]
    score = _score_fn(env_prefix)
    envs = gym.vector.SyncVectorEnv(
        [lambda: gym.make(env_id) for _ in range(n_envs)])
    obs_dim = envs.single_observation_space.shape[0]
    act_dim = envs.single_action_space.shape[0]
    sac = SAC(obs_dim, act_dim, rng=seed)
    # medium-replay = the ring over the FULL from-scratch learning curve up
    # to the medium gate (d4rl semantics); 2M capacity so the later
    # stochastic gate can't evict the early curve (168B/transition)
    col = DeviceCollector(sac, 2_000_000, n_envs)
    host_rng = np.random.default_rng(seed)
    env_ids = np.arange(n_envs, dtype=np.int32)

    obs, _ = envs.reset(seed=seed)
    medium_actor = expert_actor = None
    medium_replay = None
    snapshots = []  # (normalized_score, actor) at every eval
    calibrated = []  # (20-episode calibrated score, actor) past the gate
    t0, steps = time.time(), 0
    new = None

    def export_replay():
        # flush the pending transition batch — it is only pushed at the
        # TOP of the next iteration, so exporting without this silently
        # drops the final n_envs transitions (ADVICE r2 #2)
        nonlocal new
        if new is not None:
            col.step(obs.astype(np.float32), new, update=False)
            new = None
        return col.export()
    # gymnasium >=1.0 NEXT_STEP autoreset: a done step returns the true
    # final obs; the FOLLOWING step is the reset (action ignored, rew 0)
    # and must not enter the replay
    prev_done = np.zeros((n_envs,), bool)
    while steps < max_steps:
        if steps < warmup:
            act = host_rng.uniform(-1, 1, (n_envs, act_dim)).astype(np.float32)
            if new is not None:
                col.step(obs.astype(np.float32), new, update=False)
        else:
            act, log = col.step(obs.astype(np.float32), new, update=True)
        nobs, rew, term, trunc, info = envs.step(act)
        valid = ~prev_done  # post-done autoreset rows must not enter replay
        done = np.logical_or(term, trunc)
        # bootstrap mask uses TERM only (timeouts bootstrap through);
        # rows stay at fixed n_envs width (mask column) so the fused
        # device program compiles once
        new = {"obs": obs.astype(np.float32),
               "act": act.astype(np.float32),
               "rew": rew.astype(np.float32),
               "next_obs": nobs.astype(np.float32),
               "term": term.astype(np.float32),
               "done": done.astype(np.float32),
               "env": env_ids,
               "mask": valid.astype(np.float32)}
        prev_done = done
        obs = nobs
        steps += n_envs
        if steps % log_every < n_envs and steps >= warmup:
            sps = steps / max(time.time() - t0, 1e-9)
            print(f"[sac:{env_prefix}] {steps} steps ({sps:.0f}/s) "
                  f"q={float(log['q_mean']):.1f} alpha={float(log['alpha']):.3f}",
                  flush=True)
        if steps % eval_every < n_envs and steps >= warmup:
            actor_now = sac.snapshot_actor()
            ret = evaluate_mean(env_id, actor_now, episodes=5,
                                seed=seed + 100, stochastic=True)
            ns = score(ret)
            print(f"[sac:{env_prefix}] eval @ {steps}: return={ret:.0f} "
                  f"normalized(stoch)={ns:.3f}", flush=True)
            snapshots.append((ns, actor_now))
            if medium_actor is None and ns >= MEDIUM_TARGET[env_prefix]:
                target = MEDIUM_TARGET[env_prefix]
                if medium_replay is None:
                    # d4rl ring semantics: medium-replay is the learning
                    # curve up to the FIRST gate crossing, regardless of
                    # which (possibly later) snapshot the pick settles on
                    medium_replay = export_replay()
                    if steps > 2_000_000:
                        print(f"[sac:{env_prefix}] WARNING: medium gate "
                              f"crossed at {steps} > ring capacity — the "
                              "replay export is missing the earliest curve",
                              flush=True)
                # A 5-episode stochastic eval overestimates long-run
                # stability on fall-prone envs: walker2d's 0.636 pick
                # rolled out to a 0.468 dataset mean vs d4rl's 0.620
                # (round-5 bias table). Calibrate with 20 episodes and
                # only pick a snapshot whose calibrated mean reaches the
                # target; keep training until one does.
                ns_cal = score(evaluate_mean(env_id, actor_now, episodes=20,
                                             seed=seed + 200,
                                             stochastic=True))
                calibrated.append((ns_cal, actor_now))
                print(f"[sac:{env_prefix}] medium calibration @ {steps}: "
                      f"5-ep {ns:.3f} -> 20-ep {ns_cal:.3f} "
                      f"(target {target})", flush=True)
                if ns_cal >= target - 0.02:
                    medium_actor = actor_now
                    sac.save(str(out_dir / f"{env_prefix}_sac_medium.pkl"))
                    print(f"[sac:{env_prefix}] MEDIUM snapshot @ {steps} "
                          f"(calibrated {ns_cal:.3f})", flush=True)
                    if stop_at_medium:
                        break
            if ns >= EXPERT_TARGET[env_prefix]:
                expert_actor = actor_now
                sac.save(str(out_dir / f"{env_prefix}_sac_expert.pkl"))
                print(f"[sac:{env_prefix}] EXPERT snapshot @ {steps} "
                      f"(normalized {ns:.3f})", flush=True)
                break
    envs.close()
    if medium_actor is None and calibrated:
        # crossed the gate but no calibrated pick reached target (e.g. the
        # expert gate broke the loop first): best calibrated candidate
        ns_med, medium_actor = min(
            calibrated, key=lambda p: abs(p[0] - MEDIUM_TARGET[env_prefix]))
        sac.save(str(out_dir / f"{env_prefix}_sac_medium.pkl"))
        print(f"[sac:{env_prefix}] medium fallback pick: calibrated "
              f"{ns_med:.3f}", flush=True)
    if medium_actor is None:  # never crossed the gate: use final
        medium_actor = sac.snapshot_actor()
        medium_replay = export_replay()
    if expert_actor is None:
        expert_actor = sac.snapshot_actor()
        print(f"[sac:{env_prefix}] WARNING: expert gate not reached by "
              f"{max_steps} steps; using final policy", flush=True)
    return sac, medium_actor, expert_actor, medium_replay


def rollout(env_prefix, actor_params, n_steps, seed=0, n_envs=16):
    """Log `n_steps` of the (stochastic) policy in the d4rl schema.
    Pure host loop: numpy actor + SyncVectorEnv."""
    import gymnasium as gym

    from cleandiffuser_tpu.utils.sac import NumpyActor

    pi = NumpyActor(actor_params)
    rng = np.random.default_rng(seed + 7)
    env_id = GYM_IDS[env_prefix]
    envs = gym.vector.SyncVectorEnv(
        [lambda: gym.make(env_id) for _ in range(n_envs)])
    obs, _ = envs.reset(seed=seed + 1000)
    O, A = (envs.single_observation_space.shape[0],
            envs.single_action_space.shape[0])
    # NEXT_STEP autoreset: skip the bogus reset rows (see train_sac).
    # Collect per-env columns and concatenate env-major so each env's
    # trajectory stays contiguous — d4rl streams are episode-ordered, and
    # the sequence datasets split on terminal/timeout flags.
    per = n_steps // n_envs
    cols = {k: np.zeros((n_envs, per) + s, np.float32) for k, s in
            (("observations", (O,)), ("actions", (A,)), ("rewards", ()),
             ("terminals", ()), ("timeouts", ()))}
    fill = np.zeros((n_envs,), np.int64)
    prev_done = np.zeros((n_envs,), bool)
    while fill.min() < per:
        act = pi(obs.astype(np.float32), rng)
        nobs, rew, term, trunc, _ = envs.step(act)
        valid = np.logical_and(~prev_done, fill < per)
        for i in np.nonzero(valid)[0]:
            j = fill[i]
            cols["observations"][i, j] = obs[i]
            cols["actions"][i, j] = act[i]
            cols["rewards"][i, j] = rew[i]
            cols["terminals"][i, j] = float(term[i])
            cols["timeouts"][i, j] = float(trunc[i])
            fill[i] += 1
        prev_done = np.logical_or(term, trunc)
        obs = nobs
    envs.close()
    data = {k: v.reshape((n_envs * per,) + v.shape[2:]) for k, v in cols.items()}
    # each env's last row ends its (possibly mid-flight) episode
    for i in range(n_envs):
        row = (i + 1) * per - 1
        if data["terminals"][row] == 0:
            data["timeouts"][row] = 1.0
    return data


def to_qlearning(data):
    """Transition view (d4rl qlearning_dataset semantics) of an
    EPISODE-CONTIGUOUS stream: TIMEOUT rows are dropped (their successor
    is a reset and the timeout must not be bootstrapped as a terminal),
    TERMINAL rows are KEPT — their next_observations slot is the following
    episode's first obs, which TD targets never read because
    (1 - terminal) masks the bootstrap. NOT valid for replay-ring exports
    (env-interleaved rows); those carry their own stored-successor view."""
    keep = ~(data["timeouts"][:-1] > 0)
    return {
        "observations": data["observations"][:-1][keep],
        "actions": data["actions"][:-1][keep],
        "next_observations": data["observations"][1:][keep],
        "rewards": data["rewards"][:-1][keep],
        "terminals": data["terminals"][:-1][keep],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("envs", nargs="*", default=[])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-envs", type=int, default=128)
    ap.add_argument("--max-steps", type=int, default=3_000_000)
    ap.add_argument("--eval-every", type=int, default=25_000,
                    help="gate-eval cadence in env steps; tighten (e.g. "
                         "10000) for fast-learning envs like hopper so the "
                         "medium gate isn't overshot")
    ap.add_argument("--rollout-steps", type=int, default=1_000_000)
    ap.add_argument("--platform", default=None,
                    help="'cpu' forces the CPU backend (default: chip)")
    ap.add_argument("--reuse-medium", action="store_true",
                    help="reuse a pre-existing <env>-medium-v2.npz instead "
                         "of rolling a fresh one (off by default: a stale "
                         "file from another seed/run would silently mix "
                         "into medium-expert)")
    ap.add_argument("--replay-only", action="store_true",
                    help="stop after writing <env>-medium-replay-v2 (a "
                         "fresh SAC run to the medium gate is ~2 min on "
                         "chip; use --max-steps to bound it)")
    ap.add_argument("--medium-only", action="store_true",
                    help="write medium-replay AND the medium rollout, then "
                         "skip the expert/medium-expert stages (SAC stops "
                         "at the calibrated medium pick — minutes, not the "
                         "3M-step expert chase)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    envs = list(GYM_IDS) if args.all else args.envs
    if not envs:
        ap.error("pass env prefixes (halfcheetah/hopper/walker2d) or --all")
    if args.out is None:
        from cleandiffuser_tpu.pipelines.data_loading import DATA_DIR
        out_dir = DATA_DIR
    else:
        out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    def write(name, data, q=None):
        np.savez_compressed(out_dir / f"{name}.npz", **data)
        np.savez_compressed(out_dir / f"{name}.qlearning.npz",
                            **(q if q is not None else to_qlearning(data)))
        print(f"[data] wrote {name}: {data['rewards'].shape[0]} steps, "
              f"mean step reward {data['rewards'].mean():.3f}", flush=True)

    for env_prefix in envs:
        sac, medium, expert, med_replay = train_sac(
            env_prefix, seed=args.seed, n_envs=args.n_envs,
            max_steps=args.max_steps, out_dir=out_dir,
            eval_every=args.eval_every,
            stop_at_medium=args.replay_only or args.medium_only)
        # replay first — it already lives on the host, and writing it lets
        # a consumer start before the (minutes-long) rollouts finish
        write(f"{env_prefix}-medium-replay-v2", med_replay,
              med_replay.pop("qlearning"))
        if args.replay_only:
            continue
        med_path = out_dir / f"{env_prefix}-medium-v2.npz"
        if args.reuse_medium and med_path.exists():
            print(f"[data:{env_prefix}] reusing existing {med_path} "
                  "(--reuse-medium)", flush=True)
            med_data = dict(np.load(med_path))
        else:
            print(f"[data:{env_prefix}] rolling out medium "
                  f"x{args.rollout_steps}", flush=True)
            med_data = rollout(env_prefix, medium, args.rollout_steps,
                               seed=args.seed)
            write(f"{env_prefix}-medium-v2", med_data)
        if args.medium_only:
            continue
        print(f"[data:{env_prefix}] rolling out expert x{args.rollout_steps}",
              flush=True)
        exp_data = rollout(env_prefix, expert, args.rollout_steps,
                           seed=args.seed + 1)
        me_data = {k: np.concatenate([med_data[k], exp_data[k]])
                   for k in med_data}
        write(f"{env_prefix}-medium-expert-v2", me_data)


if __name__ == "__main__":
    main()
