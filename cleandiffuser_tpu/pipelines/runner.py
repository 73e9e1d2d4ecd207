"""Shared CLI runner utilities for the pipeline entry points."""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..utils.logger import Logger

__all__ = ["train_loop", "d4rl_eval_loop", "make_rl_train_scan", "rl_window_fn"]


def make_rl_train_scan(pipe, dataset, batch_size: int, n_steps: int):
    """Fused RL trainer: `n_steps` x (device batch gather + actor/critic
    update) compiled into ONE `lax.scan` program (mirrors
    DPPipeline.make_train_scan). Kills per-step Python dispatch — through a
    tunneled chip that dispatch costs ~3-30ms/step against sub-ms compute
    (bench.py: DQL 131 steps/s dispatch-bound vs 2786 steps/s fused on the
    same chip).

    Works for any pipeline exposing `_make_train_step() ->
    fn(actor_state, critic_state, batch)` with states stored at
    `pipe.actor.state` / `pipe.critic_state` (DQL / EDP / IDQL).

    Returns `run(rng) -> log`: advances both states by `n_steps` and
    yields window-mean DEVICE scalars (no host sync).
    """
    gather = dataset.gather_fn(batch_size)
    step_fn = pipe._make_train_step()

    def fused(actor_state, critic_state, rng):
        def body(carry, k):
            a_st, c_st = carry
            a_st, c_st, log = step_fn(a_st, c_st, gather(k))
            return (a_st, c_st), log

        keys = jax.random.split(rng, n_steps)
        (actor_state, critic_state), logs = jax.lax.scan(
            body, (actor_state, critic_state), keys)
        return actor_state, critic_state, jax.tree_util.tree_map(
            lambda x: x.mean(), logs)

    fused_jit = jax.jit(fused, donate_argnums=(0, 1))

    def run(rng):
        pipe.actor.state, pipe.critic_state, log = fused_jit(
            pipe.actor.state, pipe.critic_state, rng)
        return log

    return run


def _mesh_window_ok(args, mesh) -> bool:
    """Fused windows run on a mesh too (the gather pins dp-sharded batches
    inside the scan, dataset/base.py _constrain) — just require the batch
    to divide over the dp axis."""
    if mesh is None:
        return True
    shape = getattr(mesh, "shape", None)
    if shape is None:  # not a jax Mesh: can't validate alignment
        print("[runner] WARNING: mesh has no .shape — falling back to "
              "per-step dispatch (3-30ms/step through the tunnel vs sub-ms "
              "fused windows)", flush=True)
        return False
    if args.batch_size % shape.get("dp", 1) != 0:
        print(f"[runner] WARNING: batch_size={args.batch_size} does not "
              f"divide dp={shape.get('dp', 1)} — falling back to per-step "
              "dispatch", flush=True)
        return False
    return True


def rl_window_fn(pipe, dataset, args, mesh):
    """Build the fused log-window trainer for an RL CLI when the config
    allows it (intervals aligned, batch divides the dp axis); None ->
    per-step path."""
    if not _mesh_window_ok(args, mesh):
        return None
    if (args.save_interval % args.log_interval != 0
            or args.gradient_steps % args.log_interval != 0):
        return None
    return make_rl_train_scan(pipe, dataset, args.batch_size, args.log_interval)


def planner_window_fn(pipe, dataset, args, mesh,
                      steps_key: str = "diffusion_gradient_steps"):
    """Like rl_window_fn for planner pipelines that expose their own
    `make_train_scan` (Diffuser, DD, AdaptDiffuser, SynthER)."""
    if not hasattr(pipe, "make_train_scan") or not _mesh_window_ok(args, mesh):
        return None
    if (args.save_interval % args.log_interval != 0
            or getattr(args, steps_key) % args.log_interval != 0):
        return None
    return pipe.make_train_scan(dataset, args.batch_size, args.log_interval)


def train_loop(
    step_fn: Callable[[jax.Array], Dict[str, float]],
    gradient_steps: int,
    log_interval: int,
    save_interval: int,
    save_fn: Callable[[str], None],
    logger: Optional[Logger] = None,
    seed: int = 0,
    resume_fn: Optional[Callable[[], int]] = None,
    window_fn: Optional[Callable[[jax.Array], Dict[str, jax.Array]]] = None,
):
    """Generic training loop: step_fn(rng) -> log dict of floats.

    Improvements over the reference's bare `for batch in loop_dataloader`:
    per-window steps/sec is logged alongside the losses, and crash recovery
    is built in — pass `resume_fn` (returns the step to resume from, e.g.
    by loading the latest checkpoint; the reference restarts from scratch,
    SURVEY.md §5.3/§5.4).

    `window_fn` (from `make_rl_train_scan`) advances `log_interval` steps
    in ONE fused XLA program; when provided and the schedule aligns, the
    loop runs window-at-a-time with one host fetch per log window.
    """
    import time

    start_step = 0
    if resume_fn is not None:
        start_step = int(resume_fn())
        if start_step > 0:
            print(f"[train_loop] resuming from step {start_step}")
    rng = jax.random.fold_in(jax.random.PRNGKey(seed), start_step)

    if (window_fn is not None and start_step % log_interval != 0
            and start_step < gradient_steps
            and save_interval % log_interval == 0
            and gradient_steps % log_interval == 0):
        # realign to the window grid with per-step dispatch, then switch —
        # silently running the WHOLE run per-step costs 10-20x wall clock
        # (a stale misaligned ckpt_latest once did exactly that). Gated on
        # the same alignment conditions as the window path below so we
        # never pay the per-step realign only to fall through to the
        # per-step loop anyway.
        realign = min(log_interval - start_step % log_interval,
                      gradient_steps - start_step)
        print(f"[train_loop] resume step {start_step} off the "
              f"{log_interval}-step window grid: realigning with "
              f"{realign} per-step updates", flush=True)
        for _ in range(realign):
            rng, k = jax.random.split(rng)
            step_fn(k)
        start_step += realign
        # checkpoint the realigned state: a crash before the next save
        # boundary would otherwise resume from the stale misaligned step
        # and repeat the realign (and any save boundary crossed inside the
        # realign span would have been skipped silently)
        save_fn("latest")
        if start_step % save_interval == 0:
            # the realign span ended exactly ON a save boundary — emit the
            # numbered checkpoint too, keeping the ckpt_<step> series
            # contiguous for downstream ckpt=<step> selection
            save_fn(str(start_step))

    if (window_fn is not None
            and start_step % log_interval == 0
            and save_interval % log_interval == 0
            and gradient_steps % log_interval == 0):
        t_window = time.time()
        step = start_step
        while step < gradient_steps:
            rng, k = jax.random.split(rng)
            log = window_fn(k)
            step += log_interval
            out = {k_: float(v) for k_, v in log.items()}
            out["gradient_steps"] = step
            now = time.time()
            out["steps_per_sec"] = round(log_interval / max(now - t_window, 1e-9), 2)
            t_window = now
            print(out)
            if logger is not None:
                logger.log(out, "train")
            if step % save_interval == 0:
                save_fn(str(step))
                save_fn("latest")
        return
    # accumulate log values ON DEVICE — float(v) per step would force a
    # host sync every step (30ms each over a tunneled chip); one transfer
    # per key per log window instead
    log_acc: Dict[str, jax.Array] = {}
    t_window = time.time()
    for step in range(start_step, gradient_steps):
        rng, k = jax.random.split(rng)
        log = step_fn(k)
        for key, v in log.items():
            log_acc[key] = log_acc.get(key, 0.0) + v
        if (step + 1) % log_interval == 0:
            out = {k_: float(v) / log_interval for k_, v in log_acc.items()}
            out["gradient_steps"] = step + 1
            now = time.time()
            out["steps_per_sec"] = round(log_interval / max(now - t_window, 1e-9), 2)
            t_window = now
            print(out)
            if logger is not None:
                logger.log(out, "train")
            log_acc = {}
        if (step + 1) % save_interval == 0:
            save_fn(str(step + 1))
            save_fn("latest")


def d4rl_eval_loop(
    act_fn: Callable[[np.ndarray], np.ndarray],
    env_name: str,
    normalizer,
    num_envs: int,
    num_episodes: int,
    seed: int = 0,
    max_steps: int = 1000,
    logger: Optional[Logger] = None,
    reward_mode: str = "mujoco",
):
    """Vectorized eval with the reference's per-benchmark reward bookkeeping:

    - "mujoco":  ep_reward += rew * (1 - cum_done) if t < max_steps else rew
                 (reference diffuser_d4rl_mujoco.py:155)
    - "antmaze": ep_reward += rew, clipped to [0, 1]
                 (reference diffuser_d4rl_antmaze.py:156-162)
    - "kitchen": ep_reward += rew, clipped to [0, 4], 280-step horizon
                 (reference diffuser_d4rl_kitchen.py:130,155-160)
    - "maze2d":  finished |= (rew == 1); ep_reward += finished — the latch
                 counts steps-since-first-goal-reach (reference
                 veteran_d4rl_maze2d.py:442-446, d4rl "continuous reward at
                 done" scoring); episode runs the full d4rl path length
    """
    from .data_loading import get_normalized_score_fn, make_eval_env_fns
    from ..env.wrapper import DuckSyncVectorEnv

    if reward_mode == "kitchen":
        max_steps = min(max_steps, 280)
    import inspect

    # an act_fn declaring `ep_reward` receives the running per-env episode
    # reward (used by e.g. kitchen DiffuserLite to ramp the CFG target with
    # completed-subtask count); one declaring `goal_normed` receives the
    # per-env goal xy normalized with the state normalizer's first two dims
    # (goal-inpainting planners, e.g. veteran maze2d goal_inpaint=true)
    sig_params = inspect.signature(act_fn).parameters
    wants_rew = "ep_reward" in sig_params
    wants_goal = "goal_normed" in sig_params
    envs = DuckSyncVectorEnv(make_eval_env_fns(env_name, num_envs))
    score_fn = get_normalized_score_fn(env_name)
    clip_hi = {"antmaze": 1.0, "kitchen": 4.0}.get(reward_mode)
    episode_rewards = []
    for ep in range(num_episodes):
        # non-overlapping seed block per episode: vector reset with int seed
        # seeds sub-envs [s, s+1, ..., s+n-1], so stepping by num_envs keeps
        # every rollout's initial state distinct across episodes
        obs, _ = envs.reset(seed=seed + ep * num_envs)
        ep_reward = np.zeros(num_envs)
        cum_done = np.zeros(num_envs)
        finished = np.zeros(num_envs, dtype=bool)
        goal_normed = None
        if wants_goal:
            # assumes (a) every sub-env exposes `.goal` (currently only the
            # maze2d eval wrappers do) and (b) the normalizer is ELEMENTWISE
            # with position xy in obs dims 0:2 — both hold for d4rl maze2d's
            # Gaussian/MinMax normalizers over [xy, ...] observations
            if not all(hasattr(e, "goal") for e in envs.envs):
                raise ValueError(
                    f"act_fn declares goal_normed but env {env_name} exposes "
                    "no per-env .goal (only maze2d eval wrappers do)")
            goals = np.stack([np.asarray(e.goal, np.float32) for e in envs.envs])
            # normalize goal xy with the state normalizer's position dims
            # (elementwise Gaussian/MinMax stats): pad to obs width, take xy
            pad = np.zeros((num_envs, obs.shape[-1] - 2), np.float32)
            goal_normed = normalizer.normalize(
                np.concatenate([goals, pad], -1))[:, :2]
        t = 0
        while not np.all(cum_done) and t < max_steps + 1:
            nobs = normalizer.normalize(obs)
            kw = {}
            if wants_rew:
                kw["ep_reward"] = ep_reward
            if wants_goal:
                kw["goal_normed"] = goal_normed
            act = np.asarray(act_fn(nobs, **kw))
            obs, rew, term, trunc, _ = envs.step(act)
            done = np.logical_or(term, trunc)
            t += 1
            cum_done = np.logical_or(cum_done, done)
            if reward_mode == "mujoco":
                ep_reward += rew * (1 - cum_done) if t < max_steps else rew
            elif reward_mode == "maze2d":
                finished |= rew == 1.0
                ep_reward += finished
            else:
                ep_reward += rew
        if clip_hi is not None:
            ep_reward = np.clip(ep_reward, 0.0, clip_hi)
        episode_rewards.append([score_fn(r) for r in ep_reward])
        print(f"episode {ep}: {np.mean(episode_rewards[-1]):.3f}")
    episode_rewards = np.array(episode_rewards)
    mean, std = np.mean(episode_rewards, -1), np.std(episode_rewards, -1)
    print(mean, std)
    if logger is not None:
        logger.log({"normalized_score_mean": float(np.mean(episode_rewards)),
                    "normalized_score_std": float(np.std(episode_rewards))}, "inference")
    return episode_rewards
