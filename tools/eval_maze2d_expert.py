"""Measure the waypoint expert's own score on the maze2d eval env.

Context for the PARITY.md veteran_maze2d row: d4rl's published maze2d
normalization constants (data_loading.py D4RL_SCORE_RANGES, from d4rl's
mujoco-py maze2d ball dynamics) do not transfer 1:1 to gymnasium_robotics'
PointMaze physics — the ball accelerates more slowly, so even an oracle
reaches the goal later in the 300-step horizon and banks fewer rewarded
steps. This script runs the SAME scripted waypoint controller that
generated the training dataset (env/maze2d_expert.py) through the SAME
eval bookkeeping the suite uses (steps-since-first-reach latch,
runner.d4rl_eval_loop reward_mode='maze2d') and prints its mean normalized
score — the effective ceiling for any policy trained on its demonstrations
and evaluated on this env.

Usage: python tools/eval_maze2d_expert.py [env_name] [--episodes N]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.env.d4rl_eval import (  # noqa: E402
    MAZE2D_EVAL_MAX_STEPS,
    make_maze2d_env,
)
from cleandiffuser_tpu.env.maze2d_expert import WaypointController  # noqa: E402
from cleandiffuser_tpu.pipelines.data_loading import D4RL_SCORE_RANGES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_name", nargs="?", default="maze2d-umaze-v1")
    ap.add_argument("--episodes", type=int, default=50)
    args = ap.parse_args()

    lo, hi = D4RL_SCORE_RANGES[args.env_name.rsplit("-", 1)[0]]
    horizon = MAZE2D_EVAL_MAX_STEPS[args.env_name]
    env = make_maze2d_env(args.env_name)

    scores, reach_steps = [], []
    for ep in range(args.episodes):
        obs, _ = env.reset(seed=ep)
        ctrl = WaypointController(env.env.unwrapped.maze)
        finished, ep_reward, first = False, 0.0, None
        for t in range(horizon):
            act = ctrl.act(obs, env.goal)
            obs, rew, term, trunc, _ = env.step(act)
            if rew == 1.0 and first is None:
                first = t
            finished |= rew == 1.0
            ep_reward += float(finished)
            if term or trunc:
                break
        score = (ep_reward - lo) / (hi - lo)
        scores.append(score)
        reach_steps.append(first if first is not None else horizon)
        print(f"episode {ep}: score={score:.3f} first_reach={first}")
    env.close()

    print(
        f"\n{args.env_name}: expert mean normalized score "
        f"{np.mean(scores):.3f} +- {np.std(scores):.3f} over "
        f"{args.episodes} episodes (median first-reach step "
        f"{int(np.median(reach_steps))}/{horizon})"
    )


if __name__ == "__main__":
    main()
