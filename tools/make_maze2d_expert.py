"""Generate maze2d expert datasets on REAL PointMaze MuJoCo physics.

d4rl's maze2d datasets were produced by a scripted waypoint controller
(d4rl scripts/generate_maze2d_datasets.py); this tool re-creates that
procedure on gymnasium_robotics' PointMaze (the maze2d successor) via
cleandiffuser_tpu.env.maze2d_expert and writes the standard snapshot
schema to `$CLEANDIFFUSER_DATA/<env_name>.npz` (+ `.qlearning.npz`),
which flips the maze2d CLIs from synthetic to real data with zero code
change (resolution order: pipelines/data_loading.py).

Usage:
    python tools/make_maze2d_expert.py maze2d-umaze-v1 [--steps 1000000]
    python tools/make_maze2d_expert.py --all
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.env.maze2d_expert import generate_maze2d_dataset

ALL_ENVS = ["maze2d-umaze-v1", "maze2d-medium-v1", "maze2d-large-v1"]


def to_qlearning(data):
    """Transition view of the continuous stream (d4rl qlearning_dataset)."""
    return {
        "observations": data["observations"][:-1],
        "actions": data["actions"][:-1],
        "next_observations": data["observations"][1:],
        "rewards": data["rewards"][:-1],
        "terminals": data["terminals"][:-1],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("envs", nargs="*", default=[])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--steps", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--out", default=None,
                    help="output dir (default $CLEANDIFFUSER_DATA or dev/d4rl)")
    args = ap.parse_args()
    envs = ALL_ENVS if args.all else args.envs
    if not envs:
        ap.error("pass env names or --all")
    if args.out is None:
        from cleandiffuser_tpu.pipelines.data_loading import DATA_DIR
        out_dir = DATA_DIR
    else:
        out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for env_name in envs:
        print(f"[maze2d-expert] generating {env_name}: {args.steps} steps")
        data = generate_maze2d_dataset(env_name, n_steps=args.steps,
                                       seed=args.seed, noise_scale=args.noise,
                                       log_every=max(args.steps // 20, 1))
        np.savez_compressed(out_dir / f"{env_name}.npz", **data)
        np.savez_compressed(out_dir / f"{env_name}.qlearning.npz",
                            **to_qlearning(data))
        n_goals = int(data["rewards"].sum())
        print(f"[maze2d-expert] {env_name}: {n_goals} goal events -> "
              f"{out_dir / (env_name + '.npz')}")


if __name__ == "__main__":
    main()
