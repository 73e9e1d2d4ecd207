"""Export d4rl datasets to the .npz snapshot schema this repo trains from.

Run this ON A MACHINE WHERE d4rl IS INSTALLED (it is not installable in the
TPU environment); copy the resulting files into `$CLEANDIFFUSER_DATA`
(default `dev/d4rl/`) next to the repo. Every training CLI then flips from
the synthetic fallback to the real data with ZERO code change — resolution
order in cleandiffuser_tpu/pipelines/data_loading.py:
    1. import d4rl           (this machine)
    2. <env_name>.npz / <env_name>.qlearning.npz snapshots   (exported here)
    3. synthetic generator   (hermetic fallback)

Schema (keys exactly as d4rl returns them):
    <env>.npz           observations, actions, rewards, terminals, timeouts
    <env>.qlearning.npz observations, actions, next_observations, rewards,
                        terminals

Usage:
    python tools/make_d4rl_snapshot.py halfcheetah-medium-v2 [...more envs]
    python tools/make_d4rl_snapshot.py --all-mujoco --out dev/d4rl
"""

import argparse
from pathlib import Path

import numpy as np

MUJOCO_ENVS = [
    f"{robot}-{grade}-v2"
    for robot in ("halfcheetah", "hopper", "walker2d")
    for grade in ("medium", "medium-expert", "medium-replay")
]
ANTMAZE_ENVS = [
    "antmaze-umaze-v2", "antmaze-umaze-diverse-v2",
    "antmaze-medium-play-v2", "antmaze-medium-diverse-v2",
    "antmaze-large-play-v2", "antmaze-large-diverse-v2",
]
KITCHEN_ENVS = ["kitchen-partial-v0", "kitchen-mixed-v0", "kitchen-complete-v0"]
MAZE2D_ENVS = ["maze2d-umaze-v1", "maze2d-medium-v1", "maze2d-large-v1"]

SEQ_KEYS = ["observations", "actions", "rewards", "terminals", "timeouts"]
QL_KEYS = ["observations", "actions", "next_observations", "rewards", "terminals"]


def export(env_name: str, out_dir: Path):
    import gym

    import d4rl  # noqa: F401

    env = gym.make(env_name)
    out_dir.mkdir(parents=True, exist_ok=True)

    data = env.get_dataset()
    seq = {k: np.asarray(data[k]) for k in SEQ_KEYS if k in data}
    if "timeouts" not in seq:  # some suites omit timeouts
        seq["timeouts"] = np.zeros_like(np.asarray(data["terminals"]), dtype=np.float32)
    path = out_dir / f"{env_name}.npz"
    np.savez_compressed(path, **seq)
    print(f"wrote {path} ({seq['observations'].shape[0]} steps)")

    ql = d4rl.qlearning_dataset(env)
    path = out_dir / f"{env_name}.qlearning.npz"
    np.savez_compressed(path, **{k: np.asarray(ql[k]) for k in QL_KEYS})
    print(f"wrote {path} ({ql['observations'].shape[0]} transitions)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("envs", nargs="*", help="d4rl env names")
    p.add_argument("--all-mujoco", action="store_true")
    p.add_argument("--all-antmaze", action="store_true")
    p.add_argument("--all-kitchen", action="store_true")
    p.add_argument("--all-maze2d", action="store_true")
    p.add_argument("--out", default="dev/d4rl")
    args = p.parse_args()

    envs = list(args.envs)
    if args.all_mujoco:
        envs += MUJOCO_ENVS
    if args.all_antmaze:
        envs += ANTMAZE_ENVS
    if args.all_kitchen:
        envs += KITCHEN_ENVS
    if args.all_maze2d:
        envs += MAZE2D_ENVS
    if not envs:
        p.error("no envs given (use names or --all-* flags)")
    for env_name in envs:
        export(env_name, Path(args.out))


if __name__ == "__main__":
    main()
