"""Dataset acquisition helpers for the CLI pipelines.

The reference obtains data via `env.get_dataset()` / `d4rl.qlearning_dataset`
(network downloads + mujoco-py). This environment has neither d4rl nor
network, so resolution order is:

1. real d4rl, if importable;
2. a local .npz snapshot at `$CLEANDIFFUSER_DATA/<env_name>[.qlearning].npz`
   with the standard key schema;
3. the synthetic generator (hermetic fallback, clearly warned).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict

import numpy as np

from ..dataset.fake import fake_d4rl_dataset, fake_d4rl_qlearning_dataset

__all__ = [
    "load_d4rl_dataset",
    "load_d4rl_qlearning_dataset",
    "get_normalized_score_fn",
    "resolve_pusht_demos",
]

DATA_DIR = Path(os.environ.get("CLEANDIFFUSER_DATA", "dev/d4rl"))

# d4rl reference min/max scores for normalized-score computation
# (gym d4rl infos.py values; longest-prefix match wins)
D4RL_SCORE_RANGES = {
    "halfcheetah": (-280.178953, 12135.0),
    "hopper": (-20.272305, 3234.3),
    "walker2d": (1.629008, 4592.3),
    # sparse-reward suites: score is (clipped) task-completion count
    "antmaze": (0.0, 1.0),
    "kitchen": (0.0, 4.0),
    "maze2d-umaze": (23.85, 161.86),
    "maze2d-medium": (13.13, 277.39),
    "maze2d-large": (6.7, 273.99),
}


def _try_npz(path: Path):
    if path.exists():
        arrs = np.load(path)
        return {k: arrs[k] for k in arrs.files}
    return None


def load_d4rl_dataset(env_name: str) -> Dict[str, np.ndarray]:
    try:
        import d4rl  # noqa: F401
        import gym

        return gym.make(env_name).get_dataset()
    except ImportError:
        pass
    data = _try_npz(DATA_DIR / f"{env_name}.npz")
    if data is not None:
        return data
    print(f"[data] d4rl unavailable and no snapshot at {DATA_DIR}/{env_name}.npz; "
          f"using SYNTHETIC data (hermetic mode)")
    return fake_d4rl_dataset(env_name, n_steps=100_000, ep_len=1000)


def resolve_pusht_demos(args, with_images: bool = False):
    """Resolve PushT demonstration data for the dp/dbc CLIs.

    Resolution order (mirrors the d4rl helpers above):
    1. an existing file at `args.dataset_path` (reference zarr layout or
       an .npz export of it — drop in `pusht_cchi_v7_replay` to train on
       the real human demos with zero code change);
    2. on-device MPC expert demos (`demo_expert=true`, the default —
       every episode reaches the 0.95-coverage success threshold), cached
       to `args.dataset_path` so later runs and eval reuse them;
    3. the cheap scripted pusher (`demo_expert=false`, hermetic tests).
    """
    path = Path(args.dataset_path)
    if path.exists():
        return str(path)
    from ..dataset.pusht import generate_pusht_demos

    expert = bool(getattr(args, "demo_expert", True))
    n_episodes = int(getattr(args, "demo_episodes", 64))
    max_steps = int(getattr(args, "demo_max_steps", 300 if expert else 200))
    kind = "MPC-expert" if expert else "scripted"
    cache_note = (f"cached to {path}" if path.suffix == ".npz" else
                  f"NOT cached: {path} is not .npz, regenerated every run")
    print(f"[data] no dataset at {path}; generating {n_episodes} {kind} "
          f"JAX demos ({cache_note})")
    mpc_kwargs = None
    noise = float(getattr(args, "demo_noise", 0.0))
    if noise > 0.0:
        mpc_kwargs = {"exec_noise_prob": noise}  # DART recovery data
    rb = generate_pusht_demos(
        n_episodes=n_episodes, max_steps=max_steps, seed=args.seed,
        with_images=with_images, expert=expert, mpc_kwargs=mpc_kwargs,
        batch=int(getattr(args, "demo_batch", 16)),
    )
    if path.suffix == ".npz":
        path.parent.mkdir(parents=True, exist_ok=True)
        rb.save_npz(str(path))
    return rb


def load_d4rl_qlearning_dataset(env_name: str) -> Dict[str, np.ndarray]:
    try:
        import d4rl
        import gym

        return d4rl.qlearning_dataset(gym.make(env_name))
    except ImportError:
        pass
    data = _try_npz(DATA_DIR / f"{env_name}.qlearning.npz")
    if data is not None:
        return data
    print(f"[data] d4rl unavailable and no snapshot at {DATA_DIR}/{env_name}.qlearning.npz; "
          f"using SYNTHETIC data (hermetic mode)")
    return fake_d4rl_qlearning_dataset(env_name, n_steps=100_000, ep_len=1000)


def get_normalized_score_fn(env_name: str):
    """d4rl normalized score; longest-prefix match, identity fallback."""
    best = None
    for prefix, rng in D4RL_SCORE_RANGES.items():
        if env_name.startswith(prefix) and (best is None or len(prefix) > len(best[0])):
            best = (prefix, rng)
    if best is not None:
        lo, hi = best[1]
        return lambda ret: (ret - lo) / (hi - lo)
    return lambda ret: ret


def make_eval_env_fns(env_name: str, num_envs: int):
    """gymnasium eval env thunks approximating the d4rl task.

    Locomotion maps to the v5 MuJoCo envs; antmaze/maze2d/kitchen map to
    the gymnasium_robotics reimplementations via d4rl-layout flattening
    wrappers (env/d4rl_eval.py, env/kitchen.py)."""
    import gymnasium as gym

    if env_name.startswith("antmaze"):
        from ..env.d4rl_eval import make_antmaze_env

        return [(lambda: make_antmaze_env(env_name)) for _ in range(num_envs)]
    if env_name.startswith("maze2d"):
        from ..env.d4rl_eval import make_maze2d_env

        return [(lambda: make_maze2d_env(env_name)) for _ in range(num_envs)]
    if env_name.startswith("kitchen"):
        from ..env.kitchen import ALL_KITCHEN_TASKS, make_kitchen_env

        # mixed/partial datasets both evaluate on the 4-subtask goal set
        tasks = ["microwave", "kettle", "bottom burner", "light switch"]
        return [(lambda: make_kitchen_env(tasks)) for _ in range(num_envs)]

    GYM_NAME = {
        "halfcheetah": "HalfCheetah-v5",
        "hopper": "Hopper-v5",
        "walker2d": "Walker2d-v5",
    }
    for prefix, gid in GYM_NAME.items():
        if env_name.startswith(prefix):
            return [lambda: gym.make(gid) for _ in range(num_envs)]
    raise ValueError(f"no gymnasium mapping for {env_name}")
