"""Franka Kitchen environment wrapper.

TPU-native equivalent of reference cleandiffuser/env/kitchen/ (mujoco_py
KitchenBase + KitchenLowdimWrapper, env/kitchen/kitchen_lowdim_wrapper.py:7).
mujoco_py and the vendored relay-policy-learning assets are unavailable
here; gymnasium_robotics' FrankaKitchen-v1 (MuJoCo 3) provides the same
multitask kitchen with task-completion rewards, wrapped into the flat
low-dim observation contract the pipelines expect.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

__all__ = ["KitchenLowdimWrapper", "make_kitchen_env", "ALL_KITCHEN_TASKS"]

ALL_KITCHEN_TASKS = [
    "bottom burner", "top burner", "light switch", "slide cabinet",
    "hinge cabinet", "microwave", "kettle",
]

_GR_TASK_NAMES = {
    "bottom burner": "bottom burner",
    "top burner": "top burner",
    "light switch": "light switch",
    "slide cabinet": "slide cabinet",
    "hinge cabinet": "hinge cabinet",
    "microwave": "microwave",
    "kettle": "kettle",
}


class KitchenLowdimWrapper:
    """Flattens FrankaKitchen dict obs to the d4rl/relay-policy layout:
    [robot qpos (9) | object qpos (21) | full goal qpos (30)] = 60 dims.

    gymnasium's `observation` is [robot qpos 9 | robot qvel 9 | obj qpos 21
    | obj qvel 20]; the velocities are dropped and the per-task desired_goal
    dict is scattered into a full 30-dim goal config vector (the d4rl goal
    block is the desired full qpos, zero for untargeted elements)."""

    def __init__(self, env, tasks: Optional[Sequence[str]] = None):
        self.env = env
        self.tasks = list(tasks) if tasks is not None else list(ALL_KITCHEN_TASKS)

    @staticmethod
    def _flatten(obs_dict) -> np.ndarray:
        from gymnasium_robotics.envs.franka_kitchen.kitchen_env import (
            OBS_ELEMENT_INDICES,
        )

        o = np.ravel(obs_dict["observation"])
        qp, obj_qp = o[:9], o[18:39]
        goal = np.zeros(30, np.float32)
        desired = obs_dict.get("desired_goal", {})
        if isinstance(desired, dict):
            for task, val in desired.items():
                goal[np.asarray(OBS_ELEMENT_INDICES[task])] = np.ravel(val)
        return np.concatenate([qp, obj_qp, goal]).astype(np.float32)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._flatten(obs), info

    def step(self, action):
        obs, rew, term, trunc, info = self.env.step(action)
        return self._flatten(obs), float(rew), term, trunc, info

    def render(self):
        return self.env.render()

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def observation_space(self):
        import gymnasium as gym

        example, _ = self.reset()
        return gym.spaces.Box(-np.inf, np.inf, shape=example.shape, dtype=np.float32)

    def close(self):
        self.env.close()


def make_kitchen_env(tasks: Optional[Sequence[str]] = None, render_mode=None,
                     use_abs_action: bool = False):
    """Create a wrapped FrankaKitchen env (requires gymnasium_robotics)."""
    import gymnasium as gym
    import gymnasium_robotics  # noqa: F401  (registers FrankaKitchen-v1)

    tasks = list(tasks) if tasks is not None else ["microwave", "kettle"]
    # gymnasium_robotics goal keys keep the spaces ("bottom burner")
    gr_tasks = [_GR_TASK_NAMES[t] for t in tasks]
    env = gym.make("FrankaKitchen-v1", tasks_to_complete=gr_tasks, render_mode=render_mode)
    return KitchenLowdimWrapper(env, tasks)
