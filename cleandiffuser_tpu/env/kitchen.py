"""Franka Kitchen environment wrapper.

TPU-native equivalent of reference cleandiffuser/env/kitchen/ (mujoco_py
KitchenBase + KitchenLowdimWrapper, env/kitchen/kitchen_lowdim_wrapper.py:7).
mujoco_py and the vendored relay-policy-learning assets are unavailable
here; gymnasium_robotics' FrankaKitchen-v1 (MuJoCo 3) provides the same
multitask kitchen with task-completion rewards, wrapped into the flat
low-dim observation contract the pipelines expect.

Task-completion semantics are EXACT, not approximate: gymnasium_robotics
derives from the same relay_policy_learning source the reference vendors,
and its OBS_ELEMENT_INDICES / OBS_ELEMENT_GOALS / BONUS_THRESH are
numerically identical to ref:env/kitchen/base.py:12-30 (pinned by
tests/test_d4rl_eval_envs.py::
test_kitchen_constants_match_vendored_relay_policy_learning). The
remaining delta is physics-engine version (MuJoCo 3 vs mujoco_py 2).
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

# d4rl/relay-policy task-completion constants (reference env/kitchen/
# base.py:12-30). Indices address the 30-dim [robot qpos 9 | object qpos 21]
# vector, which is exactly obs[:30] of the flattened layout below.
D4RL_ELEMENT_INDICES = {
    "bottom burner": np.array([11, 12]),
    "top burner": np.array([15, 16]),
    "light switch": np.array([17, 18]),
    "slide cabinet": np.array([19]),
    "hinge cabinet": np.array([20, 21]),
    "microwave": np.array([22]),
    "kettle": np.array([23, 24, 25, 26, 27, 28, 29]),
}
D4RL_ELEMENT_GOALS = {
    "bottom burner": np.array([-0.88, -0.01]),
    "top burner": np.array([-0.92, -0.01]),
    "light switch": np.array([-0.69, -0.05]),
    "slide cabinet": np.array([0.37]),
    "hinge cabinet": np.array([0.0, 1.45]),
    "microwave": np.array([-0.75]),
    "kettle": np.array([-0.23, 0.75, 1.62, 0.99, 0.0, 0.0, -0.06]),
}
D4RL_BONUS_THRESH = 0.3


try:
    import gymnasium as _gym

    _EnvBase = _gym.Env
except ImportError:  # pragma: no cover
    _EnvBase = object


class KitchenLowdimWrapper(_EnvBase):
    """Flattens FrankaKitchen dict obs to the d4rl/relay-policy layout:
    [robot qpos (9) | object qpos (21) | full goal qpos (30)] = 60 dims.

    gymnasium's `observation` is [robot qpos 9 | robot qvel 9 | obj qpos 21
    | obj qvel 20]; the velocities are dropped and the per-task desired_goal
    dict is scattered into a full 30-dim goal config vector (the d4rl goal
    block is the desired full qpos, zero for untargeted elements).

    Task completion/reward uses the EXACT d4rl rule (reference
    env/kitchen/base.py:87-119) computed from the observation, independent
    of gymnasium's internal reward: an element completes when
    ||obs[element_idx] - d4rl_goal|| < 0.3 (any order), each completion pays
    +1 once and is removed from the open set; the episode terminates when
    the open set empties. This pins the d4rl scoring semantics even though
    the MuJoCo-3 model XML differs slightly from the vendored
    relay_policy_learning assets."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env, tasks: Optional[Sequence[str]] = None):
        self.env = env
        self.tasks = list(tasks) if tasks is not None else list(ALL_KITCHEN_TASKS)
        self.tasks_to_complete: List[str] = list(self.tasks)

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

    def _d4rl_completions(self, flat_obs) -> List[str]:
        done = []
        for element in self.tasks_to_complete:
            idx = D4RL_ELEMENT_INDICES[element]
            dist = np.linalg.norm(flat_obs[idx] - D4RL_ELEMENT_GOALS[element])
            if dist < D4RL_BONUS_THRESH:
                done.append(element)
        return done

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        self.tasks_to_complete = list(self.tasks)
        return self._flatten(obs), info

    def step(self, action):
        obs, _, term, trunc, info = self.env.step(action)
        flat = self._flatten(obs)
        completions = self._d4rl_completions(flat)
        for element in completions:
            self.tasks_to_complete.remove(element)
        rew = float(len(completions))  # d4rl bonus == newly completed tasks
        term = bool(term) or not self.tasks_to_complete
        info = dict(info)
        info["completed_tasks"] = set(self.tasks) - set(self.tasks_to_complete)
        return flat, rew, term, trunc, info

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
