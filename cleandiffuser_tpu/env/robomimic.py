"""Robomimic environment wrappers (import-gated).

TPU-native equivalent of reference
cleandiffuser/env/robomimic/robomimic_lowdim_wrapper.py:6 and
robomimic_image_wrapper.py. robomimic/robosuite are not installed in this
environment; the wrappers raise a clear ImportError at construction and
work unchanged when the packages are present.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["RobomimicLowdimWrapper", "RobomimicImageWrapper", "create_robomimic_env"]


def _require_robomimic():
    try:
        import robomimic.utils.env_utils as EnvUtils  # noqa: F401
        import robomimic.utils.obs_utils as ObsUtils  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "robomimic/robosuite are not installed in this environment; "
            "RobomimicDataset (hdf5) works standalone, but live env eval "
            "requires `pip install robomimic robosuite`"
        ) from e


def create_robomimic_env(env_meta: Dict, obs_keys: Optional[List[str]] = None,
                         use_image_obs: bool = False, render: bool = False):
    """EnvUtils.create_env_from_metadata equivalent (reference
    dp_robomimic.py:29-52)."""
    _require_robomimic()
    import robomimic.utils.env_utils as EnvUtils

    return EnvUtils.create_env_from_metadata(
        env_meta=env_meta, render=render, render_offscreen=use_image_obs,
        use_image_obs=use_image_obs,
    )


class RobomimicLowdimWrapper:
    """Wrap robomimic EnvRobosuite into the gym API with obs-key concat."""

    def __init__(self, env, obs_keys=("object", "robot0_eef_pos",
                                      "robot0_eef_quat", "robot0_gripper_qpos")):
        self.env = env
        self.obs_keys = list(obs_keys)

    def _flatten(self, raw_obs) -> np.ndarray:
        return np.concatenate([np.ravel(raw_obs[k]) for k in self.obs_keys]).astype(np.float32)

    def reset(self, **kwargs):
        raw = self.env.reset()
        return self._flatten(raw), {}

    def step(self, action):
        raw, reward, done, info = self.env.step(action)
        return self._flatten(raw), float(reward), bool(done), False, info

    def render(self, mode="rgb_array"):
        return self.env.render(mode=mode, height=256, width=256)

    def close(self):
        pass


class RobomimicImageWrapper(RobomimicLowdimWrapper):
    """Adds camera frames to the observation dict."""

    def __init__(self, env, obs_keys=("robot0_eef_pos", "robot0_eef_quat",
                                      "robot0_gripper_qpos"),
                 image_keys=("agentview_image",)):
        super().__init__(env, obs_keys)
        self.image_keys = list(image_keys)

    def _pack(self, raw_obs):
        obs = {"state": self._flatten(raw_obs)}
        for k in self.image_keys:
            img = np.asarray(raw_obs[k], np.float32)
            if img.max() > 1.0:
                img = img / 255.0
            obs[k] = np.moveaxis(img, -1, 0)  # (C, H, W)
        return obs

    def reset(self, **kwargs):
        raw = self.env.reset()
        return self._pack(raw), {}

    def step(self, action):
        raw, reward, done, info = self.env.step(action)
        return self._pack(raw), float(reward), bool(done), False, info
