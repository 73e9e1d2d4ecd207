"""Robomimic imitation datasets (hdf5 demos).

TPU-native re-implementation of reference
cleandiffuser/dataset/robomimic_dataset.py:20-506 (low-dim + image
variants) and robomimic_rl_dataset.py:20-450 (TD variant). hdf5 loading via
h5py (available); the image variant keeps uint8 frames in HBM rather than
the reference's Jpeg2k-compressed zarr chunks (imagecodecs is only needed
for on-disk compression, which npz covers here).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..utils.normalizers import DatasetMinMaxNormalizer, ImageNormalizer
from .dataset_utils import RotationTransformer
from .pusht import _PushTBase
from .replay_buffer import ReplayBuffer

__all__ = ["RobomimicDataset", "RobomimicImageDataset", "RobomimicTDDataset",
           "abs_action_transform", "undo_transform_action"]


def abs_action_transform(raw_actions: np.ndarray, rt: RotationTransformer) -> np.ndarray:
    """pos+axis_angle+gripper -> pos+rotation_6d+gripper
    (reference robomimic_dataset.py:124-146)."""
    is_dual_arm = raw_actions.shape[-1] == 14
    if is_dual_arm:
        raw_actions = raw_actions.reshape(-1, 2, 7)
    pos, rot, gripper = raw_actions[..., :3], raw_actions[..., 3:6], raw_actions[..., 6:]
    rot = rt.forward(rot)
    out = np.concatenate([pos, rot, gripper], axis=-1).astype(np.float32)
    if is_dual_arm:
        out = out.reshape(-1, 20)
    return out


def undo_transform_action(action: np.ndarray, rt: RotationTransformer) -> np.ndarray:
    """rotation_6d -> axis_angle before env.step
    (reference robomimic_dataset.py:59-83)."""
    raw_shape = action.shape
    if raw_shape[-1] == 20:
        action = action.reshape(-1, 2, 10)
    d_rot = action.shape[-1] - 4
    pos = action[..., :3]
    rot = action[..., 3 : 3 + d_rot]
    gripper = action[..., -1:]
    rot = rt.inverse(rot)
    uaction = np.concatenate([pos, rot, gripper], axis=-1)
    if raw_shape[-1] == 20:
        uaction = uaction.reshape(*raw_shape[:-1], 14)
    return uaction


def _load_robomimic_buffer(dataset_dir, obs_keys, abs_action, rt,
                           image_keys: Sequence[str] = ()) -> ReplayBuffer:
    if isinstance(dataset_dir, ReplayBuffer):
        return dataset_dir
    import h5py

    rb = ReplayBuffer.create_empty_numpy()
    with h5py.File(dataset_dir) as file:
        demos = file["data"]
        for i in range(len(demos)):
            demo = demos[f"demo_{i}"]
            obs = np.concatenate(
                [demo["obs"][key] for key in obs_keys], axis=-1
            ).astype(np.float32)
            actions = demo["actions"][:].astype(np.float32)
            if abs_action:
                actions = abs_action_transform(actions, rt)
            episode = {"obs": obs, "action": actions}
            for k in image_keys:
                episode[k] = np.asarray(demo["obs"][k])
            rb.add_episode(episode)
    return rb


class RobomimicDataset(_PushTBase):
    """Low-dim robomimic demos -> state/action windows."""

    def __init__(
        self,
        dataset_dir,
        horizon=1,
        pad_before=0,
        pad_after=0,
        obs_keys=("object", "robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos"),
        abs_action=False,
        rotation_rep="rotation_6d",
    ):
        self.rotation_transformer = RotationTransformer("axis_angle", rotation_rep)
        rb = _load_robomimic_buffer(dataset_dir, obs_keys, abs_action, self.rotation_transformer)
        self.abs_action = abs_action
        super().__init__(rb, obs_keys=["obs", "action"], horizon=horizon,
                         pad_before=pad_before, pad_after=pad_after)

    def undo_transform_action(self, action):
        return undo_transform_action(np.asarray(action), self.rotation_transformer)

    def get_normalizer(self):
        return {
            "obs": {"state": DatasetMinMaxNormalizer(self.replay_buffer["obs"][:])},
            "action": DatasetMinMaxNormalizer(self.replay_buffer["action"][:]),
        }

    def _device_arrays(self):
        import jax.numpy as jnp

        return {
            "obs": {
                "state": jnp.asarray(
                    self.normalizer["obs"]["state"].normalize(
                        self.replay_buffer["obs"].astype(np.float32)
                    )
                )
            },
            "action": jnp.asarray(
                self.normalizer["action"].normalize(
                    self.replay_buffer["action"].astype(np.float32)
                )
            ),
        }

    def __getitem__(self, idx):
        sample = self.sampler.sample_sequence(idx)
        return {
            "obs": {
                "state": self.normalizer["obs"]["state"].normalize(
                    sample["obs"].astype(np.float32)
                )
            },
            "action": self.normalizer["action"].normalize(
                sample["action"].astype(np.float32)
            ),
        }


class RobomimicImageDataset(RobomimicDataset):
    """Image robomimic demos: adds camera frames (uint8, channels-last in
    the hdf5) to each window (reference robomimic_dataset.py:151-506)."""

    def __init__(
        self,
        dataset_dir,
        horizon=1,
        pad_before=0,
        pad_after=0,
        obs_keys=("robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos"),
        image_keys=("agentview_image",),
        abs_action=False,
        rotation_rep="rotation_6d",
    ):
        self.rotation_transformer = RotationTransformer("axis_angle", rotation_rep)
        rb = _load_robomimic_buffer(
            dataset_dir, obs_keys, abs_action, self.rotation_transformer, image_keys
        )
        self.abs_action = abs_action
        self.image_keys = list(image_keys)
        _PushTBase.__init__(
            self, rb, obs_keys=["obs", "action"] + self.image_keys, horizon=horizon,
            pad_before=pad_before, pad_after=pad_after,
        )

    def get_normalizer(self):
        norm = super().get_normalizer()
        norm["obs"]["image"] = ImageNormalizer()
        return norm

    def _device_arrays(self):
        import jax.numpy as jnp

        out = super()._device_arrays()
        for k in self.image_keys:
            img = self.replay_buffer[k]
            if img.dtype != np.uint8:
                img = np.clip(img * 255.0 if img.max() <= 1.0 else img,
                              0, 255).astype(np.uint8)
            # uint8 channels-last on device; consumers normalize lazily
            out["obs"][k] = jnp.asarray(img)
        return out

    def __getitem__(self, idx):
        sample = self.sampler.sample_sequence(idx)
        out = {
            "obs": {
                "state": self.normalizer["obs"]["state"].normalize(
                    sample["obs"].astype(np.float32)
                )
            },
            "action": self.normalizer["action"].normalize(
                sample["action"].astype(np.float32)
            ),
        }
        for k in self.image_keys:
            img = sample[k].astype(np.float32)
            if img.max() > 1.0:
                img = img / 255.0
            out["obs"][k] = np.moveaxis(img, -1, 1)  # (T, C, H, W)
        return out


class RobomimicTDDataset(RobomimicDataset):
    """TD-style robomimic transitions for RL
    (reference robomimic_rl_dataset.py:20-178)."""

    def __init__(self, dataset_dir, reward_mode: str = "sparse", **kwargs):
        super().__init__(dataset_dir, horizon=2, **kwargs)
        self.reward_mode = reward_mode

    def __getitem__(self, idx):
        sample = self.sampler.sample_sequence(idx)
        obs = self.normalizer["obs"]["state"].normalize(sample["obs"].astype(np.float32))
        act = self.normalizer["action"].normalize(sample["action"].astype(np.float32))
        return {
            "obs": {"state": obs[0]},
            "next_obs": {"state": obs[1]},
            "act": act[0],
            "rew": np.zeros((1,), np.float32),
            "tml": np.zeros((1,), np.float32),
        }
