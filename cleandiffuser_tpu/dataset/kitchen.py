"""Kitchen imitation datasets (relay-policy-learning .npy archives).

TPU-native re-implementation of reference
cleandiffuser/dataset/kitchen_dataset.py:16-247 (KitchenDataset /
KitchenDatasetV2; KitchenMjlDataset needs raw .mjl parsing via mujoco-py
utilities, so it loads pre-parsed .npz instead). Uses the same
ReplayBuffer + SequenceSampler windowing and MinMax normalizers as the
PushT family, plus the device-resident batch gather.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np

from ..utils.normalizers import DatasetMinMaxNormalizer
from .pusht import _PushTBase
from .replay_buffer import ReplayBuffer

__all__ = ["KitchenDataset", "KitchenDatasetV2", "KitchenMjlDataset"]


def _load_kitchen_buffer(dataset_dir) -> ReplayBuffer:
    if isinstance(dataset_dir, ReplayBuffer):
        return dataset_dir
    data_directory = pathlib.Path(dataset_dir)
    observations = np.load(data_directory / "observations_seq.npy")
    actions = np.load(data_directory / "actions_seq.npy")
    masks = np.load(data_directory / "existence_mask.npy")
    rb = ReplayBuffer.create_empty_numpy()
    for i in range(len(masks)):
        eps_len = int(masks[i].sum())
        rb.add_episode(
            {
                "state": observations[i, :eps_len].astype(np.float32),
                "action": actions[i, :eps_len].astype(np.float32),
            }
        )
    return rb


class KitchenDataset(_PushTBase):
    """state/action windows over relay-policy-learning episodes."""

    obs_keys = ("state", "action")

    def __init__(self, dataset_dir, horizon=1, pad_before=0, pad_after=0,
                 abs_action: bool = False):
        rb = _load_kitchen_buffer(dataset_dir)
        super().__init__(rb, obs_keys=["state", "action"], horizon=horizon,
                         pad_before=pad_before, pad_after=pad_after)

    def get_normalizer(self):
        return {
            "obs": {"state": DatasetMinMaxNormalizer(self.replay_buffer["state"][:])},
            "action": DatasetMinMaxNormalizer(self.replay_buffer["action"][:]),
        }

    def _device_arrays(self):
        import jax.numpy as jnp

        return {
            "obs": {
                "state": jnp.asarray(
                    self.normalizer["obs"]["state"].normalize(
                        self.replay_buffer["state"].astype(np.float32)
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
                    sample["state"].astype(np.float32)
                )
            },
            "action": self.normalizer["action"].normalize(
                sample["action"].astype(np.float32)
            ),
        }


class KitchenDatasetV2(KitchenDataset):
    """V2 variant (reference kitchen_dataset.py:92-156): normalization is
    applied once at load time instead of per-sample."""

    def __init__(self, dataset_dir, horizon=1, pad_before=0, pad_after=0,
                 abs_action: bool = False):
        rb = _load_kitchen_buffer(dataset_dir)
        state_norm = DatasetMinMaxNormalizer(rb["state"][:])
        action_norm = DatasetMinMaxNormalizer(rb["action"][:])
        normed = ReplayBuffer.create_from_data(
            {
                "state": state_norm.normalize(rb["state"].astype(np.float32)),
                "action": action_norm.normalize(rb["action"].astype(np.float32)),
            },
            rb.episode_ends,
        )
        self._prebuilt_normalizer = {"obs": {"state": state_norm}, "action": action_norm}
        super(KitchenDataset, self).__init__(
            normed, obs_keys=["state", "action"], horizon=horizon,
            pad_before=pad_before, pad_after=pad_after,
        )

    def get_normalizer(self):
        if hasattr(self, "_prebuilt_normalizer"):
            return self._prebuilt_normalizer
        return super().get_normalizer()

    def __getitem__(self, idx):
        sample = self.sampler.sample_sequence(idx)
        return {
            "obs": {"state": sample["state"].astype(np.float32)},
            "action": sample["action"].astype(np.float32),
        }

    def _device_arrays(self):
        import jax.numpy as jnp

        return {
            "obs": {"state": jnp.asarray(self.replay_buffer["state"].astype(np.float32))},
            "action": jnp.asarray(self.replay_buffer["action"].astype(np.float32)),
        }


class KitchenMjlDataset(KitchenDataset):
    """Kitchen demos parsed straight from raw MuJoCo .mjl logs (reference
    kitchen_dataset.py:157-247): obs = [robot qpos 9 | object qpos 21 |
    zero goal 30] with optional robot-position observation noise, action =
    raw ctrl (abs_action layout)."""

    # per-dim robot observation-noise amplitudes (reference :169-172)
    _NOISE_AMP = np.array(
        [0.1] * 9 + [0.005] * 2 + [0.0005] * 6 + [0.005] * 3
        + [0.1] * 3 + [0.005] * 3 + [0.1] * 3 + [0.005],
        dtype=np.float32,
    )

    def __init__(self, dataset_dir, horizon=1, pad_before=0, pad_after=0,
                 abs_action: bool = True, robot_noise_ratio: float = 0.1,
                 skip: int = 40):
        from pathlib import Path

        from .mjl import parse_mjl_log

        rng = np.random.default_rng(seed=42)
        rb = ReplayBuffer.create_empty_numpy()
        paths = sorted(Path(dataset_dir).glob("*/*.mjl")) if Path(dataset_dir).exists() else []
        for p in paths:
            try:
                log = parse_mjl_log(str(p), skip=skip)
                qpos = log["qpos"].astype(np.float32)
                obs = np.concatenate(
                    [qpos[:, :9], qpos[:, -21:],
                     np.zeros((len(qpos), 30), np.float32)], axis=-1,
                )
                if robot_noise_ratio > 0:
                    obs[:, :30] += robot_noise_ratio * self._NOISE_AMP * rng.uniform(
                        -1.0, 1.0, size=(obs.shape[0], 30)
                    )
                rb.add_episode({"state": obs,
                                "action": log["ctrl"].astype(np.float32)})
            except Exception as e:  # skip corrupt logs like the reference
                print(f"[KitchenMjlDataset] skipping {p}: {e}")
        if rb.n_episodes == 0:
            raise FileNotFoundError(
                f"no parseable .mjl logs under {dataset_dir} "
                "(expected relay-policy-learning kitchen_demos_multitask layout)"
            )
        _PushTBase.__init__(self, rb, obs_keys=["state", "action"],
                            horizon=horizon, pad_before=pad_before,
                            pad_after=pad_after)
