"""BlockPush dataset (reference cleandiffuser/dataset/block_push_dataset.py:17-75):
zarr multiview block-push demos -> state/action windows with MinMax
normalization. Accepts a zarr path, .npz archive, or in-memory ReplayBuffer."""

from __future__ import annotations

import numpy as np

from ..utils.normalizers import DatasetMinMaxNormalizer
from .pusht import _PushTBase

__all__ = ["BlockPushDataset"]


class BlockPushDataset(_PushTBase):
    obs_keys = ("obs", "action")

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
