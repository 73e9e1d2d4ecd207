"""D4RL-Antmaze datasets.

TPU-native re-implementation of reference
cleandiffuser/dataset/d4rl_antmaze_dataset.py:10-440. Antmaze specifics:
reward - 1 per step, obs-repeat padding of short episodes, no-reaching
penalty on full-length episodes, TD reward tuning ("iql"/"cql"/"antmaze"),
and episode boundaries detected by done[i-1] transitions.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ..utils.normalizers import GaussianNormalizer
from .base import BaseDataset, DeviceSeqSampler, DeviceTDSampler
from .d4rl_mujoco import _mc_value_backward

__all__ = [
    "D4RLAntmazeDataset",
    "D4RLAntmazeTDDataset",
    "MultiHorizonD4RLAntmazeDataset",
    "DV_D4RLAntmazeSeqDataset",
]


def _chunk_antmaze(observations, actions, rewards, timeouts, terminals,
                   max_path_length, noreaching_penalty, normalizer):
    """Episode chunking with obs-repeat padding (reference :80-130)."""
    normed_observations = normalizer.normalize(observations)
    o_dim, a_dim = observations.shape[-1], actions.shape[-1]
    dones = np.logical_or(timeouts, terminals)

    seq_obs, seq_act, seq_rew = [], [], []
    path_lengths, tml = [], []
    ptr, path_idx = 0, 0
    for i in range(timeouts.shape[0]):
        if i != 0 and ((dones[i - 1] and not dones[i]) or timeouts[i - 1]):
            path_length = i - ptr
            path_lengths.append(path_length)
            if terminals[i] and not timeouts[i]:
                tml.append([path_idx, i - ptr])

            if path_length < max_path_length:
                _o = np.zeros((max_path_length, o_dim), np.float32)
                _a = np.zeros((max_path_length, a_dim), np.float32)
                _r = np.zeros((max_path_length, 1), np.float32)
                _o[:path_length] = normed_observations[ptr:i]
                _a[:path_length] = actions[ptr:i]
                _r[:path_length] = rewards[ptr:i][:, None]
                _o[path_length:] = normed_observations[i]  # repeat last state
                seq_obs.append(_o)
                seq_act.append(_a)
                seq_rew.append(_r)
            elif path_length == max_path_length:
                seq_obs.append(normed_observations[ptr:i])
                seq_act.append(actions[ptr:i])
                r = rewards[ptr:i][:, None].copy()
                r[-1] = noreaching_penalty
                seq_rew.append(r)
            else:
                raise ValueError(f"path_length {path_length} > max_path_length {max_path_length}")

            ptr = i
            path_idx += 1

    return (
        np.array(seq_obs, np.float32),
        np.array(seq_act, np.float32),
        np.array(seq_rew, np.float32),
        path_lengths,
        np.array(tml, np.int64),
    )


class D4RLAntmazeDataset(BaseDataset):
    def __init__(
        self,
        dataset: Dict[str, np.ndarray],
        horizon: int = 1,
        max_path_length: int = 1001,
        noreaching_penalty: float = -100.0,
        discount: float = 0.99,
    ):
        observations, actions, rewards, timeouts, terminals = (
            dataset["observations"].astype(np.float32),
            dataset["actions"].astype(np.float32),
            dataset["rewards"].astype(np.float32).copy(),
            dataset["timeouts"],
            dataset["terminals"],
        )
        rewards -= 1  # -1 per step, 0 on goal (reference :65)
        self.normalizers = {"state": GaussianNormalizer(observations, start_dim=1)}
        self.horizon = horizon
        self.o_dim, self.a_dim = observations.shape[-1], actions.shape[-1]

        (self.seq_obs, self.seq_act, self.seq_rew, self.path_lengths,
         self.tml_and_not_timeout) = _chunk_antmaze(
            observations, actions, rewards, timeouts, terminals,
            max_path_length, noreaching_penalty, self.normalizers["state"],
        )

        indices = []
        for path_idx, plen in enumerate(self.path_lengths):
            max_start = min(plen - 1, max_path_length - horizon)
            indices += [(path_idx, s) for s in range(max_start + 1)]
        self.indices = np.asarray(indices, np.int32)
        self.seq_val = _mc_value_backward(self.seq_rew, discount)

        self._sampler = DeviceSeqSampler(
            {"obs": self.seq_obs, "act": self.seq_act, "rew": self.seq_rew},
            self.indices, horizon, scalars={"val": self.seq_val},
        )

    def get_normalizer(self):
        return self.normalizers["state"]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx: int):
        path_idx, start = self.indices[idx]
        end = start + self.horizon
        return {
            "obs": {"state": self.seq_obs[path_idx, start:end]},
            "act": self.seq_act[path_idx, start:end],
            "rew": self.seq_rew[path_idx, start:end],
            "val": self.seq_val[path_idx, start],
        }

    def sample_batch(self, rng, batch_size: int):
        out = self._sampler.sample(rng, batch_size)
        return {
            "obs": {"state": out["obs"]}, "act": out["act"],
            "rew": out["rew"], "val": out["val"],
        }


def tune_reward(rewards: np.ndarray, reward_tune: str) -> np.ndarray:
    """TD reward tuning (reference :205-214)."""
    if reward_tune == "iql":
        return rewards - 1.0
    if reward_tune == "cql":
        return (rewards - 0.5) * 4.0
    if reward_tune == "antmaze":
        return (rewards - 0.25) * 2.0
    if reward_tune == "none":
        return rewards
    raise ValueError(f"reward_tune: {reward_tune} is not supported.")


class D4RLAntmazeTDDataset(BaseDataset):
    def __init__(self, dataset: Dict[str, np.ndarray], reward_tune: str = "iql"):
        observations, actions, next_observations, rewards, terminals = (
            dataset["observations"].astype(np.float32),
            dataset["actions"].astype(np.float32),
            dataset["next_observations"].astype(np.float32),
            dataset["rewards"].astype(np.float32),
            dataset["terminals"].astype(np.float32),
        )
        rewards = tune_reward(rewards, reward_tune)
        self.normalizers = {"state": GaussianNormalizer(observations, start_dim=1)}
        self.obs = self.normalizers["state"].normalize(observations)
        self.next_obs = self.normalizers["state"].normalize(next_observations)
        self.act, self.rew, self.tml = actions, rewards[:, None], terminals[:, None]
        self.size = self.obs.shape[0]
        self.o_dim, self.a_dim = observations.shape[-1], actions.shape[-1]
        self._sampler = DeviceTDSampler(
            {"obs": self.obs, "next_obs": self.next_obs, "act": self.act,
             "rew": self.rew, "tml": self.tml}
        )

    def get_normalizer(self):
        return self.normalizers["state"]

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int):
        return {
            "obs": {"state": self.obs[idx]},
            "next_obs": {"state": self.next_obs[idx]},
            "act": self.act[idx], "rew": self.rew[idx], "tml": self.tml[idx],
        }

    def sample_batch(self, rng, batch_size: int):
        out = self._sampler.sample(rng, batch_size)
        return {
            "obs": {"state": out["obs"]}, "next_obs": {"state": out["next_obs"]},
            "act": out["act"], "rew": out["rew"], "tml": out["tml"],
        }


class MultiHorizonD4RLAntmazeDataset(BaseDataset):
    """Multi-horizon variant (reference :250-369). `val` is the discounted
    return of the remaining steps computed on the fly in the reference;
    here it is the same backward MC recursion value at the window start."""

    def __init__(
        self,
        dataset,
        horizons: Sequence[int] = (10, 20),
        max_path_length: int = 1001,
        noreaching_penalty: float = -100.0,
        discount: float = 0.99,
    ):
        base = D4RLAntmazeDataset(
            dataset, max(horizons), max_path_length, noreaching_penalty, discount
        )
        self.normalizers = base.normalizers
        self.horizons = tuple(horizons)
        self.o_dim, self.a_dim = base.o_dim, base.a_dim
        self.seq_obs, self.seq_act, self.seq_val = base.seq_obs, base.seq_act, base.seq_val
        self.seq_rew = base.seq_rew
        self.path_lengths = base.path_lengths

        self.indices = []
        for horizon in self.horizons:
            idxs = []
            for path_idx, plen in enumerate(self.path_lengths):
                max_start = min(plen - 1, max_path_length - horizon)
                idxs += [(path_idx, s) for s in range(max_start + 1)]
            self.indices.append(np.asarray(idxs, np.int32))
        self.len_each_horizon = [len(i) for i in self.indices]

        self._samplers = [
            DeviceSeqSampler(
                {"obs": self.seq_obs, "act": self.seq_act}, idxs, horizon,
                scalars={"val": self.seq_val},
            )
            for idxs, horizon in zip(self.indices, self.horizons)
        ]

    def get_normalizer(self):
        return self.normalizers["state"]

    def __len__(self):
        return max(self.len_each_horizon)

    def __getitem__(self, idx: int):
        indices = [
            int(self.len_each_horizon[i] * (idx / self.len_each_horizon[-1]))
            for i in range(len(self.horizons))
        ]
        out = []
        for i, horizon in enumerate(self.horizons):
            path_idx, start = self.indices[i][indices[i]]
            out.append({
                "horizon": horizon,
                "data": {
                    "obs": {"state": self.seq_obs[path_idx, start:start + horizon]},
                    "act": self.seq_act[path_idx, start:start + horizon],
                    "val": self.seq_val[path_idx, start],
                },
            })
        return out

    def sample_batch(self, rng, batch_size: int, horizon_idx: int = 0):
        out = self._samplers[horizon_idx].sample(rng, batch_size)
        return {"obs": {"state": out["obs"]}, "act": out["act"], "val": out["val"]}


class DV_D4RLAntmazeSeqDataset(BaseDataset):
    """Diffusion-Veteran antmaze variant with stride and [-1,1] value
    (reference :371-562)."""

    def __init__(
        self,
        dataset: Dict[str, np.ndarray],
        horizon: int = 1,
        max_path_length: int = 1001,
        discount: float = 0.99,
        center_mapping: bool = True,
        reward_tune: str = "iql",
        stride: int = 1,
        continous_reward_at_done: bool = False,
        learn_policy: bool = False,
    ):
        observations, actions, rewards, timeouts, terminals = (
            dataset["observations"].astype(np.float32),
            dataset["actions"].astype(np.float32),
            dataset["rewards"].astype(np.float32).copy(),
            dataset["timeouts"],
            dataset["terminals"],
        )
        rewards = tune_reward(rewards, reward_tune)
        self.stride = stride
        self.learn_policy = learn_policy
        self.normalizers = {"state": GaussianNormalizer(observations, start_dim=1)}
        self.horizon = horizon
        self.o_dim, self.a_dim = observations.shape[-1], actions.shape[-1]

        (self.seq_obs, self.seq_act, self.seq_rew, self.path_lengths, _) = _chunk_antmaze(
            observations, actions, rewards, timeouts, terminals,
            max_path_length, 0.0, self.normalizers["state"],
        )

        # padding reward past episode end: the tuned success reward when the
        # episode "keeps succeeding" after done, else the tuned step reward
        # (reference d4rl_antmaze_dataset.py:371-440 continous_reward_at_done)
        pad_rew = 1.0 if continous_reward_at_done else 0.0
        pad_rew = float(tune_reward(np.array([pad_rew], np.float32), reward_tune)[0])
        if pad_rew != 0.0:
            for p, plen in enumerate(self.path_lengths):
                if plen < max_path_length:
                    self.seq_rew[p, plen:] = pad_rew

        indices = []
        for path_idx, plen in enumerate(self.path_lengths):
            max_start = plen - (horizon - 1) * stride - 1
            indices += [(path_idx, s) for s in range(max(max_start + 1, 0))]
        self.indices = np.asarray(indices, np.int32)

        self.seq_val = _mc_value_backward(self.seq_rew, discount)
        vmin, vmax = self.seq_val.min(), self.seq_val.max()
        self.seq_val = (self.seq_val - vmin) / (vmax - vmin)
        if center_mapping:
            self.seq_val = self.seq_val * 2 - 1

        self._sampler = DeviceSeqSampler(
            {"obs": self.seq_obs, "act": self.seq_act, "rew": self.seq_rew},
            self.indices, horizon, stride=stride, scalars={"val": self.seq_val},
        )

    def get_normalizer(self):
        return self.normalizers["state"]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx: int):
        path_idx, start = self.indices[idx]
        end = start + (self.horizon - 1) * self.stride + 1
        return {
            "obs": {"state": self.seq_obs[path_idx, start:end:self.stride]},
            "act": self.seq_act[path_idx, start:end:self.stride],
            "rew": self.seq_rew[path_idx, start:end:self.stride],
            "val": self.seq_val[path_idx, start],
        }

    def sample_batch(self, rng, batch_size: int):
        out = self._sampler.sample(rng, batch_size)
        return {
            "obs": {"state": out["obs"]}, "act": out["act"],
            "rew": out["rew"], "val": out["val"],
        }
