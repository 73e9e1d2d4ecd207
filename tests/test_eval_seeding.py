"""Eval episodes must not share sub-env seeds (VERDICT r3 weak #1).

A vector reset with an int seed seeds sub-envs [s, s+1, ..., s+n-1], so the
old per-episode `seed + ep` made episode ep and ep+1 share n-1 of n initial
states — 3 "episodes" of 50 envs were ~52 distinct seeds, and every std bar
computed from them was illusory.  The eval loops now step the per-episode
base seed by num_envs; this test drives d4rl_eval_loop with recording fake
envs and asserts every rollout across every episode got a distinct seed
(reference eval protocol: diffuser_d4rl_mujoco.py:126-158, random resets).
"""

import numpy as np

import cleandiffuser_tpu.pipelines.data_loading as data_loading
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop


class _RecordingEnv:
    """Duck-typed env that records every reset seed it receives."""

    seen_seeds: list = []  # shared across instances on purpose

    def __init__(self):
        self.action_space = None
        self.observation_space = None
        self._t = 0

    def reset(self, seed=None, **kwargs):
        if seed is not None:
            _RecordingEnv.seen_seeds.append(seed)
        self._t = 0
        return np.zeros(4, np.float32), {}

    def step(self, act):
        self._t += 1
        done = self._t >= 2
        return np.zeros(4, np.float32), 1.0, done, False, {}

    def close(self):
        pass


class _IdNormalizer:
    def normalize(self, x):
        return x


def test_episode_seed_blocks_are_disjoint(monkeypatch):
    _RecordingEnv.seen_seeds = []
    num_envs, num_episodes = 5, 4
    monkeypatch.setattr(data_loading, "make_eval_env_fns",
                        lambda name, n: [_RecordingEnv for _ in range(n)])
    monkeypatch.setattr(data_loading, "get_normalized_score_fn",
                        lambda name: lambda r: float(r))
    d4rl_eval_loop(lambda nobs: np.zeros((nobs.shape[0], 2), np.float32),
                   "fake-env", _IdNormalizer(), num_envs, num_episodes,
                   seed=123, max_steps=3)
    seeds = _RecordingEnv.seen_seeds
    # one seeded reset per env per episode (autoresets pass seed=None)
    assert len(seeds) == num_envs * num_episodes
    # the actual fix: every rollout across every episode is distinct
    assert len(set(seeds)) == num_envs * num_episodes
    # and the blocks are the documented layout [base + ep*n + i]
    expected = {123 + ep * num_envs + i
                for ep in range(num_episodes) for i in range(num_envs)}
    assert set(seeds) == expected
