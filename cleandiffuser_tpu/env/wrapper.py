"""Gym environment wrappers (gymnasium-based hosts).

TPU-native re-implementation of reference cleandiffuser/env/wrapper.py:
- MultiStepWrapper (:69-163): To-frame observation stacking + Ta-step
  action-chunk execution with reward aggregation — the receding-horizon
  interface used by every imitation pipeline.
- VideoWrapper / VideoRecordingWrapper (:167-255): frame capture; mp4
  writing uses imageio (av is unavailable here).

For pure-JAX envs (PushTEnvJax) the equivalent logic is fused into the
on-device rollout (pipelines/dp.py:evaluate_on_device); these wrappers
serve host envs (gymnasium MuJoCo, robomimic, etc.).
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Callable, List, Optional, Sequence

import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces
except ImportError:  # pragma: no cover
    import gym
    from gym import spaces

__all__ = ["MultiStepWrapper", "VideoWrapper", "VideoRecordingWrapper", "VideoRecorder",
           "make_sync_vector_env"]


def repeated_space(space: spaces.Space, n: int) -> spaces.Space:
    if isinstance(space, spaces.Box):
        return spaces.Box(
            low=np.repeat(space.low[None], n, axis=0),
            high=np.repeat(space.high[None], n, axis=0),
            dtype=space.dtype,
        )
    raise NotImplementedError(type(space))


def stack_last_n_obs(all_obs: Sequence[np.ndarray], n_steps: int) -> np.ndarray:
    """Stack the last n observations, front-padding by replication."""
    all_obs = list(all_obs)
    result = np.zeros((n_steps,) + np.shape(all_obs[-1]), dtype=np.asarray(all_obs[-1]).dtype)
    start_idx = -min(n_steps, len(all_obs))
    result[start_idx:] = np.asarray(all_obs[start_idx:])
    if n_steps > len(all_obs):
        result[:start_idx] = result[start_idx]
    return result


class MultiStepWrapper(gym.Wrapper):
    """obs: last n_obs_steps stacked; step(action_chunk) executes up to
    n_action_steps low-level steps; rewards aggregated (max by default)."""

    def __init__(self, env, n_obs_steps: int = 2, n_action_steps: int = 8,
                 max_episode_steps: Optional[int] = None, reward_agg_method: str = "max"):
        super().__init__(env)
        self._single_action_space = env.action_space
        self.action_space = repeated_space(env.action_space, n_action_steps)
        self.observation_space = repeated_space(env.observation_space, n_obs_steps)
        self.max_episode_steps = max_episode_steps
        self.n_obs_steps = n_obs_steps
        self.n_action_steps = n_action_steps
        self.reward_agg_method = reward_agg_method
        self.obs: deque = deque(maxlen=n_obs_steps + 1)
        self.reward: List[float] = []
        self.done: List[bool] = []
        self.info = defaultdict(lambda: deque(maxlen=n_obs_steps + 1))

    def reset(self, **kwargs):
        out = self.env.reset(**kwargs)
        obs = out[0] if isinstance(out, tuple) else out
        self.obs = deque([obs], maxlen=self.n_obs_steps + 1)
        self.reward = []
        self.done = []
        self.info = defaultdict(lambda: deque(maxlen=self.n_obs_steps + 1))
        return self._get_obs(), {}

    def step(self, action_chunk):
        """action_chunk: (n_action_steps, act_dim)."""
        truncated = False
        for act in action_chunk:
            if len(self.done) > 0 and self.done[-1]:
                break
            out = self.env.step(act)
            if len(out) == 5:
                observation, reward, terminated, trunc, info = out
                done = terminated or trunc
            else:
                observation, reward, done, info = out
            self.obs.append(observation)
            self.reward.append(float(reward))
            if self.max_episode_steps is not None and len(self.reward) >= self.max_episode_steps:
                done = True
                truncated = True
            self.done.append(bool(done))
            self._add_info(info)

        observation = self._get_obs()
        reward = self._aggregate(self.reward[-len(action_chunk):])
        done = bool(np.any(self.done[-len(action_chunk):])) if self.done else False
        return observation, reward, done, truncated, dict(self.info)

    def _get_obs(self):
        return stack_last_n_obs(self.obs, self.n_obs_steps)

    def _aggregate(self, rewards):
        if not rewards:
            return 0.0
        if self.reward_agg_method == "max":
            return float(np.max(rewards))
        if self.reward_agg_method == "sum":
            return float(np.sum(rewards))
        if self.reward_agg_method == "mean":
            return float(np.mean(rewards))
        raise NotImplementedError(self.reward_agg_method)

    def _add_info(self, info):
        for k, v in (info or {}).items():
            self.info[k].append(v)


class VideoRecorder:
    """mp4 writer via imageio (reference env/utils.py:46 uses av)."""

    def __init__(self, fps: int = 10):
        self.fps = fps
        self.frames: List[np.ndarray] = []
        self.path: Optional[str] = None

    def start(self, path: str):
        self.path = path
        self.frames = []

    def add_frame(self, frame: np.ndarray):
        if self.path is not None:
            self.frames.append(np.asarray(frame, np.uint8))

    def stop(self):
        if self.path is not None and self.frames:
            import imageio

            imageio.mimsave(self.path, self.frames, fps=self.fps)
        self.path = None
        self.frames = []


class VideoWrapper(gym.Wrapper):
    """Capture render frames each step (reference env/wrapper.py:167)."""

    def __init__(self, env, mode: str = "rgb_array", enabled: bool = True, steps_per_render: int = 1):
        super().__init__(env)
        self.mode = mode
        self.enabled = enabled
        self.steps_per_render = steps_per_render
        self.frames: List[np.ndarray] = []
        self.step_count = 0

    def reset(self, **kwargs):
        self.frames = []
        self.step_count = 1
        out = self.env.reset(**kwargs)
        if self.enabled:
            self._append_frame()
        return out

    def step(self, action):
        out = self.env.step(action)
        self.step_count += 1
        if self.enabled and (self.step_count % self.steps_per_render) == 0:
            self._append_frame()
        return out

    def _append_frame(self):
        frame = self.env.render()
        if frame is not None:
            self.frames.append(np.asarray(frame))

    def get_video(self):
        return np.stack(self.frames) if self.frames else None


class VideoRecordingWrapper(gym.Wrapper):
    """Stream frames into a VideoRecorder file (reference env/wrapper.py:211)."""

    def __init__(self, env, video_recorder: Optional[VideoRecorder] = None,
                 mode: str = "rgb_array", file_path: Optional[str] = None,
                 steps_per_render: int = 1):
        super().__init__(env)
        self.video_recorder = video_recorder or VideoRecorder()
        self.file_path = file_path
        self.steps_per_render = steps_per_render
        self.step_count = 0

    def reset(self, **kwargs):
        self.step_count = 1
        self.video_recorder.stop()
        if self.file_path is not None:
            self.video_recorder.start(self.file_path)
            frame = self.env.render()
            if frame is not None:
                self.video_recorder.add_frame(frame)
        return self.env.reset(**kwargs)

    def step(self, action):
        out = self.env.step(action)
        self.step_count += 1
        if self.file_path is not None and (self.step_count % self.steps_per_render) == 0:
            frame = self.env.render()
            if frame is not None:
                self.video_recorder.add_frame(frame)
        return out

    def stop(self):
        self.video_recorder.stop()


def make_sync_vector_env(env_fns: Sequence[Callable]):
    """Vectorized env helper (reference uses gym.vector.SyncVectorEnv /
    a vendored AsyncVectorEnv, env/async_vector_env.py:43)."""
    return gym.vector.SyncVectorEnv(list(env_fns))


class DuckSyncVectorEnv:
    """Synchronous vector env over duck-typed envs.

    gymnasium's SyncVectorEnv requires `gym.Env` subclasses; our d4rl-layout
    flattening wrappers (env/d4rl_eval.py, env/kitchen.py) are plain objects
    implementing reset/step/close. This mirrors the gymnasium semantics the
    eval loops rely on: batched obs/rew/term/trunc and autoreset on done.
    """

    def __init__(self, env_fns: Sequence[Callable]):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.action_space = self.envs[0].action_space
        self.observation_space = self.envs[0].observation_space

    def reset(self, seed=None, **kwargs):
        obs, infos = [], []
        for i, env in enumerate(self.envs):
            s = None if seed is None else seed + i
            o, info = env.reset(seed=s, **kwargs)
            obs.append(o)
            infos.append(info)
        return np.stack(obs), infos

    def step(self, actions):
        obs, rews, terms, truncs, infos = [], [], [], [], []
        for env, act in zip(self.envs, np.asarray(actions)):
            o, r, te, tr, info = env.step(act)
            if te or tr:
                o, _ = env.reset()
            obs.append(o)
            rews.append(r)
            terms.append(te)
            truncs.append(tr)
            infos.append(info)
        return (np.stack(obs), np.asarray(rews, dtype=np.float64),
                np.asarray(terms), np.asarray(truncs), infos)

    def close(self):
        for env in self.envs:
            env.close()
