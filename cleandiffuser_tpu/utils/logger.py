"""Experiment logger: jsonl always, wandb when available.

TPU-native re-implementation of reference pipelines/utils.py:41-93
(`Timer`, `Logger` with wandb/jsonl dual output and video logging).
wandb is not installed in this environment, so it is import-gated; the
jsonl stream is the source of truth.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

__all__ = ["Timer", "Logger"]


class Timer:
    def __init__(self):
        self._start = time.time()

    def reset(self):
        self._start = time.time()
        return self._start

    def __call__(self, reset: bool = True):
        now = time.time()
        diff = now - self._start
        if reset:
            self._start = now
        return diff


class Logger:
    def __init__(self, log_dir, config: Optional[Dict[str, Any]] = None,
                 enable_wandb: bool = False, project: str = "cleandiffuser_tpu",
                 name: Optional[str] = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._files = {}
        self.wandb_run = None
        if config is not None:
            with open(self.log_dir / "config.json", "w") as f:
                json.dump(_jsonable(config), f, indent=2)
        if enable_wandb:
            try:
                import wandb

                self.wandb_run = wandb.init(
                    project=project, name=name, dir=str(self.log_dir),
                    config=_jsonable(config or {}),
                )
            except ImportError:
                print("[Logger] wandb not available; jsonl only")

    def log(self, metrics: Dict[str, Any], category: str = "train"):
        if category not in self._files:
            self._files[category] = open(self.log_dir / f"{category}.jsonl", "a")
        f = self._files[category]
        f.write(json.dumps(_jsonable({**metrics, "_time": time.time()})) + "\n")
        f.flush()
        if self.wandb_run is not None:
            self.wandb_run.log({f"{category}/{k}": v for k, v in metrics.items()})

    def save_agent(self, agent, identifier="latest"):
        agent.save(str(self.log_dir / f"ckpt_{identifier}"))

    def video_init(self, env, enable: bool = True, video_id: str = "0"):
        if hasattr(env, "video_recorder"):
            if enable:
                env.file_path = str(self.log_dir / f"video_{video_id}.mp4")
            else:
                env.file_path = None

    def finish(self, agent=None):
        if agent is not None:
            self.save_agent(agent, "final")
        for f in self._files.values():
            f.close()
        self._files = {}
        if self.wandb_run is not None:
            self.wandb_run.finish()


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "size", 2) == 1:
        return obj.item()
    if hasattr(obj, "to_dict"):
        return _jsonable(obj.to_dict())
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
