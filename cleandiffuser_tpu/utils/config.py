"""Hydra-compatible configuration loader.

The reference parameterizes every pipeline with a Hydra config tree
(configs/<algo>/<bench>/<bench>.yaml with `defaults: [_self_, task: <env>]`
composition and CLI `key=value` overrides — SURVEY.md §5.6). Hydra is not
available in this environment, so this module implements the same surface:

    args = load_config("configs/dql/mujoco", "mujoco",
                       overrides=["task=hopper-medium-v2", "mode=train"])
    args.task.env_name, args.batch_size, ...

- `defaults: [_self_, task: <name>]` resolves `task/<name>.yaml` into
  `args.task` (any group, not just task).
- CLI-style overrides: "a.b=3", "task=walker2d-medium-v2" (re-resolves the
  group file), "+new_key=1".
- Values parsed with yaml (so `lr=3e-4`, `flag=true`, `mult=[1,2]` work).
- Hydra's `--config-path/--config-dir` and `--config-name` CLI flags are
  honored by `resolve_config_cli`, so reference-documented invocations like
  `python pipelines/dp_pusht.py --config-name=pusht_keypoint` or
  `--config-path=../configs/dbc/pusht/dit` work verbatim against the
  per-backbone config groups (configs/<algo>/<bench>/<nn>/<variant>.yaml).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import yaml

__all__ = ["Config", "load_config", "parse_cli", "resolve_config_cli"]


class Config:
    """Attribute-style nested dict (read/write), similar to OmegaConf."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        for k, v in (data or {}).items():
            self._data[k] = Config(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return object.__getattribute__(self, "_data")[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self._data[k] = Config(v) if isinstance(v, dict) else v

    def __getitem__(self, k):
        return self._data[k]

    def __setitem__(self, k, v):
        self.__setattr__(k, v)

    def __contains__(self, k):
        return k in self._data

    def get(self, k, default=None):
        return self._data.get(k, default)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: v.to_dict() if isinstance(v, Config) else v for k, v in self._data.items()
        }

    def merge(self, other: Union["Config", Dict]):
        other_items = other.items() if isinstance(other, Config) else other.items()
        for k, v in other_items:
            if isinstance(v, (Config, dict)) and isinstance(self._data.get(k), Config):
                self._data[k].merge(v)
            else:
                self.__setattr__(k, v.to_dict() if isinstance(v, Config) else v)

    def __repr__(self):
        return f"Config({self.to_dict()})"


def _set_dotted(cfg: Config, dotted: str, value: Any, allow_new: bool = False):
    parts = dotted.split(".")
    cur = cfg
    is_new = False
    for p in parts[:-1]:
        if p not in cur:
            is_new = True
            cur[p] = {}
        elif not isinstance(cur.get(p), Config):
            cur[p] = {}
        cur = cur[p]
    is_new = is_new or parts[-1] not in cur
    if is_new and not allow_new:
        # hydra errors here; we warn loudly but apply — a silent no-op
        # override (e.g. a mistyped nn_kwargs. prefix) is the failure mode
        # this guards against
        print(f"[config] WARNING: override {dotted!r} addresses no existing "
              f"config key — creating it (use '+{dotted}=...' to add keys "
              "intentionally)", flush=True)
    cur[parts[-1]] = value


def load_config(
    config_path: Union[str, Path],
    config_name: str,
    overrides: Optional[Sequence[str]] = None,
) -> Config:
    # jax is pre-imported at interpreter startup in this environment, so an
    # external JAX_PLATFORMS=cpu is silently ignored by the CLIs (CLAUDE.md
    # "Environment gotchas"). Honor it here — every CLI funnels through
    # load_config before its first device use.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    config_path = Path(config_path)
    with open(config_path / f"{config_name}.yaml") as f:
        raw = yaml.safe_load(f) or {}

    defaults = raw.pop("defaults", [])
    cfg = Config(raw)

    # resolve defaults groups (e.g. - task: halfcheetah-medium-v2)
    group_choices: Dict[str, str] = {}
    for entry in defaults:
        if entry == "_self_":
            continue
        if isinstance(entry, dict):
            for group, choice in entry.items():
                group_choices[str(group)] = str(choice)

    # group overrides like "task=hopper-medium-v2" change the file choice
    plain_overrides: List[str] = []
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        key = key.lstrip("+")
        if key in group_choices and "." not in key and "/" not in str(value):
            candidate = config_path / key / f"{value}.yaml"
            if candidate.exists():
                group_choices[key] = value
                continue
            available = sorted(p.stem for p in (config_path / key).glob("*.yaml"))
            raise ValueError(
                f"Unknown {key} '{value}' for {config_path.name}; "
                f"available: {available}"
            )
        plain_overrides.append(ov)

    for group, choice in group_choices.items():
        group_file = config_path / group / f"{choice}.yaml"
        with open(group_file) as f:
            group_cfg = yaml.safe_load(f) or {}
        cfg[group] = group_cfg

    for ov in plain_overrides:
        key, _, value = ov.partition("=")
        _set_dotted(cfg, key.lstrip("+"), yaml.safe_load(value),
                    allow_new=key.startswith("+"))

    return cfg


def parse_cli(argv: Sequence[str]) -> List[str]:
    """Filter argv down to key=value override tokens."""
    return [a for a in argv if "=" in a and not a.startswith("-")]


def resolve_config_cli(
    default_dir: Union[str, Path],
    default_name: str,
    argv: Sequence[str],
    nn_key: Optional[str] = None,
) -> Config:
    """Hydra-CLI-compatible config resolution for the pipeline scripts.

    - `--config-path=<dir>` / `--config-dir=<dir>` (hydra spelling): choose
      the config directory. Relative paths are resolved against the script's
      parent (hydra resolves them against the decorated file's directory, so
      the reference's documented `--config-path=../configs/...` strings work
      unchanged from `pipelines/`).
    - `--config-name=<name>`: choose the yaml (no extension).
    - `nn=<backbone>` (our shortcut, when `nn_key` is given): if
      `<default_dir>/../<backbone>/` exists, switch the group directory —
      `python pipelines/dp_pusht.py nn=dit` == `--config-path=.../dit`.
    Remaining `key=value` tokens become plain overrides.
    """
    cfg_dir = Path(default_dir)
    cfg_name = default_name
    overrides: List[str] = []
    for a in argv:
        if a.startswith("--config-path=") or a.startswith("--config-dir="):
            cfg_dir = Path(a.split("=", 1)[1])
        elif a.startswith("--config-name="):
            cfg_name = a.split("=", 1)[1]
            if cfg_name.endswith(".yaml"):
                cfg_name = cfg_name[: -len(".yaml")]
        elif "=" in a and not a.startswith("-"):
            overrides.append(a)
    if not Path(cfg_dir).is_absolute():
        # hydra semantics: relative to the calling script's directory
        import sys as _sys

        script_dir = Path(_sys.argv[0]).resolve().parent
        cfg_dir = (script_dir / cfg_dir).resolve()
    # backbone group shortcut: nn=<x> switches to the sibling <x>/ dir
    if nn_key:
        nn = next((o.split("=", 1)[1] for o in overrides
                   if o.startswith(f"{nn_key}=")), None)
        if nn is not None:
            sibling = Path(cfg_dir).parent / nn
            if (sibling / f"{cfg_name}.yaml").exists():
                cfg_dir = sibling
    return load_config(cfg_dir, cfg_name, overrides)
