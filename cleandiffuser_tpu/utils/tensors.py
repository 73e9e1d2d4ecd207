"""Small tensor helpers shared across the framework.

TPU-native analogue of reference cleandiffuser/utils/utils.py general helpers
(at_least_ndim utils/utils.py:26, dict_apply utils/utils.py:465,
loop_dataloader utils/utils.py:478, report_parameters utils/utils.py:355,
set_seed utils/utils.py:18).
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "at_least_ndim",
    "set_seed",
    "dict_apply",
    "loop_dataloader",
    "report_parameters",
    "count_parameters",
]


def at_least_ndim(x, ndim: int, pad: int = 0):
    """Pad shape with size-1 dims until `x.ndim == ndim`.

    pad=0 appends trailing dims (broadcast per-batch scalars over features);
    pad=1 prepends leading dims. Mirrors reference utils/utils.py:26-44.
    """
    if isinstance(x, (int, float)):
        return x
    n = ndim - x.ndim
    if n <= 0:
        return x
    if pad == 0:
        return x.reshape(x.shape + (1,) * n)
    return x.reshape((1,) * n + x.shape)


def set_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return a fresh jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def dict_apply(d: Dict[str, Any], fn: Callable) -> Dict[str, Any]:
    """Recursively apply `fn` to array leaves of a nested dict."""
    out = {}
    for k, v in d.items():
        out[k] = dict_apply(v, fn) if isinstance(v, dict) else fn(v)
    return out


def loop_dataloader(iterable):
    """Infinitely cycle an iterable (e.g. a data loader)."""
    while True:
        for batch in iterable:
            yield batch


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _to_str(num: float) -> str:
    return f"{num / 1e6:.2f} M" if num >= 1e6 else f"{num / 1e3:.2f} k"


def report_parameters(params, topk: int = 10) -> int:
    """Print total and top-k largest parameters of a params pytree."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    counts = {jax.tree_util.keystr(k): int(np.prod(v.shape)) for k, v in flat}
    total = sum(counts.values())
    print(f"Total parameters: {_to_str(total)}")
    sorted_counts = sorted(counts.items(), key=lambda kv: -kv[1])[:topk]
    print(f"Top {topk} parameters:")
    for k, v in sorted_counts:
        print(f"  {k}: {_to_str(v)}")
    return total
