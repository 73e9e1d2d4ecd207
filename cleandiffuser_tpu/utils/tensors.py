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
    "host_constants",
    "at_least_ndim",
    "set_seed",
    "dict_apply",
    "loop_dataloader",
    "report_parameters",
    "count_parameters",
]


def host_constants():
    """Context manager: create static tables (noise schedules, dataset
    stores, masks, solver coefficients) on the HOST cpu backend. Jitted
    programs embed closed-over arrays as MLIR constants BY VALUE — if the
    array lives on the accelerator, lowering issues a device->host fetch
    per constant, which over a tunneled chip is a round trip per table and
    (observed) can wedge mid-compile. Host-backed constants lower locally
    and XLA materializes them on device inside the executable."""
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # no cpu backend (never in practice)
        from contextlib import nullcontext

        return nullcontext()


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
