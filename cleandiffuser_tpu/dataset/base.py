"""Dataset base + device-resident batch sampler.

TPU-native re-design of reference cleandiffuser/dataset/base_dataset.py:24-40.
Two access paths:

1. `__getitem__` / `__len__` — numpy dict batches, drop-in for a
   torch-style DataLoader (API parity with the reference).
2. `sample_batch(rng, batch_size)` — the TPU-native hot path. The full
   (normalized) dataset lives in device HBM as dense arrays; a batch is a
   jitted gather (random index draw + vmap'd dynamic_slice) that never
   touches the host. This replaces the reference's fork-based DataLoader
   workers + H2D copy per step (SURVEY.md §3.1 'device boundary').

Terminology (reference base_dataset.py:9-21): To = observation horizon,
Ta = action horizon, T = prediction horizon.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


__all__ = ["BaseDataset", "DeviceSeqSampler", "DeviceTDSampler"]


def _constrain(batch, sharding):
    """Inside-jit dp-sharding of a gathered batch: when the sampler was
    placed on a mesh, pin the gather output to the batch sharding so a
    fused train window keeps its batches dp-sharded (the jitted
    `sample` path gets the same via out_shardings)."""
    if sharding is None:
        return batch
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), batch)


class BaseDataset:
    """Dict-batch contract: {"obs": {"state": ...}, "act": ..., ...}."""

    normalizers: Dict = {}

    def get_normalizer(self):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx: int):
        raise NotImplementedError

    def sample_batch(self, rng: jax.Array, batch_size: int):
        raise NotImplementedError

    def gather_fn(self, batch_size: int):
        """PURE batch gather `fn(rng) -> batch` (no jit wrapper) for
        composition inside a fused train `lax.scan` — the same nested dict
        `sample_batch` returns, produced by routing the dataset's own
        `sample_batch` wrapper over the sampler's pure gather so the batch
        structure is defined in exactly one place. Works for any dataset
        whose `sample_batch` is a pure dict re-wrap of its `_sampler`
        output; datasets with bespoke device caches override this."""
        import copy

        sampler = getattr(self, "_sampler", None)
        if sampler is None:
            raise NotImplementedError(
                f"{type(self).__name__} has no _sampler; override gather_fn")
        pure = sampler.gather_fn(batch_size)

        class _PureShim:
            def sample(self, rng, _batch_size):
                return pure(rng)

        shadow = copy.copy(self)
        shadow._sampler = _PureShim()
        return lambda rng: shadow.sample_batch(rng, batch_size)

    def place_on_mesh(self, mesh, axis: str = "dp"):
        """Multi-chip mode: replicate the device-resident store over the
        mesh and emit dp-sharded batches straight from the gather (each
        chip gathers only its batch shard locally — no per-step host
        device_put, no cross-chip batch traffic).

        Generic implementation walks the dataset's samplers; datasets with
        bespoke device caches override this.
        """
        for val in vars(self).values():
            items = val if isinstance(val, (list, tuple)) else [val]
            for item in items:
                if isinstance(item, (DeviceSeqSampler, DeviceTDSampler)):
                    item.place_on_mesh(mesh, axis)
        return self


class DeviceSeqSampler:
    """Device-resident (paths, time, dim) store with windowed gather.

    arrays: dict name -> (n_paths, max_len, d) numpy array.
    indices: (N, 2) [path_idx, start].
    horizon/stride: window spec; per-name horizon overrides via scalars
    (e.g. "val" gathers a single timestep).
    """

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        indices: np.ndarray,
        horizon: int,
        stride: int = 1,
        scalars: Optional[Dict[str, np.ndarray]] = None,
    ):
        # ref-backed store: jitted programs embed closed-over ARRAYS as
        # MLIR constants by value (a real-data store is hundreds of MB —
        # the serialized program blows the tunnel's upload limit, and
        # accelerator-resident constants wedge lowering on fetch-back).
        # Closed-over `jax.Ref`s instead become implicit runtime arguments:
        # the store lives in device HBM once and every gather program
        # references it by handle.
        self.arrays = {k: jax.new_ref(jnp.asarray(v)) for k, v in arrays.items()}
        self.scalars = {k: jax.new_ref(jnp.asarray(v))
                        for k, v in (scalars or {}).items()}
        self.indices = jax.new_ref(jnp.asarray(np.asarray(indices, np.int32)))
        self.horizon, self.stride = horizon, stride
        self._jit_cache = {}
        self._out_sharding = None
        self._dp_size = 1

    def place_on_mesh(self, mesh, axis: str = "dp"):
        from ..parallel.mesh import batch_sharded, replicated

        rep = replicated(mesh)
        reput = lambda r: jax.new_ref(jax.device_put(r[...], rep))
        self.arrays = {k: reput(v) for k, v in self.arrays.items()}
        self.scalars = {k: reput(v) for k, v in self.scalars.items()}
        self.indices = reput(self.indices)
        self._out_sharding = batch_sharded(mesh, axis)
        self._dp_size = mesh.shape[axis]
        self._jit_cache = {}
        return self

    def gather_fn(self, batch_size: int):
        """PURE windowed gather (no jit wrapper) — for composition inside a
        caller's fused `lax.scan` train window."""
        H, S = self.horizon, self.stride
        arrays, scalars, indices = self.arrays, self.scalars, self.indices
        N = indices.shape[0]

        def sample(rng):
            k = jax.random.randint(rng, (batch_size,), 0, N)
            idx = indices[...]
            path = idx[k, 0]
            start = idx[k, 1]

            def gather_one(name):
                arr = arrays[name][...]

                def slice_one(p, s):
                    full = jax.lax.dynamic_slice(
                        arr, (p, s, 0), (1, (H - 1) * S + 1, arr.shape[-1])
                    )[0]
                    return full[::S] if S > 1 else full

                return jax.vmap(slice_one)(path, start)

            out = {name: gather_one(name) for name in arrays}
            for name, ref in scalars.items():
                # scalar-per-window: value at the window start
                arr = ref[...]
                out[name] = jax.vmap(lambda p, s: arr[p, s])(path, start)
            return _constrain(out, out_sharding)

        out_sharding = self._out_sharding
        return sample

    def _build(self, batch_size: int):
        return jax.jit(self.gather_fn(batch_size), out_shardings=self._out_sharding)

    def sample(self, rng: jax.Array, batch_size: int):
        assert batch_size % self._dp_size == 0, (
            f"batch_size={batch_size} not divisible by dp size {self._dp_size}")
        if batch_size not in self._jit_cache:
            self._jit_cache[batch_size] = self._build(batch_size)
        return self._jit_cache[batch_size](rng)


class DeviceTDSampler:
    """Device-resident flat transition store with random gather."""

    def __init__(self, arrays: Dict[str, np.ndarray]):
        # ref-backed store — see DeviceSeqSampler.__init__
        self.arrays = {k: jax.new_ref(jnp.asarray(v)) for k, v in arrays.items()}
        self.size = next(iter(arrays.values())).shape[0]
        self._jit_cache = {}
        self._out_sharding = None
        self._dp_size = 1

    def place_on_mesh(self, mesh, axis: str = "dp"):
        from ..parallel.mesh import batch_sharded, replicated

        rep = replicated(mesh)
        self.arrays = {
            k: jax.new_ref(jax.device_put(v[...], rep))
            for k, v in self.arrays.items()
        }
        self._out_sharding = batch_sharded(mesh, axis)
        self._dp_size = mesh.shape[axis]
        self._jit_cache = {}
        return self

    def gather_fn(self, batch_size: int):
        """PURE gather (no jit wrapper) — see DeviceSeqSampler.gather_fn."""
        arrays, size = self.arrays, self.size
        out_sharding = self._out_sharding

        def sample(rng):
            k = jax.random.randint(rng, (batch_size,), 0, size)
            out = {name: jnp.take(ref[...], k, axis=0)
                   for name, ref in arrays.items()}
            return _constrain(out, out_sharding)

        return sample

    def _build(self, batch_size: int):
        return jax.jit(self.gather_fn(batch_size), out_shardings=self._out_sharding)

    def sample(self, rng: jax.Array, batch_size: int):
        assert batch_size % self._dp_size == 0, (
            f"batch_size={batch_size} not divisible by dp size {self._dp_size}")
        if batch_size not in self._jit_cache:
            self._jit_cache[batch_size] = self._build(batch_size)
        return self._jit_cache[batch_size](rng)
