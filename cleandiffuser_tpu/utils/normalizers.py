"""Normalizers.

TPU-native re-implementation of both normalizer families in the reference
CleanDiffuser:
  - cleandiffuser/utils/normalizers.py (start_dim semantics), and
  - cleandiffuser/dataset/dataset_utils.py:244-380 (dataset-side family,
    incl. the empirical-CDF normalizer).

Statistics are computed once on host (numpy) and stored as plain arrays so
they can be baked into jitted programs as device-resident constants
(`as_device_constants`). normalize/unnormalize accept numpy or jax arrays
and stay in whichever array namespace they were given.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "EmptyNormalizer",
    "GaussianNormalizer",
    "MinMaxNormalizer",
    "ImageNormalizer",
    "DatasetGaussianNormalizer",
    "DatasetMinMaxNormalizer",
    "CDFNormalizer",
    "CDFNormalizer1d",
]


def _at_least_ndim_back(x, ndim: int):
    """Pad shape with leading 1s so `x` broadcasts against an ndim array."""
    if isinstance(x, (int, float)):
        return x
    pad = ndim - x.ndim
    if pad <= 0:
        return x
    return x.reshape((1,) * pad + x.shape)


class EmptyNormalizer:
    """Identity normalizer (reference utils/normalizers.py:8)."""

    def normalize(self, x):
        return x

    def unnormalize(self, x):
        return x

    def as_device_constants(self):
        return {}


class GaussianNormalizer(EmptyNormalizer):
    """Zero-mean unit-variance per-dim (reference utils/normalizers.py:21).

    `start_dim` selects which trailing dims keep their own statistics;
    leading dims are reduced over.
    """

    def __init__(self, X: np.ndarray, start_dim: int = -1):
        X = np.asarray(X)
        if start_dim < 0:
            start_dim = X.ndim + start_dim
        axes = tuple(range(start_dim))
        self.mean = np.mean(X, axis=axes).astype(np.float32)
        self.std = np.std(X, axis=axes).astype(np.float32)
        self.std[self.std == 0] = 1.0

    def normalize(self, x):
        return (x - _at_least_ndim_back(self.mean, x.ndim)) / _at_least_ndim_back(self.std, x.ndim)

    def unnormalize(self, x):
        return x * _at_least_ndim_back(self.std, x.ndim) + _at_least_ndim_back(self.mean, x.ndim)

    def as_device_constants(self):
        return {"mean": jnp.asarray(self.mean), "std": jnp.asarray(self.std)}


class MinMaxNormalizer(EmptyNormalizer):
    """[min, max] -> [-1, 1] per-dim (reference utils/normalizers.py:67)."""

    def __init__(
        self,
        X: np.ndarray,
        start_dim: int = -1,
        X_max: Optional[np.ndarray] = None,
        X_min: Optional[np.ndarray] = None,
    ):
        X = np.asarray(X)
        if start_dim < 0:
            start_dim = X.ndim + start_dim
        axes = tuple(range(start_dim))
        self.max = (np.max(X, axis=axes) if X_max is None else np.asarray(X_max)).astype(np.float32)
        self.min = (np.min(X, axis=axes) if X_min is None else np.asarray(X_min)).astype(np.float32)
        self.mask = np.ones_like(self.max)
        self.range = self.max - self.min
        self.mask[self.max == self.min] = 0.0
        self.range[self.range == 0] = 1.0

    def normalize(self, x):
        nd = x.ndim
        x = (x - _at_least_ndim_back(self.min, nd)) / _at_least_ndim_back(self.range, nd)
        return (x * 2 - 1) * _at_least_ndim_back(self.mask, nd)

    def unnormalize(self, x):
        nd = x.ndim
        x = (x + 1) / 2
        x = x * _at_least_ndim_back(self.mask, nd)
        return x * _at_least_ndim_back(self.range, nd) + _at_least_ndim_back(self.min, nd)

    def as_device_constants(self):
        return {
            "min": jnp.asarray(self.min),
            "range": jnp.asarray(self.range),
            "mask": jnp.asarray(self.mask),
        }


class ImageNormalizer(EmptyNormalizer):
    """[0, 1] -> [-1, 1] (reference dataset/dataset_utils.py:323)."""

    def normalize(self, x):
        return x * 2.0 - 1.0

    def unnormalize(self, x):
        return (x + 1.0) / 2.0


class DatasetGaussianNormalizer(EmptyNormalizer):
    """Dataset-side Gaussian: reduce over axis 0 only
    (reference dataset/dataset_utils.py:306)."""

    def __init__(self, X: np.ndarray):
        X = np.asarray(X, dtype=np.float32)
        self.means, self.stds = X.mean(0), X.std(0)
        self.stds[self.stds == 0] = 1.0

    def normalize(self, x):
        return (x - self.means) / self.stds

    def unnormalize(self, x):
        return x * self.stds + self.means

    def as_device_constants(self):
        return {"mean": jnp.asarray(self.means), "std": jnp.asarray(self.stds)}


class DatasetMinMaxNormalizer(EmptyNormalizer):
    """Dataset-side MinMax: flatten to (-1, D), reduce over axis 0
    (reference dataset/dataset_utils.py:338)."""

    def __init__(self, X: np.ndarray):
        X = np.asarray(X, dtype=np.float32).reshape(-1, X.shape[-1])
        self.min, self.max = np.min(X, axis=0), np.max(X, axis=0)
        self.range = self.max - self.min
        self.range[self.range == 0] = 1.0

    def normalize(self, x):
        nx = (x - self.min) / self.range
        return nx * 2 - 1

    def unnormalize(self, x):
        nx = (x + 1) / 2
        return nx * self.range + self.min

    def as_device_constants(self):
        return {"min": jnp.asarray(self.min), "range": jnp.asarray(self.range)}


def empirical_cdf(sample: np.ndarray):
    """(quantiles, cumprob) of a 1-D sample
    (reference dataset/dataset_utils.py:228-239)."""
    quantiles, counts = np.unique(sample, return_counts=True)
    cumprob = np.cumsum(counts).astype(np.float64) / sample.size
    return quantiles, cumprob


class CDFNormalizer1d:
    """Per-dimension empirical-CDF normalizer using linear interpolation
    (reference dataset/dataset_utils.py:244-273); numpy.interp replaces
    scipy interp1d."""

    def __init__(self, X: np.ndarray):
        assert X.ndim == 1
        X = X.astype(np.float32)
        self.quantiles, self.cumprob = empirical_cdf(X)
        self.xmin, self.xmax = self.quantiles.min(), self.quantiles.max()
        self.ymin, self.ymax = self.cumprob.min(), self.cumprob.max()

    def normalize(self, x):
        x = np.clip(x, self.xmin, self.xmax)
        y = np.interp(x, self.quantiles, self.cumprob)
        return 2 * y - 1

    def unnormalize(self, x, eps=1e-4):
        x = (np.asarray(x) + 1) / 2.0
        x = np.clip(x, self.ymin, self.ymax)
        return np.interp(x, self.cumprob, self.quantiles)


class CDFNormalizer(EmptyNormalizer):
    """Marginal-CDF normalizer (reference dataset/dataset_utils.py:276-300)."""

    def __init__(self, X: np.ndarray):
        X = np.asarray(X, dtype=np.float32)
        self.dim = X.shape[-1]
        flat = X.reshape(-1, self.dim)
        self.cdfs = [CDFNormalizer1d(flat[:, i]) for i in range(self.dim)]

    def _wrap(self, fn_name, x):
        shape = x.shape
        x = np.asarray(x).reshape(-1, self.dim)
        out = np.zeros_like(x)
        for i, cdf in enumerate(self.cdfs):
            out[:, i] = getattr(cdf, fn_name)(x[:, i])
        return out.reshape(shape)

    def normalize(self, x):
        return self._wrap("normalize", x)

    def unnormalize(self, x):
        return self._wrap("unnormalize", x)
