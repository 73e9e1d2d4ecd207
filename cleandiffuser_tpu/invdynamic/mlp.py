"""Inverse-dynamics models — functional JAX agents.

TPU-native re-implementation of reference cleandiffuser/invdynamic/mlp.py
(MlpInvDynamic :7, FancyMlpInvDynamic :91, EnsembleMlpInvDynamic :176,
ResInvDynamic :235) and invdynamic/common.py. Each agent owns a TrainState
and a jitted fused update.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["MlpInvDynamic", "FancyMlpInvDynamic", "EnsembleMlpInvDynamic", "ResInvDynamic"]

orthogonal_init = nn.initializers.orthogonal()


class _InvMlpNet(nn.Module):
    a_dim: int
    hidden_dim: int = 512
    out_activation: Callable = jnp.tanh

    @nn.compact
    def __call__(self, oo, train: bool = False):
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=orthogonal_init)(oo))
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=orthogonal_init)(h))
        h = nn.Dense(self.a_dim, kernel_init=orthogonal_init)(h)
        return self.out_activation(h)


class _FancyInvMlpNet(nn.Module):
    a_dim: int
    hidden_dim: int = 256
    add_norm: bool = False
    add_dropout: bool = False
    out_activation: Callable = jnp.tanh

    @nn.compact
    def __call__(self, oo, train: bool = False):
        h = nn.gelu(nn.Dense(self.hidden_dim)(oo))
        if self.add_norm:
            h = nn.LayerNorm()(h)
        if self.add_dropout:
            h = nn.Dropout(0.1, deterministic=not train)(h)
        h = nn.gelu(nn.Dense(self.hidden_dim)(h))
        h = nn.Dense(self.a_dim)(h)
        return self.out_activation(h)


class _ResInvNet(nn.Module):
    a_dim: int
    hidden_dim: int = 256
    n_blocks: int = 3
    out_activation: Callable = jnp.tanh

    @nn.compact
    def __call__(self, oo, train: bool = False):
        h = nn.Dense(self.hidden_dim)(oo)
        for _ in range(self.n_blocks):
            r = nn.LayerNorm()(h)
            r = nn.gelu(nn.Dense(self.hidden_dim * 4)(r))
            r = nn.Dense(self.hidden_dim)(r)
            h = h + r
        h = nn.Dense(self.a_dim)(h)
        return self.out_activation(h)


class _BaseInvDynamic:
    """Shared train/predict harness."""

    def __init__(self, net: nn.Module, o_dim: int, lr: float, rng: Union[int, jax.Array] = 0):
        self.net = net
        self.o_dim = o_dim
        self.tx = optax.adam(lr)
        rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        k_init, self._rng = jax.random.split(rng)
        oo = jnp.zeros((1, 2 * o_dim))
        def _build(k_init):
            params = self.net.init({"params": k_init, "dropout": k_init}, oo)
            return params, self.tx.init(params)

        self.params, self.opt_state = jax.jit(_build)(k_init)

        def update_fn(params, opt_state, rng, o, a, o_next):
            oo = jnp.concatenate([o, o_next], axis=-1)

            def loss_of(p):
                a_pred = self.net.apply(p, oo, train=True, rngs={"dropout": rng})
                return ((a_pred - a) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._jit_update = jax.jit(update_fn, donate_argnums=(0, 1))
        self._jit_predict = jax.jit(
            lambda params, o, o_next: self.net.apply(
                params, jnp.concatenate([o, o_next], axis=-1)
            )
        )

    def update(self, o, a, o_next):
        self._rng, sub = jax.random.split(self._rng)
        self.params, self.opt_state, loss = self._jit_update(
            self.params, self.opt_state, sub, o, a, o_next
        )
        return {"loss": loss}  # device scalar (no per-step host sync)

    def predict(self, o, o_next):
        return self._jit_predict(self.params, o, o_next)

    def pure_predict_fn(self):
        """Pure (params, o, o_next) -> a for composition into larger programs."""
        def fn(params, o, o_next):
            return self.net.apply(params, jnp.concatenate([o, o_next], axis=-1))
        return fn

    def __call__(self, o, o_next):
        return self.predict(o, o_next)

    def train(self):
        return self

    def eval(self):
        return self

    def save(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, self.params), f)

    def load(self, path):
        with open(path, "rb") as f:
            self.params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))


class MlpInvDynamic(_BaseInvDynamic):
    def __init__(self, o_dim: int, a_dim: int, hidden_dim: int = 512,
                 out_activation: Callable = jnp.tanh, optim_params: Optional[dict] = None,
                 rng: Union[int, jax.Array] = 0, device=None):
        lr = (optim_params or {}).get("lr", 5e-4)
        super().__init__(_InvMlpNet(a_dim, hidden_dim, out_activation), o_dim, lr, rng)


class FancyMlpInvDynamic(_BaseInvDynamic):
    def __init__(self, o_dim: int, a_dim: int, hidden_dim: int = 256,
                 out_activation: Callable = jnp.tanh, add_norm: bool = False,
                 add_dropout: bool = False, optim_params: Optional[dict] = None,
                 rng: Union[int, jax.Array] = 0, device=None):
        lr = (optim_params or {}).get("lr", 3e-4)
        super().__init__(
            _FancyInvMlpNet(a_dim, hidden_dim, add_norm, add_dropout, out_activation),
            o_dim, lr, rng,
        )


class ResInvDynamic(_BaseInvDynamic):
    def __init__(self, o_dim: int, a_dim: int, hidden_dim: int = 256, n_blocks: int = 3,
                 out_activation: Callable = jnp.tanh, optim_params: Optional[dict] = None,
                 rng: Union[int, jax.Array] = 0, device=None):
        lr = (optim_params or {}).get("lr", 3e-4)
        super().__init__(_ResInvNet(a_dim, hidden_dim, n_blocks, out_activation), o_dim, lr, rng)


class EnsembleMlpInvDynamic:
    """Ensemble of MlpInvDynamic heads via vmap over a stacked param axis."""

    def __init__(self, o_dim: int, a_dim: int, n_models: int = 5, hidden_dim: int = 512,
                 out_activation: Callable = jnp.tanh, optim_params: Optional[dict] = None,
                 rng: Union[int, jax.Array] = 0, device=None):
        self.n_models = n_models
        self.net = _InvMlpNet(a_dim, hidden_dim, out_activation)
        lr = (optim_params or {}).get("lr", 5e-4)
        self.tx = optax.adam(lr)
        rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        keys = jax.random.split(rng, n_models + 1)
        self._rng = keys[0]
        oo = jnp.zeros((1, 2 * o_dim))
        self.params = jax.vmap(lambda k: self.net.init(k, oo))(keys[1:])
        self.opt_state = self.tx.init(self.params)

        def update_fn(params, opt_state, o, a, o_next):
            oo = jnp.concatenate([o, o_next], axis=-1)

            def loss_of(p):
                a_pred = jax.vmap(lambda pp: self.net.apply(pp, oo))(p)
                return ((a_pred - a[None]) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._jit_update = jax.jit(update_fn, donate_argnums=(0, 1))
        self._jit_predict = jax.jit(
            lambda params, o, o_next: jax.vmap(
                lambda pp: self.net.apply(pp, jnp.concatenate([o, o_next], axis=-1))
            )(params).mean(0)
        )

    def update(self, o, a, o_next):
        self.params, self.opt_state, loss = self._jit_update(self.params, self.opt_state, o, a, o_next)
        return {"loss": loss}  # device scalar (no per-step host sync)

    def predict(self, o, o_next):
        return self._jit_predict(self.params, o, o_next)

    def __call__(self, o, o_next):
        return self.predict(o, o_next)
