"""Implicit Q-Learning (IQL) — functional JAX implementation.

TPU-native equivalent of reference cleandiffuser/utils/iql.py:40-95. The V
and Q updates (including the Polyak target update) compile into single
jitted XLA programs; state lives in immutable pytrees.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .blocks import TwinQ, V

__all__ = ["IQL", "IQLState"]


@flax.struct.dataclass
class IQLState:
    q_params: Any
    q_target_params: Any
    v_params: Any
    q_opt_state: Any
    v_opt_state: Any


class IQL:
    """Expectile-regression IQL agent.

    Usage mirrors the reference (utils/iql.py:50-56):
        >>> iql = IQL(obs_dim, act_dim)
        >>> loss_v = iql.update_V(obs, act)
        >>> loss_q = iql.update_Q(obs, act, rew, obs_next, done)
    """

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        tau: float = 0.7,
        discount: float = 0.99,
        hidden_dim: int = 256,
        lr: float = 3e-4,
        target_mu: float = 0.995,
        rng: jax.Array | int = 0,
    ):
        self.iql_tau, self.discount, self.target_mu = tau, discount, target_mu
        self.Q = TwinQ(hidden_dim=hidden_dim)
        self.V = V(hidden_dim=hidden_dim)
        self.optQ = optax.adam(lr)
        self.optV = optax.adam(lr)

        rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        kq, kv = jax.random.split(rng)
        obs = jnp.zeros((1, obs_dim))
        act = jnp.zeros((1, act_dim))
        def _build(kq, kv):
            q_params = self.Q.init(kq, obs, act)
            v_params = self.V.init(kv, obs)
            return IQLState(
                q_params=q_params,
                q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
                v_params=v_params,
                q_opt_state=self.optQ.init(q_params),
                v_opt_state=self.optV.init(v_params),
            )

        self.state = jax.jit(_build)(kq, kv)

        self._jit_update_v = jax.jit(self._update_v)
        self._jit_update_q = jax.jit(self._update_q)
        self._jit_q = jax.jit(lambda s, o, a: self.Q.apply(s.q_params, o, a))
        self._jit_q_target = jax.jit(lambda s, o, a: self.Q.apply(s.q_target_params, o, a))
        self._jit_v = jax.jit(lambda s, o: self.V.apply(s.v_params, o))

    # ---- pure update fns -------------------------------------------------
    def _update_v(self, state: IQLState, obs, act):
        q = self.Q.apply(state.q_target_params, obs, act)

        def loss_fn(v_params):
            v = self.V.apply(v_params, obs)
            diff = q - v
            weight = jnp.abs(self.iql_tau - (diff < 0).astype(jnp.float32))
            return (weight * diff**2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.v_params)
        updates, v_opt_state = self.optV.update(grads, state.v_opt_state, state.v_params)
        v_params = optax.apply_updates(state.v_params, updates)
        return state.replace(v_params=v_params, v_opt_state=v_opt_state), loss

    def _update_q(self, state: IQLState, obs, act, rew, obs_next, done):
        v_next = self.V.apply(state.v_params, obs_next)
        td_target = rew + self.discount * (1.0 - done) * v_next

        def loss_fn(q_params):
            q1, q2 = self.Q.apply(q_params, obs, act, method=TwinQ.both)
            return ((q1 - td_target) ** 2 + (q2 - td_target) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.q_params)
        updates, q_opt_state = self.optQ.update(grads, state.q_opt_state, state.q_params)
        q_params = optax.apply_updates(state.q_params, updates)
        q_target_params = jax.tree_util.tree_map(
            lambda t, p: self.target_mu * t + (1 - self.target_mu) * p,
            state.q_target_params,
            q_params,
        )
        return (
            state.replace(
                q_params=q_params, q_opt_state=q_opt_state, q_target_params=q_target_params
            ),
            loss,
        )

    # ---- stateful API (parity with reference) ----------------------------
    def update_V(self, obs, act) -> float:
        self.state, loss = self._jit_update_v(self.state, obs, act)
        return loss  # device scalar (no per-step host sync)

    def update_Q(self, obs, act, rew, obs_next, done) -> float:
        self.state, loss = self._jit_update_q(self.state, obs, act, rew, obs_next, done)
        return loss  # device scalar (no per-step host sync)

    def q(self, obs, act):
        return self._jit_q(self.state, obs, act)

    def q_target(self, obs, act):
        return self._jit_q_target(self.state, obs, act)

    def v(self, obs):
        return self._jit_v(self.state, obs)

    def save(self, path: str):
        host = jax.tree_util.tree_map(np.asarray, self.state)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(host, f)

    def load(self, path: str):
        with open(path, "rb") as f:
            host = pickle.load(f)
        self.state = jax.tree_util.tree_map(jnp.asarray, host)
