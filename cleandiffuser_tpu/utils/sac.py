"""Compact online SAC — the data-generation engine for locomotion snapshots.

d4rl built its locomotion datasets by training SAC online and logging
rollouts of partially-trained ("medium") and fully-trained ("expert")
policies (d4rl paper §4; generation mirrored in
tools/make_locomotion_dataset.py). d4rl itself is not installable in this
environment, so this module re-creates that generator: a twin-Q SAC with
auto-tuned temperature (Haarnoja et al. 2018) over gymnasium's MuJoCo-v5
locomotion envs.

TPU notes: this is HOST-LOOP RL (per-step env interaction), so it runs on
the CPU backend — the tunneled chip costs ~30ms per dispatch, which an
online actor cannot amortize. All K gradient updates of an iteration run
in ONE `lax.scan` program over pre-gathered batch stacks; the host only
steps MuJoCo and owns the replay ring.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["SAC", "ReplayRing"]

LOG_STD_MIN, LOG_STD_MAX = -10.0, 2.0


class _GaussianActor(nn.Module):
    act_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, obs):
        x = obs
        for _ in range(2):
            x = nn.relu(nn.Dense(self.hidden)(x))
        mu = nn.Dense(self.act_dim)(x)
        log_std = nn.Dense(self.act_dim)(x)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mu, log_std


class _TwinQ(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], -1)
        qs = []
        for _ in range(2):
            h = x
            for _ in range(2):
                h = nn.relu(nn.Dense(self.hidden)(h))
            qs.append(nn.Dense(1)(h))
        return jnp.concatenate(qs, -1)  # (B, 2)


def _squash(mu, log_std, key):
    """Reparameterized tanh-Gaussian sample + its log-prob."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    act = jnp.tanh(pre)
    logp = (-0.5 * (eps**2) - log_std - 0.5 * np.log(2 * np.pi)).sum(-1)
    logp -= jnp.log(1 - act**2 + 1e-6).sum(-1)
    return act, logp


@flax.struct.dataclass
class SACState:
    actor: Any
    critic: Any
    target_critic: Any
    log_alpha: jax.Array
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any


class ReplayRing:
    """Host-side ring buffer (numpy). The gather for a K-update window is
    one fancy-index on the host — microseconds for MLP-sized batches."""

    def __init__(self, capacity: int, obs_dim: int, act_dim: int):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.act = np.zeros((capacity, act_dim), np.float32)
        self.rew = np.zeros((capacity,), np.float32)
        self.next_obs = np.zeros((capacity, obs_dim), np.float32)
        self.term = np.zeros((capacity,), np.float32)
        self.ptr, self.size = 0, 0

    def add_batch(self, obs, act, rew, next_obs, term):
        n = obs.shape[0]
        idx = (self.ptr + np.arange(n)) % self.capacity
        self.obs[idx], self.act[idx], self.rew[idx] = obs, act, rew
        self.next_obs[idx], self.term[idx] = next_obs, term
        self.ptr = (self.ptr + n) % self.capacity
        self.size = min(self.size + n, self.capacity)

    def gather_stack(self, rng: np.random.Generator, k: int, batch_size: int):
        """(K, B, ·) batch stacks for one fused K-update scan."""
        idx = rng.integers(0, self.size, size=(k, batch_size))
        return {
            "obs": self.obs[idx], "act": self.act[idx], "rew": self.rew[idx],
            "next_obs": self.next_obs[idx], "term": self.term[idx],
        }

    def export(self, timeout_mask: np.ndarray = None):
        """Chronological d4rl-schema view of the ring's current content
        (the 'medium-replay' dataset is exactly this)."""
        order = (np.arange(self.size) + (self.ptr if self.size == self.capacity
                                         else 0)) % self.capacity
        return {
            "observations": self.obs[order].copy(),
            "actions": self.act[order].copy(),
            "rewards": self.rew[order].copy(),
            "terminals": self.term[order].copy(),
            "timeouts": np.zeros((self.size,), np.float32)
            if timeout_mask is None else timeout_mask[order].copy(),
        }


class SAC:
    def __init__(self, obs_dim: int, act_dim: int, lr: float = 3e-4,
                 gamma: float = 0.99, tau: float = 5e-3, rng: int = 0):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.gamma, self.tau = gamma, tau
        self.target_entropy = -float(act_dim)
        self.actor_net = _GaussianActor(act_dim)
        self.critic_net = _TwinQ()
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.alpha_tx = optax.adam(lr)

        def _build(key):
            ka, kc = jax.random.split(key)
            o = jnp.zeros((1, obs_dim))
            a = jnp.zeros((1, act_dim))
            actor = self.actor_net.init(ka, o)
            critic = self.critic_net.init(kc, o, a)
            log_alpha = jnp.zeros(())
            return SACState(
                actor=actor, critic=critic,
                target_critic=jax.tree_util.tree_map(jnp.copy, critic),
                log_alpha=log_alpha,
                actor_opt=self.actor_tx.init(actor),
                critic_opt=self.critic_tx.init(critic),
                alpha_opt=self.alpha_tx.init(log_alpha),
            )

        self.state = jax.jit(_build)(jax.random.PRNGKey(rng))
        self._rng = jax.random.PRNGKey(rng + 1)
        self._fn_cache = {}

    # ---------------- acting ----------------
    def _act_fn(self, deterministic: bool):
        def f(actor_params, key, obs):
            mu, log_std = self.actor_net.apply(actor_params, obs)
            if deterministic:
                return jnp.tanh(mu)
            return _squash(mu, log_std, key)[0]

        return jax.jit(f)

    def act(self, obs: np.ndarray, deterministic: bool = False) -> np.ndarray:
        key = ("act", deterministic)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._act_fn(deterministic)
        self._rng, k = jax.random.split(self._rng)
        return np.asarray(self._fn_cache[key](self.state.actor, k, obs))

    # ---------------- learning ----------------
    def _update_step(self, state: SACState, batch, key):
        obs, act = batch["obs"], batch["act"]
        rew, next_obs, term = batch["rew"], batch["next_obs"], batch["term"]
        k1, k2 = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        # critic: y = r + gamma (1-term) [min Q'(s', a') - alpha logp(a')]
        mu_n, ls_n = self.actor_net.apply(state.actor, next_obs)
        a_n, logp_n = _squash(mu_n, ls_n, k1)
        q_n = self.critic_net.apply(state.target_critic, next_obs, a_n).min(-1)
        y = jax.lax.stop_gradient(rew + self.gamma * (1 - term) * (q_n - alpha * logp_n))

        def critic_loss_fn(p):
            q = self.critic_net.apply(p, obs, act)
            return ((q - y[:, None]) ** 2).mean()

        closs, cgrad = jax.value_and_grad(critic_loss_fn)(state.critic)
        cup, copt = self.critic_tx.update(cgrad, state.critic_opt, state.critic)
        critic = optax.apply_updates(state.critic, cup)

        def actor_loss_fn(p):
            mu, ls = self.actor_net.apply(p, obs)
            a, logp = _squash(mu, ls, k2)
            q = self.critic_net.apply(critic, obs, a).min(-1)
            return (alpha * logp - q).mean(), logp.mean()

        (aloss, logp_mean), agrad = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(state.actor)
        aup, aopt = self.actor_tx.update(agrad, state.actor_opt, state.actor)
        actor = optax.apply_updates(state.actor, aup)

        def alpha_loss_fn(la):
            return -jnp.exp(la) * jax.lax.stop_gradient(
                logp_mean + self.target_entropy)

        lloss, lgrad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        lup, lopt = self.alpha_tx.update(lgrad, state.alpha_opt, state.log_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, lup)

        target = jax.tree_util.tree_map(
            lambda t, p: (1 - self.tau) * t + self.tau * p,
            state.target_critic, critic)
        new_state = SACState(actor, critic, target, log_alpha, aopt, copt, lopt)
        return new_state, {"critic_loss": closs, "actor_loss": aloss,
                           "alpha": jnp.exp(log_alpha), "q_mean": y.mean()}

    def update_window(self, batch_stack) -> dict:
        """K gradient updates in ONE jitted scan; batch_stack leaves are
        (K, B, ·) from ReplayRing.gather_stack."""
        k = next(iter(jax.tree_util.tree_leaves(batch_stack))).shape[0]
        key = ("window", k)
        if key not in self._fn_cache:
            def fused(state, rng, stack):
                def body(st, inp):
                    kk, batch = inp
                    return self._update_step(st, batch, kk)

                keys = jax.random.split(rng, k)
                state, logs = jax.lax.scan(body, state, (keys, stack))
                return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

            self._fn_cache[key] = jax.jit(fused, donate_argnums=0)
        self._rng, kk = jax.random.split(self._rng)
        self.state, log = self._fn_cache[key](self.state, kk, batch_stack)
        return log

    # ---------------- persistence ----------------
    def save(self, path: str):
        import pickle
        from pathlib import Path

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, self.state), f)

    def load(self, path: str):
        import pickle

        with open(path, "rb") as f:
            self.state = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))

    def snapshot_actor(self):
        return jax.tree_util.tree_map(np.asarray, self.state.actor)
