"""Compact online SAC — the data-generation engine for locomotion snapshots.

d4rl built its locomotion datasets by training SAC online and logging
rollouts of partially-trained ("medium") and fully-trained ("expert")
policies (d4rl paper §4; generation mirrored in
tools/make_locomotion_dataset.py). d4rl itself is not installable in this
environment, so this module re-creates that generator: a twin-Q SAC with
auto-tuned temperature (Haarnoja et al. 2018) over gymnasium's MuJoCo-v5
locomotion envs.

TPU notes: this is HOST-LOOP RL (per-step env interaction). Two modes:

* host mode (`ReplayRing` + `update_window`) — everything on the local
  backend; fine for tests, but on a 1-CPU host the K-update window is
  ~5ms/update and dominates (measured 139 env steps/s).
* device mode (`DeviceCollector`) — the replay ring LIVES ON THE CHIP and
  one jitted dispatch per iteration fuses {write the n_envs new
  transitions, K gradient updates sampled from the ring, next-action
  selection}. The host only steps MuJoCo and pays ONE ~30ms tunnel
  round-trip per n_envs env steps, so throughput scales with n_envs
  (~2-4k env steps/s at n_envs=128 vs 139/s in host mode). Policy
  evaluation/rollout uses `NumpyActor` (host numpy forward of the 3-layer
  actor) so episodes never touch the tunnel.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["SAC", "ReplayRing", "DeviceCollector", "NumpyActor"]

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


class NumpyActor:
    """Host numpy forward of a `_GaussianActor` param snapshot.

    Online eval/rollout steps the env once per action, which the tunneled
    chip cannot amortize (~30ms/dispatch); the actor is 3 tiny Dense
    layers, so the host does it in ~10us/batch instead."""

    def __init__(self, actor_params):
        p = jax.tree_util.tree_map(np.asarray, actor_params)["params"]
        self.layers = [(p[f"Dense_{i}"]["kernel"], p[f"Dense_{i}"]["bias"])
                       for i in range(4)]

    def __call__(self, obs, rng: np.random.Generator = None):
        x = obs
        for w, b in self.layers[:2]:
            x = np.maximum(x @ w + b, 0.0)
        mu = x @ self.layers[2][0] + self.layers[2][1]
        if rng is None:
            return np.tanh(mu)
        log_std = np.clip(x @ self.layers[3][0] + self.layers[3][1],
                          LOG_STD_MIN, LOG_STD_MAX)
        return np.tanh(mu + np.exp(log_std) * rng.standard_normal(mu.shape)
                       .astype(np.float32))


class DeviceCollector:
    """Device-resident online-RL collector (see module docstring).

    One jitted call per iteration: write the n_envs new transitions into
    the on-device ring (`.at[idx].set`), run K update steps on batches
    gathered from the ring inside the program, and select actions for the
    current observations — state and ring are donated, so the only
    host<->device traffic is ~30KB of fresh transitions in and the
    (n_envs, act_dim) actions out. The ring stores `term` (bootstrap mask,
    TERM only — timeouts bootstrap through) separately from `done`
    (episode boundary, term|trunc) plus the source env id so the export
    can reconstruct per-env contiguous segments for the d4rl
    'medium-replay' schema."""

    def __init__(self, sac: SAC, capacity: int, n_envs: int,
                 batch_size: int = 256, updates_per_iter: int = None):
        self.sac = sac
        self.capacity = capacity
        self.n_envs = n_envs
        self.batch_size = batch_size
        self.k = n_envs if updates_per_iter is None else updates_per_iter
        O, A = sac.obs_dim, sac.act_dim
        self.ring = jax.jit(lambda: {
            "obs": jnp.zeros((capacity, O), jnp.float32),
            "act": jnp.zeros((capacity, A), jnp.float32),
            "rew": jnp.zeros((capacity,), jnp.float32),
            "next_obs": jnp.zeros((capacity, O), jnp.float32),
            "term": jnp.zeros((capacity,), jnp.float32),
            "done": jnp.zeros((capacity,), jnp.float32),
            "env": jnp.zeros((capacity,), jnp.int32),
        })()
        self.ptr, self.size = 0, 0
        self._fns = {}

    def _fused(self, n_new: int, do_update: bool):
        sac, cap, K, B = self.sac, self.capacity, self.k, self.batch_size

        def f(state, ring, key, obs, new, ptr, size):
            if n_new:
                # rows arrive at FIXED n_envs width with a validity mask
                # (episode-reset rows are invalid) — masked rows scatter to
                # index `cap`, which mode='drop' discards, so the compiled
                # program never depends on how many rows were valid
                mask = new["mask"] > 0
                pos = jnp.cumsum(mask) - 1
                idx = jnp.where(mask, (ptr + pos) % cap, cap)
                ring = {k: ring[k].at[idx].set(new[k], mode="drop")
                        for k in ring}
                size = jnp.minimum(size + mask.sum(), cap)
            logs = {"critic_loss": jnp.zeros(()), "actor_loss": jnp.zeros(()),
                    "alpha": jnp.exp(state.log_alpha), "q_mean": jnp.zeros(())}
            ka, ki, ku = jax.random.split(key, 3)
            if do_update:
                u = jax.random.uniform(ki, (K, B))
                gidx = jnp.minimum((u * size).astype(jnp.int32), size - 1)
                batch = {k: ring[k][gidx] for k in
                         ("obs", "act", "rew", "next_obs", "term")}

                def body(st, inp):
                    kk, b = inp
                    return sac._update_step(st, b, kk)

                state, logs = jax.lax.scan(
                    body, state, (jax.random.split(ku, K), batch))
                logs = jax.tree_util.tree_map(lambda v: v.mean(), logs)
            mu, log_std = sac.actor_net.apply(state.actor, obs)
            act = _squash(mu, log_std, ka)[0]
            return state, ring, act, logs

        return jax.jit(f, donate_argnums=(0, 1))

    def step(self, obs: np.ndarray, new: dict = None, update: bool = True):
        """new = {obs, act, rew, next_obs, term, done, env, mask} rows at
        fixed n_envs width (or None on the very first call); returns
        (actions, device-resident logs)."""
        n_new = 0 if new is None else new["obs"].shape[0]
        n_valid = 0 if new is None else int(new["mask"].sum())
        if update and self.size == 0 and n_valid == 0:
            # gidx would index -1 and silently train on the zero row
            raise ValueError(
                "DeviceCollector.step(update=True) on an empty ring — warm "
                "up with update=False (or pass transitions) first")
        key = (n_new, update)
        if key not in self._fns:
            self._fns[key] = self._fused(n_new, update)
        self.sac._rng, k = jax.random.split(self.sac._rng)
        state, self.ring, act, logs = self._fns[key](
            self.sac.state, self.ring, k, obs, new,
            jnp.int32(self.ptr), jnp.int32(self.size))
        self.sac.state = state
        self.ptr = (self.ptr + n_valid) % self.capacity
        self.size = min(self.size + n_valid, self.capacity)
        return np.asarray(act), logs

    def export(self) -> dict:
        """Fetch the ring once and emit the d4rl 'medium-replay' views:
        rows are chronological but ENV-INTERLEAVED (n_envs writers), so the
        sequence view stable-sorts by env id (preserving per-env time
        order) and marks segment boundaries, while the transition view
        pairs each row with its STORED next_obs (row i+1 is a different
        env's step, never the successor)."""
        host = {k: np.asarray(v) for k, v in self.ring.items()}
        order = (np.arange(self.size) +
                 (self.ptr if self.size == self.capacity else 0)) % self.capacity
        host = {k: v[order] for k, v in host.items()}
        by_env = np.argsort(host["env"], kind="stable")
        seq = {k: host[k][by_env] for k in host}
        timeouts = np.logical_and(seq["done"] > 0, seq["term"] == 0)
        # end of each env's segment (and the ring's last row) truncates
        # whatever episode was mid-flight there
        seg_end = np.ones((self.size,), bool)
        seg_end[:-1] = seq["env"][:-1] != seq["env"][1:]
        timeouts = np.logical_or(timeouts,
                                 np.logical_and(seg_end, seq["term"] == 0))
        return {
            "observations": seq["obs"],
            "actions": seq["act"],
            "rewards": seq["rew"],
            "terminals": seq["term"],
            "timeouts": timeouts.astype(np.float32),
            # transition view with true successors (qlearning schema)
            "qlearning": {
                "observations": host["obs"],
                "actions": host["act"],
                "next_observations": host["next_obs"],
                "rewards": host["rew"],
                "terminals": host["term"],
            },
        }
