"""SfBC pipeline (TPU-native).

Re-design of reference pipelines/sfbc_d4rl_mujoco.py:20-210: a SfBCUNet
behavior actor (continuous VP-SDE) plus in-sample-planning critic
iterations — a plain MLP value critic reset each iteration, retrained on
Monte-Carlo re-evaluated values produced by resampling actions from the
behavior actor and softmax-weighting their predicted values.

TPU-native: the MC re-evaluation over the whole dataset — sample M actions
for every (trajectory, timestep), score with the critic, softmax-mix —
is a jitted program vmapped over trajectories and batched over paths,
instead of the reference's per-trajectory Python loop (sfbc:105-121).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousDiffusionSDE
from ..nn_condition import MLPCondition
from ..nn_diffusion import SfBCUNet
from ..utils.blocks import Mlp
from ..utils.normalizers import GaussianNormalizer

__all__ = ["SfBCPipeline"]


class SfBCPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        emb_dim: int = 64,
        hidden_dim: int = 256,
        actor_lr: float = 3e-4,
        critic_lr: float = 3e-4,
        ema_rate: float = 0.995,
        predict_noise: bool = True,
        discount: float = 0.99,
        monte_carlo_samples: int = 16,
        weight_temperature: float = 10.0,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.discount = discount
        self.M, self.alpha = monte_carlo_samples, weight_temperature
        self.critic_lr = critic_lr

        self.actor = ContinuousDiffusionSDE(
            SfBCUNet(act_dim=act_dim, emb_dim=emb_dim),
            MLPCondition(in_dim=obs_dim, out_dim=emb_dim, hidden_dims=(emb_dim,), act=nn.silu),
            ema_rate=ema_rate,
            predict_noise=predict_noise,
            x_max=np.ones((act_dim,)),
            x_min=-np.ones((act_dim,)),
            optim_params={"lr": actor_lr, "weight_decay": 0.0},
            rng=rng,
        )
        self.actor.init(jnp.zeros((1, act_dim)), jnp.zeros((1, obs_dim)))

        self.critic = Mlp(hidden_dims=(hidden_dim, hidden_dim), out_dim=1, activation=nn.silu)
        self._rng = jax.random.PRNGKey(rng + 1)
        self.reset_critic()
        self._fn_cache = {}

    def reset_critic(self):
        """Critic is re-initialized each in-sample-planning iteration
        (reference sfbc:143-145)."""
        self._rng, k = jax.random.split(self._rng)
        self.critic_tx = optax.adam(self.critic_lr)

        def _build_critic(k):
            params = self.critic.init(k, jnp.zeros((1, self.obs_dim + self.act_dim)))
            return params, self.critic_tx.init(params)

        self.critic_params, self.critic_opt_state = jax.jit(_build_critic)(k)
        if "critic_update" not in getattr(self, "_fn_cache", {}):
            def critic_update(params, opt_state, obs, act, val):
                def loss_fn(p):
                    pred = self.critic.apply(p, jnp.concatenate([obs, act], -1))
                    return ((pred - val) ** 2).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.critic_tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            self._critic_update = jax.jit(critic_update, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def bc_train_step(self, batch):
        # keep on device: np.asarray here would force a host round-trip
        # (30ms each over the tunnel) per train step
        obs = jnp.reshape(batch["obs"]["state"], (-1, self.obs_dim))
        act = jnp.reshape(batch["act"], (-1, self.act_dim))
        return self.actor.update(act, obs)

    def make_bc_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused BC trainer: `n_steps` x (device gather + window flatten +
        diffusion update) in ONE `lax.scan` (see runner.make_rl_train_scan)."""
        gather = dataset.gather_fn(batch_size)
        raw = self.actor._make_update_fn(update_ema=True, has_wrt=False)
        raw = getattr(raw, "__wrapped__", raw)
        O, A = self.obs_dim, self.act_dim

        def fused(state, rng):
            def body(st, k):
                b = gather(k)
                obs = jnp.reshape(b["obs"]["state"], (-1, O))
                act = jnp.reshape(b["act"], (-1, A))
                st, log = raw(st, act, obs, None)
                return st, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.actor.state, log = fused_jit(self.actor.state, rng)
            return log

        return run

    def critic_train_step(self, obs, act, val):
        self.critic_params, self.critic_opt_state, loss = self._critic_update(
            self.critic_params, self.critic_opt_state,
            jnp.asarray(obs), jnp.asarray(act), jnp.asarray(val),
        )
        return {"critic_loss": loss}  # device scalar (no per-step host sync)

    # ------------------------------------------------------------------
    def _get_mc_eval_fn(self, traj_len: int, sampling_steps: int):
        key = ("mc", traj_len, sampling_steps)
        if key not in self._fn_cache:
            sample_fn = self.actor.build_sample_fn(
                solver="ddpm", sample_steps=sampling_steps, cfg_mode="cond", final_logp=False
            )
            M, alpha = self.M, self.alpha

            def mc_eval(actor_params, critic_params, rng, seq_obs):
                # seq_obs: (L, o_dim) one trajectory
                obs_rep = jnp.repeat(seq_obs[:, None, :], M, axis=1).reshape(-1, self.obs_dim)
                prior = jnp.zeros((traj_len * M, self.act_dim))
                act, _ = sample_fn(actor_params, None, rng, prior, condition_cfg=obs_rep, w_cfg=1.0)
                pred_val = self.critic.apply(
                    critic_params, jnp.concatenate([obs_rep, act], -1)
                ).reshape(traj_len, M, 1)
                w = jax.nn.softmax(alpha * pred_val, axis=1)
                return (w * pred_val).sum(1)  # (L, 1)

            self._fn_cache[key] = jax.jit(mc_eval)
        return self._fn_cache[key]

    def monte_carlo_reevaluate(self, seq_obs, seq_rew, seq_val, tml_and_not_timeout,
                               val_normalizer: GaussianNormalizer, sampling_steps: int = 5,
                               batch_paths: int = 8):
        """In-sample planning target computation (reference sfbc:103-128).

        Returns updated (seq_val, val_normalizer)."""
        n_paths, L = seq_obs.shape[0], seq_obs.shape[1]
        mc_eval = self._get_mc_eval_fn(L, sampling_steps)
        mc_batched = jax.jit(jax.vmap(mc_eval, in_axes=(None, None, 0, 0)))

        normed_eval = np.empty((n_paths, L, 1), np.float32)
        for i in range(0, n_paths, batch_paths):
            sl = slice(i, min(i + batch_paths, n_paths))
            n = sl.stop - sl.start
            self._rng, k = jax.random.split(self._rng)
            keys = jax.random.split(k, n)
            normed_eval[sl] = np.asarray(
                mc_batched(
                    self.actor.state.ema_params, self.critic_params, keys,
                    jnp.asarray(seq_obs[sl]),
                )
            )

        eval_seq_val = val_normalizer.unnormalize(normed_eval)
        target = np.empty_like(eval_seq_val)
        target[:, :-1] = seq_rew[:, :-1] + self.discount * np.maximum(
            seq_val[:, 1:], eval_seq_val[:, 1:]
        )
        target[:, -1] = eval_seq_val[:, -1]
        if tml_and_not_timeout is not None and len(tml_and_not_timeout) != 0:
            idx = tuple(np.asarray(tml_and_not_timeout).T)
            target[idx] = seq_rew[idx]
        new_normalizer = GaussianNormalizer(target)
        return target, new_normalizer

    # ------------------------------------------------------------------
    def act(self, obs_normed, num_candidates: int = 32, top_k_average: int = 4,
            sampling_steps: int = 5, temperature: float = 1.0,
            rng: Optional[jax.Array] = None):
        E = obs_normed.shape[0]
        key = ("act", E, num_candidates, top_k_average, sampling_steps)
        if key not in self._fn_cache:
            sample_fn = self.actor.build_sample_fn(
                solver="ddpm", sample_steps=sampling_steps, cfg_mode="cond", final_logp=False
            )
            K = num_candidates

            def act_fn(actor_params, critic_params, r, obs):
                obs_rep = jnp.repeat(obs[:, None, :], K, axis=1).reshape(E * K, -1)
                prior = jnp.zeros((E * K, self.act_dim))
                act, _ = sample_fn(
                    actor_params, None, r, prior, condition_cfg=obs_rep, w_cfg=1.0,
                    temperature=temperature,
                )
                value = self.critic.apply(
                    critic_params, jnp.concatenate([obs_rep, act], -1)
                ).reshape(E, K)
                act = act.reshape(E, K, -1)
                order = jnp.argsort(-value, axis=1)
                top = jnp.take_along_axis(act, order[:, :top_k_average, None], axis=1)
                return top.mean(1)

            self._fn_cache[key] = jax.jit(act_fn)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        return self._fn_cache[key](
            self.actor.state.ema_params, self.critic_params, rng, jnp.asarray(obs_normed)
        )

    # ------------------------------------------------------------------
    def save(self, path: str):
        import pickle
        self.actor.save(path + ".actor")
        with open(path + ".critic", "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, self.critic_params), f)

    def load(self, path: str):
        import pickle
        self.actor.load(path + ".actor")
        with open(path + ".critic", "rb") as f:
            self.critic_params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
