"""EDP (Efficient Diffusion Policy) pipeline (TPU-native).

Re-design of reference pipelines/edp_d4rl_mujoco.py:60-130: same skeleton
as DQL but the policy Q-loss uses the ONE-STEP action approximation —
re-predict the action from a randomly-noised version instead of full
sampling (reference edp:99-111) — avoiding backprop-through-sampling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.tensors import at_least_ndim
from .dql import CriticState, DQLPipeline

__all__ = ["EDPPipeline"]


class EDPPipeline(DQLPipeline):
    """Inherits DQL's networks/eval; overrides the policy loss with the
    one-step action approximation."""

    def __init__(self, *args, predict_noise: bool = False, sampling_steps: int = 15, **kwargs):
        super().__init__(*args, predict_noise=predict_noise, sampling_steps=sampling_steps, **kwargs)

    def _make_train_step(self):
        actor, critic = self.actor, self.critic
        sample_fn = self._sample_fn
        discount, eta = self.discount, self.eta
        interval = self.ema_update_interval

        def train_step(actor_state, critic_state: CriticState, batch):
            obs, next_obs = batch["obs"]["state"], batch["next_obs"]["state"]
            act, rew, tml = batch["act"], batch["rew"], batch["tml"]
            b = obs.shape[0]
            prior = jnp.zeros((b, actor.nn_diffusion.act_dim))

            rng, k_next, k_bc, k_t, k_eps, k_coin = jax.random.split(actor_state.rng, 6)

            # ---- critic TD update (optional antmaze max-Q backup) ----
            target_q = self._td_target(
                actor_state.ema_params, critic_state.target_params,
                next_obs, rew, tml, k_next,
            )

            def critic_loss_fn(params):
                q1, q2 = critic.apply(params, obs, act)
                return ((q1 - target_q) ** 2).mean() + ((q2 - target_q) ** 2).mean()

            critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(critic_state.params)
            c_updates, c_opt_state = self.critic_tx.update(
                c_grads, critic_state.opt_state, critic_state.params
            )
            c_params = optax.apply_updates(critic_state.params, c_updates)

            # ---- policy: BC + one-step action approximation Q loss ----
            coin = jax.random.uniform(k_coin) > 0.5
            t = jax.random.randint(k_t, (b,), 0, actor.diffusion_steps)
            eps = jax.random.normal(k_eps, act.shape)
            alpha = at_least_ndim(actor.alpha[t], act.ndim)
            sigma = at_least_ndim(actor.sigma[t], act.ndim)
            noisy_act = alpha * act + sigma * eps

            def actor_loss_fn(params):
                bc_loss = actor.loss_fn(params, k_bc, act, obs)
                emb = actor.apply_condition(params, obs, train=False)
                pred_act = actor.apply_diffusion(params, noisy_act, t, emb)
                q1_new, q2_new = critic.apply(jax.lax.stop_gradient(c_params), obs, pred_act)
                q_loss = jnp.where(
                    coin,
                    -q1_new.mean() / jax.lax.stop_gradient(jnp.abs(q2_new).mean()),
                    -q2_new.mean() / jax.lax.stop_gradient(jnp.abs(q1_new).mean()),
                )
                return bc_loss + eta * q_loss, (bc_loss, q_loss)

            (actor_loss, (bc_loss, q_loss)), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(actor_state.params)
            a_updates, a_opt_state = actor.tx.update(
                a_grads, actor_state.opt_state, actor_state.params
            )
            a_params = optax.apply_updates(actor_state.params, a_updates)

            step = actor_state.step
            do_ema = (step % interval == 0) & (step >= 1000)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: jnp.where(do_ema, e * actor.ema_rate + p * (1 - actor.ema_rate), e),
                actor_state.ema_params, a_params,
            )
            do_polyak = step % interval == 0
            target_params = jax.tree_util.tree_map(
                lambda tp, p: jnp.where(do_polyak, 0.995 * p + 0.005 * tp, tp),
                critic_state.target_params, c_params,
            )

            new_actor_state = actor_state.replace(
                params=a_params, ema_params=ema_params, opt_state=a_opt_state,
                step=step + 1, rng=rng,
            )
            new_critic_state = CriticState(
                params=c_params, target_params=target_params,
                opt_state=c_opt_state, step=critic_state.step + 1,
            )
            return new_actor_state, new_critic_state, {
                "bc_loss": bc_loss, "q_loss": q_loss,
                "critic_loss": critic_loss, "target_q_mean": target_q.mean(),
            }

        return train_step
