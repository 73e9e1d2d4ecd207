"""IDQL pipeline (TPU-native).

Re-design of reference pipelines/idql_d4rl_mujoco.py:20-200: a pure-BC
IDQLMlp diffusion actor plus an IQL expectile critic; action selection at
eval reweights sampled candidates by softmax(advantage * temperature).

TPU-native: IQL (V expectile + Q TD + Polyak, gated to every 2nd step as in
the reference) and the BC actor update fuse into ONE jitted train step; the
candidate-resampling eval policy is one jitted program.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import DiscreteDiffusionSDE
from ..nn_condition import IdentityCondition
from ..nn_diffusion import IDQLMlp
from ..utils.blocks import TwinQ, V

__all__ = ["IDQLPipeline"]


@flax.struct.dataclass
class IQLCriticState:
    q_params: Any
    q_target_params: Any
    v_params: Any
    q_opt_state: Any
    v_opt_state: Any
    step: jnp.ndarray


class IDQLPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        diffusion_steps: int = 5,
        sampling_steps: int = 5,
        solver: str = "ddpm",
        emb_dim: int = 64,
        actor_hidden_dim: int = 256,
        actor_n_blocks: int = 3,
        actor_dropout: float = 0.1,
        critic_hidden_dim: int = 256,
        actor_lr: float = 3e-4,
        critic_lr: float = 3e-4,
        gradient_steps: int = 1_000_000,
        discount: float = 0.99,
        iql_tau: float = 0.7,
        ema_rate: float = 0.995,
        predict_noise: bool = True,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.discount, self.iql_tau = discount, iql_tau
        self.sampling_steps, self.solver = sampling_steps, solver

        self.actor = DiscreteDiffusionSDE(
            IDQLMlp(
                obs_dim=obs_dim, act_dim=act_dim, emb_dim=emb_dim,
                hidden_dim=actor_hidden_dim, n_blocks=actor_n_blocks,
                dropout=actor_dropout,
            ),
            IdentityCondition(dropout=0.0),
            predict_noise=predict_noise,
            optim_params={
                "lr": optax.cosine_decay_schedule(actor_lr, gradient_steps),
                "weight_decay": 0.0,
            },
            x_max=np.ones((act_dim,)),
            x_min=-np.ones((act_dim,)),
            diffusion_steps=diffusion_steps,
            ema_rate=ema_rate,
            rng=rng,
        )
        self.q_net = TwinQ(hidden_dim=critic_hidden_dim)
        self.v_net = V(hidden_dim=critic_hidden_dim)
        self.q_tx = optax.adam(optax.cosine_decay_schedule(critic_lr, gradient_steps))
        self.v_tx = optax.adam(optax.cosine_decay_schedule(critic_lr, gradient_steps))

        key = jax.random.PRNGKey(rng + 1)
        kq, kv, self._rng = jax.random.split(key, 3)
        obs_ex, act_ex = jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim))
        def _build_critic(kq, kv):
            q_params = self.q_net.init(kq, obs_ex, act_ex)
            v_params = self.v_net.init(kv, obs_ex)
            return IQLCriticState(
                q_params=q_params,
                q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
                v_params=v_params,
                q_opt_state=self.q_tx.init(q_params),
                v_opt_state=self.v_tx.init(v_params),
                step=jnp.zeros((), jnp.int32),
            )

        self.critic_state = jax.jit(_build_critic)(kq, kv)
        self.actor.init(act_ex, obs_ex)

        self._sample_fn = self.actor.build_sample_fn(
            solver=solver, sample_steps=sampling_steps, cfg_mode="cond", final_logp=False
        )
        self._train_step = jax.jit(self._make_train_step(), donate_argnums=(0, 1))
        self._act_fn_cache = {}

    # ------------------------------------------------------------------
    def _make_train_step(self):
        actor = self.actor
        q_net, v_net = self.q_net, self.v_net

        def train_step(actor_state, critic_state: IQLCriticState, batch):
            obs, next_obs = batch["obs"]["state"], batch["next_obs"]["state"]
            act, rew, tml = batch["act"], batch["rew"], batch["tml"]
            rng, k_bc = jax.random.split(actor_state.rng)

            do_iql = critic_state.step % 2 == 0

            # -- V expectile update
            q_t = q_net.apply(critic_state.q_target_params, obs, act)

            def v_loss_fn(v_params):
                v = v_net.apply(v_params, obs)
                diff = q_t - v
                w = jnp.abs(self.iql_tau - (diff < 0).astype(jnp.float32))
                return (w * diff**2).mean()

            v_loss, v_grads = jax.value_and_grad(v_loss_fn)(critic_state.v_params)
            v_updates, v_opt_state = self.v_tx.update(
                v_grads, critic_state.v_opt_state, critic_state.v_params
            )
            v_params = optax.apply_updates(critic_state.v_params, v_updates)
            # gate by do_iql
            v_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_iql, new, old), v_params, critic_state.v_params
            )
            v_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_iql, new, old),
                v_opt_state, critic_state.v_opt_state,
            )

            # -- Q TD update
            td_target = jax.lax.stop_gradient(
                rew + self.discount * (1 - tml) * v_net.apply(v_params, next_obs)
            )

            def q_loss_fn(q_params):
                q1, q2 = q_net.apply(q_params, obs, act, method=TwinQ.both)
                return ((q1 - td_target) ** 2 + (q2 - td_target) ** 2).mean()

            q_loss, q_grads = jax.value_and_grad(q_loss_fn)(critic_state.q_params)
            q_updates, q_opt_state = self.q_tx.update(
                q_grads, critic_state.q_opt_state, critic_state.q_params
            )
            q_params = optax.apply_updates(critic_state.q_params, q_updates)
            q_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_iql, new, old), q_params, critic_state.q_params
            )
            q_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_iql, new, old),
                q_opt_state, critic_state.q_opt_state,
            )
            q_target_params = jax.tree_util.tree_map(
                lambda t, p: jnp.where(do_iql, 0.995 * p + 0.005 * t, t),
                critic_state.q_target_params, q_params,
            )

            # -- BC actor update (fused loss+grad+opt+EMA)
            def bc_loss_fn(params):
                return actor.loss_fn(params, k_bc, act, obs)

            bc_loss, a_grads = jax.value_and_grad(bc_loss_fn)(actor_state.params)
            a_updates, a_opt_state = actor.tx.update(
                a_grads, actor_state.opt_state, actor_state.params
            )
            a_params = optax.apply_updates(actor_state.params, a_updates)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * actor.ema_rate + p * (1 - actor.ema_rate),
                actor_state.ema_params, a_params,
            )

            new_actor_state = actor_state.replace(
                params=a_params, ema_params=ema_params, opt_state=a_opt_state,
                step=actor_state.step + 1, rng=rng,
            )
            new_critic_state = IQLCriticState(
                q_params=q_params, q_target_params=q_target_params, v_params=v_params,
                q_opt_state=q_opt_state, v_opt_state=v_opt_state,
                step=critic_state.step + 1,
            )
            return new_actor_state, new_critic_state, {
                "bc_loss": bc_loss, "q_loss": q_loss, "v_loss": v_loss,
            }

        return train_step

    def train_step(self, batch):
        self.actor.state, self.critic_state, log = self._train_step(
            self.actor.state, self.critic_state, batch
        )
        return log

    # ------------------------------------------------------------------
    def _make_act_fn(self, num_envs: int, num_candidates: int, weight_temperature: float,
                     temperature: float):
        actor, q_net, v_net = self.actor, self.q_net, self.v_net
        sample_fn = self._sample_fn
        E, K = num_envs, num_candidates

        def act_fn(actor_params, critic_state: IQLCriticState, rng, obs):
            k_sample, k_choice = jax.random.split(rng)
            obs_rep = jnp.repeat(obs[:, None, :], K, axis=1).reshape(E * K, -1)
            prior = jnp.zeros((E * K, self.act_dim))
            act, _ = sample_fn(
                actor_params, None, k_sample, prior,
                condition_cfg=obs_rep, w_cfg=1.0, temperature=temperature,
            )
            q = q_net.apply(critic_state.q_target_params, obs_rep, act)
            v = v_net.apply(critic_state.v_params, obs_rep)
            adv = (q - v).reshape(E, K)
            idx = jax.random.categorical(k_choice, adv * weight_temperature, axis=-1)
            act = act.reshape(E, K, -1)
            return jnp.take_along_axis(act, idx[:, None, None], axis=1)[:, 0]

        return jax.jit(act_fn)

    def act(self, obs_normed, num_candidates: int = 256, weight_temperature: float = 10.0,
            temperature: float = 1.0, use_ema: bool = True,
            rng: Optional[jax.Array] = None):
        E = obs_normed.shape[0]
        key = (E, num_candidates, weight_temperature, temperature)
        if key not in self._act_fn_cache:
            self._act_fn_cache[key] = self._make_act_fn(
                E, num_candidates, weight_temperature, temperature
            )
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        params = self.actor.state.ema_params if use_ema else self.actor.state.params
        return self._act_fn_cache[key](params, self.critic_state, rng, jnp.asarray(obs_normed))

    # ------------------------------------------------------------------
    def save(self, path: str):
        import pickle
        from pathlib import Path

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "actor": jax.tree_util.tree_map(np.asarray, self.actor.state),
                    "critic": jax.tree_util.tree_map(np.asarray, self.critic_state),
                },
                f,
            )

    def load(self, path: str):
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.actor.state = jax.tree_util.tree_map(jnp.asarray, state["actor"])
        self.critic_state = jax.tree_util.tree_map(jnp.asarray, state["critic"])
