"""SynthER pipeline (TPU-native).

Re-design of reference pipelines/synther_d4rl_mujoco.py:23-260: an
unconditional diffusion model over flat transition tuples
[obs, act, rew, next_obs, tml] used to synthesize extra transitions
("mode=transition_generation"), and a TD3+BC agent trained on the mixed
real + synthetic buffer.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import DiscreteDiffusionSDE
from ..nn_diffusion import IDQLMlp

__all__ = ["SynthERPipeline", "TD3BC"]


class _TD3Actor(nn.Module):
    act_dim: int

    @nn.compact
    def __call__(self, obs):
        h = nn.silu(nn.Dense(256)(obs))
        h = nn.silu(nn.Dense(256)(h))
        return jnp.tanh(nn.Dense(self.act_dim)(h))


class _TD3Critic(nn.Module):
    def setup(self):
        self.q1_l = [nn.Dense(256), nn.LayerNorm(), nn.Dense(256), nn.Dense(1)]
        self.q2_l = [nn.Dense(256), nn.LayerNorm(), nn.Dense(256), nn.Dense(1)]

    def _q(self, layers, x):
        h = jnp.tanh(layers[1](layers[0](x)))
        h = nn.silu(layers[2](h))
        return layers[3](h)

    def both(self, obs, act):
        x = jnp.concatenate([obs, act], -1)
        return self._q(self.q1_l, x), self._q(self.q2_l, x)

    def __call__(self, obs, act):
        q1, q2 = self.both(obs, act)
        return jnp.minimum(q1, q2)


@flax.struct.dataclass
class TD3BCState:
    actor_params: Any
    actor_target_params: Any
    critic_params: Any
    critic_target_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


class TD3BC:
    """TD3+BC (inline impl in reference synther:100-200), fused per-step."""

    def __init__(self, obs_dim: int, act_dim: int, policy_noise: float = 0.2,
                 noise_clip: float = 0.5, policy_freq: int = 2, alpha: float = 2.5,
                 gradient_steps: int = 1_000_000, discount: float = 0.99, rng: int = 0):
        self.actor = _TD3Actor(act_dim=act_dim)
        self.critic = _TD3Critic()
        self.policy_noise, self.noise_clip = policy_noise, noise_clip
        self.policy_freq, self.alpha = policy_freq, alpha
        self.discount = discount
        self.actor_tx = optax.adam(optax.cosine_decay_schedule(3e-4, gradient_steps))
        self.critic_tx = optax.adam(optax.cosine_decay_schedule(3e-4, gradient_steps))

        key = jax.random.PRNGKey(rng)
        ka, kc, krun = jax.random.split(key, 3)
        obs_ex, act_ex = jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim))
        def _build(ka, kc, krun):
            actor_params = self.actor.init(ka, obs_ex)
            critic_params = self.critic.init(kc, obs_ex, act_ex)
            return TD3BCState(
                actor_params=actor_params,
                actor_target_params=jax.tree_util.tree_map(jnp.copy, actor_params),
                critic_params=critic_params,
                critic_target_params=jax.tree_util.tree_map(jnp.copy, critic_params),
                actor_opt_state=self.actor_tx.init(actor_params),
                critic_opt_state=self.critic_tx.init(critic_params),
                step=jnp.zeros((), jnp.int32),
                rng=krun,
            )

        self.state = jax.jit(_build)(ka, kc, krun)
        self._jit_update = jax.jit(self._make_update(), donate_argnums=0)
        self._jit_act = jax.jit(lambda p, o: self.actor.apply(p, o))

    def _make_update(self):
        def update(state: TD3BCState, batch):
            obs, act = batch["obs"]["state"], batch["act"]
            next_obs, rew, tml = batch["next_obs"]["state"], batch["rew"], batch["tml"]
            rng, k_noise = jax.random.split(state.rng)

            noise = jnp.clip(
                jax.random.normal(k_noise, act.shape) * self.policy_noise,
                -self.noise_clip, self.noise_clip,
            )
            next_act = jnp.clip(
                self.actor.apply(state.actor_target_params, next_obs) + noise, -1.0, 1.0
            )
            target_q = jax.lax.stop_gradient(
                rew + (1.0 - tml) * self.discount
                * self.critic.apply(state.critic_target_params, next_obs, next_act)
            )

            def critic_loss_fn(p):
                q1, q2 = self.critic.apply(p, obs, act, method=_TD3Critic.both)
                return ((q1 - target_q) ** 2).mean() + ((q2 - target_q) ** 2).mean()

            critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic_params)
            c_up, c_opt = self.critic_tx.update(c_grads, state.critic_opt_state, state.critic_params)
            c_params = optax.apply_updates(state.critic_params, c_up)

            update_actor = state.step % self.policy_freq == 0

            def actor_loss_fn(p):
                pred_act = self.actor.apply(p, obs)
                q = self.critic.apply(jax.lax.stop_gradient(c_params), obs, pred_act)
                lmbda = self.alpha / jax.lax.stop_gradient(jnp.abs(q).mean())
                policy_loss = -lmbda * q.mean()
                bc_loss = ((pred_act - act) ** 2).mean()
                return policy_loss + bc_loss, (policy_loss, bc_loss, q.mean())

            (_, (policy_loss, bc_loss, policy_q)), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(state.actor_params)
            a_up, a_opt = self.actor_tx.update(a_grads, state.actor_opt_state, state.actor_params)
            a_params_new = optax.apply_updates(state.actor_params, a_up)
            # actor updated only every policy_freq steps
            a_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_actor, new, old),
                a_params_new, state.actor_params,
            )
            a_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_actor, new, old),
                a_opt, state.actor_opt_state,
            )
            actor_target = jax.tree_util.tree_map(
                lambda t, p: jnp.where(update_actor, t * 0.995 + p * 0.005, t),
                state.actor_target_params, a_params,
            )
            critic_target = jax.tree_util.tree_map(
                lambda t, p: jnp.where(update_actor, t * 0.995 + p * 0.005, t),
                state.critic_target_params, c_params,
            )

            new_state = state.replace(
                actor_params=a_params, actor_target_params=actor_target,
                critic_params=c_params, critic_target_params=critic_target,
                actor_opt_state=a_opt, critic_opt_state=c_opt,
                step=state.step + 1, rng=rng,
            )
            log = {
                "critic_loss": critic_loss, "policy_loss": policy_loss,
                "bc_loss": bc_loss, "policy_q": policy_q,
                "mean_target_q": target_q.mean(),
            }
            return new_state, log

        return update

    def update(self, batch):
        self.state, log = self._jit_update(self.state, batch)
        # device scalars: see DiffusionModel.update (no per-step host sync)
        return log

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused TD3BC trainer: `n_steps` x (device gather + actor/critic/
        target update) in ONE `lax.scan` (see runner.make_rl_train_scan)."""
        gather = dataset.gather_fn(batch_size)
        raw = getattr(self._jit_update, "__wrapped__", self._jit_update)

        def fused(state, rng):
            def body(st, k):
                st, log = raw(st, gather(k))
                return st, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.state, log = fused_jit(self.state, rng)
            return log

        return run

    def act(self, obs):
        return self._jit_act(self.state.actor_params, jnp.asarray(obs))


class SynthERPipeline:
    """Unconditional transition-tuple diffusion + synthetic generation."""

    def __init__(self, obs_dim: int, act_dim: int, diffusion_steps: int = 128,
                 emb_dim: int = 128, hidden_dim: int = 1024, n_blocks: int = 6,
                 lr: float = 3e-4, gradient_steps: int = 100_000,
                 ema_rate: float = 0.999, rng: int = 0):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.x_dim = obs_dim * 2 + act_dim + 2
        # reference uses IDQLMlp(0, x_dim) as the unconditional tuple net
        # (synther:120-123)
        self.diffusion = DiscreteDiffusionSDE(
            IDQLMlp(obs_dim=0, act_dim=self.x_dim, emb_dim=emb_dim,
                    hidden_dim=hidden_dim, n_blocks=n_blocks),
            diffusion_steps=diffusion_steps,
            ema_rate=ema_rate,
            optim_params={"lr": optax.cosine_decay_schedule(lr, gradient_steps),
                          "weight_decay": 0.0},
            rng=rng,
        )
        self.diffusion.init(jnp.zeros((1, self.x_dim)))
        self._gen_fns = {}  # keyed by (batch_size, sampling_steps)
        self._rng = jax.random.PRNGKey(rng + 1)

    def train_step(self, batch):
        x = jnp.concatenate(
            [batch["obs"]["state"], batch["act"], batch["rew"],
             batch["next_obs"]["state"], batch["tml"]], axis=-1,
        )
        return self.diffusion.update(x)

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused tuple-diffusion trainer: `n_steps` x (device gather +
        grad/opt/EMA update) in ONE `lax.scan` (see
        runner.make_rl_train_scan)."""
        gather = dataset.gather_fn(batch_size)
        raw = self.diffusion._make_update_fn(update_ema=True, has_wrt=False)
        raw = getattr(raw, "__wrapped__", raw)

        def fused(state, rng):
            def body(st, k):
                b = gather(k)
                x = jnp.concatenate(
                    [b["obs"]["state"], b["act"], b["rew"],
                     b["next_obs"]["state"], b["tml"]], axis=-1)
                st, log = raw(st, x, None, None)
                return st, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.diffusion.state, log = fused_jit(self.diffusion.state, rng)
            return log

        return run

    def generate_transitions(self, n_transitions: int, batch_size: int = 100_000,
                             sampling_steps: int = 128) -> np.ndarray:
        """Synthesize transitions with the EMA model (reference
        mode=transition_generation)."""
        batch_size = min(batch_size, n_transitions)
        gen_fn = self._gen_fns.get((batch_size, sampling_steps))
        if gen_fn is None:
            sample_fn = self.diffusion.build_sample_fn(
                solver="ddpm", sample_steps=sampling_steps, cfg_mode="uncond",
                final_logp=False,
            )

            def gen(params, rng):
                prior = jnp.zeros((batch_size, self.x_dim))
                x, _ = sample_fn(params, None, rng, prior)
                return x

            gen_fn = self._gen_fns[(batch_size, sampling_steps)] = jax.jit(gen)
        out = []
        remaining = n_transitions
        while remaining > 0:
            self._rng, k = jax.random.split(self._rng)
            x = np.asarray(gen_fn(self.diffusion.state.ema_params, k))
            out.append(x[: min(remaining, batch_size)])
            remaining -= batch_size
            print(f"synthesized: step {n_transitions - max(remaining, 0)}"
                  f"/{n_transitions}", flush=True)
        return np.concatenate(out, axis=0)
