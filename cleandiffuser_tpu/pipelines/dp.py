"""Diffusion Policy pipeline (TPU-native).

Re-design of reference pipelines/dp_pusht.py:40-260 (and dp_kitchen /
dp_robomimic variants): action-chunk diffusion with obs (state or image)
as global condition, backbone in {DiT1d, ChiUNet1d, ChiTransformer}, legacy
DDPM or EDM engine, receding-horizon execution
`action_pred[:, To-1 : To-1+Ta]`.

TPU-native: `evaluate_on_device` runs the WHOLE receding-horizon eval —
obs-window normalization, action-chunk sampling scan, and Ta env substeps
on the pure-JAX PushT env — as ONE jitted scan program: policy sampling and
env stepping never leave the device (BASELINE.json north star; the
reference round-trips through subprocess SyncVectorEnv per chunk,
dp_pusht.py:105-113).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousEDM, DiscreteDiffusionSDE
from ..nn_condition import IdentityCondition, MLPCondition
from ..nn_diffusion import ChiTransformer, ChiUNet1d, DiT1d

__all__ = ["DPPipeline"]


class DPPipeline:
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        horizon: int = 16,
        obs_steps: int = 2,
        action_steps: int = 8,
        nn: str = "chi_unet",  # dit | chi_unet | chi_transformer
        diffusion: str = "ddpm",  # ddpm | edm
        sample_steps: int = 5,
        lr: float = 1e-4,
        gradient_steps: int = 1_000_000,
        ema_rate: float = 0.9999,
        rng: int = 0,
    ):
        self.obs_dim, self.action_dim = obs_dim, action_dim
        self.horizon, self.To, self.Ta = horizon, obs_steps, action_steps
        self.nn_kind, self.diffusion_kind = nn, diffusion
        self.sample_steps = sample_steps

        if nn == "dit":
            nn_diffusion = DiT1d(
                in_dim=action_dim, emb_dim=128, d_model=320, n_heads=10, depth=2,
                timestep_emb_type="fourier",
            )
            import flax.linen as fnn

            nn_condition = MLPCondition(
                in_dim=obs_steps * obs_dim, out_dim=128, hidden_dims=(256,),
                act=fnn.relu, dropout=0.0,
            )
            self._flatten_cond = True
        elif nn == "chi_unet":
            nn_diffusion = ChiUNet1d(
                act_dim=action_dim, obs_dim=obs_dim, To=obs_steps,
                model_dim=256, emb_dim=256, dim_mult=(1, 2, 2),
                obs_as_global_cond=True, timestep_emb_type="positional",
            )
            nn_condition = IdentityCondition(dropout=0.0)
            self._flatten_cond = False
        elif nn == "chi_transformer":
            nn_diffusion = ChiTransformer(
                act_dim=action_dim, obs_dim=obs_dim, Ta=horizon, To=obs_steps,
                d_model=256, nhead=4, num_layers=4, timestep_emb_type="positional",
            )
            nn_condition = IdentityCondition(dropout=0.0)
            self._flatten_cond = False
        else:
            raise ValueError(f"Invalid nn type {nn}")

        optim_params = {
            "lr": optax.cosine_decay_schedule(lr, gradient_steps),
            "weight_decay": 0.0,
        }
        if diffusion == "ddpm":
            self.agent = DiscreteDiffusionSDE(
                nn_diffusion, nn_condition,
                diffusion_steps=sample_steps,
                x_max=np.ones((horizon, action_dim)),
                x_min=-np.ones((horizon, action_dim)),
                ema_rate=ema_rate, optim_params=optim_params, rng=rng,
            )
        elif diffusion == "edm":
            self.agent = ContinuousEDM(
                nn_diffusion, nn_condition, ema_rate=ema_rate,
                optim_params=optim_params, rng=rng,
            )
        else:
            raise NotImplementedError(diffusion)

        cond_ex = (
            jnp.zeros((1, obs_steps * obs_dim))
            if self._flatten_cond
            else jnp.zeros((1, obs_steps, obs_dim))
        )
        self.agent.init(jnp.zeros((1, horizon, action_dim)), cond_ex)
        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 1)

    # ------------------------------------------------------------------
    def _condition_of(self, nobs):
        """nobs: (B, To, obs_dim) -> condition for the chosen backbone."""
        cond = nobs[:, : self.To, :]
        if self._flatten_cond:
            cond = cond.reshape(cond.shape[0], -1)
        return cond

    def train_step(self, batch):
        nobs = batch["obs"]["state"]
        naction = batch["action"]
        return self.agent.update(naction, self._condition_of(nobs))

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused trainer: `n_steps` x (device batch gather + grad/opt/EMA
        update) compiled into ONE `lax.scan` program. Per-step Python
        dispatch disappears entirely — on a tunneled chip the per-dispatch
        cost (~3ms) otherwise dominates the ~1ms compute of this model.

        Returns `run(rng) -> log` which advances the engine state by
        `n_steps` and yields window-mean device scalars.
        """
        gather = dataset.gather_fn(batch_size)
        raw = self.agent._make_update_fn(update_ema=True, has_wrt=False)
        raw = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw

        def fused(state, rng):
            def body(state, k):
                batch = gather(k)
                cond = self._condition_of(batch["obs"]["state"])
                state, log = raw(state, batch["action"], cond, None)
                return state, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda x: x.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.agent.state, log = fused_jit(self.agent.state, rng)
            return log

        return run

    # ------------------------------------------------------------------
    def _build_sample(self):
        if self.diffusion_kind == "ddpm":
            return self.agent.build_sample_fn(
                solver="ddpm", sample_steps=self.sample_steps,
                cfg_mode="cond", final_logp=False,
            )
        return self.agent.build_sample_fn(
            solver="euler", sample_steps=self.sample_steps,
            cfg_mode="cond", final_logp=False,
        )

    def act_chunk(self, nobs, rng: Optional[jax.Array] = None):
        """Sample an action chunk; returns NORMALIZED actions
        (B, Ta, act_dim) = prediction[:, To-1 : To-1+Ta]."""
        B = nobs.shape[0]
        key = ("chunk", B)
        if key not in self._fn_cache:
            sample_fn = self._build_sample()

            def chunk(params, r, nobs):
                cond = self._condition_of(nobs)
                prior = jnp.zeros((B, self.horizon, self.action_dim))
                naction, _ = sample_fn(params, None, r, prior, condition_cfg=cond, w_cfg=1.0)
                start = self.To - 1
                return naction[:, start : start + self.Ta]

            self._fn_cache[key] = jax.jit(chunk)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        return self._fn_cache[key](self.agent.state.ema_params, rng, jnp.asarray(nobs))

    # ------------------------------------------------------------------
    def evaluate_on_device(
        self,
        env,
        normalizer,
        num_envs: int = 8,
        max_episode_steps: int = 300,
        rng: Optional[jax.Array] = None,
    ):
        """Fully on-device receding-horizon evaluation on a pure-JAX env
        (e.g. PushTEnvJax). Returns (mean_reward, mean_success)."""
        obs_consts = normalizer["obs"]["state"].as_device_constants()
        act_consts = normalizer["action"].as_device_constants()
        key = ("eval", num_envs, max_episode_steps)
        if key not in self._fn_cache:
            sample_fn = self._build_sample()
            n_chunks = max_episode_steps // self.Ta
            To, Ta = self.To, self.Ta

            def normalize_obs(o):
                return (o - obs_consts["min"]) / obs_consts["range"] * 2.0 - 1.0

            def unnormalize_act(a):
                return (a + 1.0) / 2.0 * act_consts["range"] + act_consts["min"]

            def rollout(params, r):
                r, k_reset = jax.random.split(r)
                state, obs = env.reset(k_reset, num_envs)
                obs_window = jnp.repeat(obs[:, None, :], To, axis=1)

                def control_step(carry, _):
                    state, obs_window, r = carry
                    r, k_s = jax.random.split(r)
                    nobs = normalize_obs(obs_window)
                    cond = self._condition_of(nobs)
                    prior = jnp.zeros((num_envs, self.horizon, self.action_dim))
                    naction, _ = sample_fn(params, None, k_s, prior,
                                           condition_cfg=cond, w_cfg=1.0)
                    chunk = unnormalize_act(naction[:, To - 1 : To - 1 + Ta])

                    def env_step(c, a):
                        state, obs_window = c
                        state, obs, rew, done = env.step(state, a)
                        obs_window = jnp.concatenate(
                            [obs_window[:, 1:], obs[:, None]], axis=1
                        )
                        return (state, obs_window), rew

                    (state, obs_window), rews = jax.lax.scan(
                        env_step, (state, obs_window), jnp.swapaxes(chunk, 0, 1)
                    )
                    return (state, obs_window, r), rews

                (_, _, _), all_rews = jax.lax.scan(
                    control_step, (state, obs_window, r), None, length=n_chunks
                )
                rews = all_rews.reshape(-1, num_envs)  # (T, E)
                return rews.sum(0), rews.max(0)

            self._fn_cache[key] = jax.jit(rollout)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        ep_rew, success = self._fn_cache[key](self.agent.state.ema_params, rng)
        return float(ep_rew.mean()), float(success.mean())

    # ------------------------------------------------------------------
    def save(self, path: str):
        self.agent.save(path)

    def load(self, path: str):
        self.agent.load(path)
