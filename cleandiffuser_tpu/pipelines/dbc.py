"""DiffusionBC (Pearce et al.) pipeline (TPU-native).

Re-design of reference pipelines/dbc_pusht.py:50-187: single-action
diffusion BC with PearceMlp or PearceTransformer backbone conditioned on a
To-frame observation window through PearceObsCondition; DDPM/DDIM/EDM
engine switch and optional diffusion-x sampling (dbc_pusht.py:101-106).
The `dit` mode (dbc_pusht.py:166-171, 94-100) diffuses an action *chunk*
(B, action_steps, act_dim) with a DiT1d backbone conditioned on the
flattened observation window through an MLPCondition.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousEDM, DiscreteDiffusionSDE
from ..nn_condition import MLPCondition, PearceObsCondition
from ..nn_diffusion import DiT1d, PearceMlp, PearceTransformer

__all__ = ["DBCPipeline"]


class DBCPipeline:
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        obs_steps: int = 2,
        action_steps: int = 1,  # dit mode diffuses an action chunk
        nn: str = "pearce_mlp",  # pearce_mlp | pearce_transformer | dit
        diffusion: str = "ddpm",  # ddpm | ddim | edm
        emb_dim: int = 128,
        sample_steps: int = 50,
        diffusion_x_sampling_steps: int = 0,
        lr: float = 1e-4,
        gradient_steps: int = 1_000_000,
        ema_rate: float = 0.9999,
        rng: int = 0,
    ):
        self.obs_dim, self.action_dim, self.To = obs_dim, action_dim, obs_steps
        self.Ta = action_steps
        self.diffusion_kind = diffusion
        self.sample_steps = sample_steps
        self.x_steps = diffusion_x_sampling_steps
        self.chunked = nn == "dit"  # chunk diffusion: x is (B, Ta, act_dim)

        if nn == "pearce_mlp":
            nn_diffusion = PearceMlp(act_dim=action_dim, To=obs_steps, emb_dim=emb_dim)
            nn_condition = PearceObsCondition(obs_dim=obs_dim, emb_dim=emb_dim,
                                              flatten=False, dropout=0.0)
        elif nn == "pearce_transformer":
            nn_diffusion = PearceTransformer(act_dim=action_dim, To=obs_steps, emb_dim=emb_dim)
            nn_condition = PearceObsCondition(obs_dim=obs_dim, emb_dim=emb_dim,
                                              flatten=False, dropout=0.0)
        elif nn == "dit":
            # reference dbc_pusht.py:166-171: DiT over the action chunk,
            # MLP condition over the flattened To-frame obs window
            nn_diffusion = DiT1d(in_dim=action_dim, emb_dim=256, d_model=384,
                                 n_heads=12, depth=6, timestep_emb_type="fourier")
            nn_condition = MLPCondition(in_dim=obs_steps * obs_dim, out_dim=256,
                                        hidden_dims=(256,), act=fnn.relu,
                                        dropout=0.25)
        else:
            raise ValueError(f"Invalid nn type {nn}")

        optim_params = {
            "lr": optax.cosine_decay_schedule(lr, gradient_steps),
            "weight_decay": 0.0,
        }
        x_shape = (action_steps, action_dim) if self.chunked else (action_dim,)
        if diffusion in ("ddpm", "ddim"):
            self.agent = DiscreteDiffusionSDE(
                nn_diffusion, nn_condition,
                diffusion_steps=sample_steps,
                x_max=np.ones(x_shape),
                x_min=-np.ones(x_shape),
                ema_rate=ema_rate, optim_params=optim_params, rng=rng,
            )
        elif diffusion == "edm":
            self.agent = ContinuousEDM(
                nn_diffusion, nn_condition, ema_rate=ema_rate,
                optim_params=optim_params, rng=rng,
            )
        else:
            raise NotImplementedError(diffusion)

        cond_shape = (1, obs_steps * obs_dim) if self.chunked else (1, obs_steps, obs_dim)
        self.agent.init(jnp.zeros((1,) + x_shape), jnp.zeros(cond_shape))
        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 1)

    # ------------------------------------------------------------------
    def train_step(self, batch):
        """batch: action chunk windows; BC on the last action of the obs
        window (reference dbc uses (b, To, obs) -> single action; the dit
        mode diffuses the Ta-chunk starting at the window end)."""
        nobs = batch["obs"]["state"][:, : self.To]
        if self.chunked:
            naction = batch["action"][:, self.To - 1 : self.To - 1 + self.Ta]
            return self.agent.update(naction, nobs.reshape(nobs.shape[0], -1))
        naction = batch["action"][:, self.To - 1]
        return self.agent.update(naction, nobs)

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused trainer (mirrors DPPipeline.make_train_scan): `n_steps` x
        (device batch gather + grad/opt/EMA) in ONE `lax.scan` program —
        per-step dispatch (~3ms over a tunneled chip) disappears."""
        gather = dataset.gather_fn(batch_size)
        raw = self.agent._make_update_fn(update_ema=True, has_wrt=False)
        raw = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw

        def fused(state, rng):
            def body(state, k):
                batch = gather(k)
                nobs = batch["obs"]["state"][:, : self.To]
                if self.chunked:
                    x = batch["action"][:, self.To - 1 : self.To - 1 + self.Ta]
                    cond = nobs.reshape(nobs.shape[0], -1)
                else:
                    x = batch["action"][:, self.To - 1]
                    cond = nobs
                state, log = raw(state, x, cond, None)
                return state, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.agent.state, log = fused_jit(self.agent.state, rng)
            return log

        return run

    def evaluate_on_device(
        self,
        env,
        normalizer,
        num_envs: int = 8,
        max_episode_steps: int = 300,
        rng: Optional[jax.Array] = None,
    ):
        """Fully on-device per-step eval on a pure-JAX env (PushTEnvJax /
        PushTKeypointEnvJax): every env step normalizes the To-frame obs
        window, denoises one action and steps the sim inside ONE jitted
        scan. Returns (mean best-coverage reward, mean success)."""
        obs_consts = normalizer["obs"]["state"].as_device_constants()
        act_consts = normalizer["action"].as_device_constants()
        key = ("eval", num_envs, max_episode_steps)
        if key not in self._fn_cache:
            solver = "ddim" if self.diffusion_kind == "ddim" else (
                "euler" if self.diffusion_kind == "edm" else "ddpm"
            )
            sample_fn = self.agent.build_sample_fn(
                solver=solver, sample_steps=self.sample_steps, cfg_mode="cond",
                diffusion_x_sampling_steps=self.x_steps, final_logp=False,
            )
            To = self.To

            def normalize_obs(o):
                return (o - obs_consts["min"]) / obs_consts["range"] * 2.0 - 1.0

            def unnormalize_act(a):
                return (a + 1.0) / 2.0 * act_consts["range"] + act_consts["min"]

            def rollout(params, r):
                r, k_reset = jax.random.split(r)
                state, obs = env.reset(k_reset, num_envs)
                obs_win = jnp.repeat(obs[:, None], To, axis=1)

                def env_step(carry, _):
                    state, obs_win, r = carry
                    r, k_s = jax.random.split(r)
                    nobs = normalize_obs(obs_win)
                    if self.chunked:
                        prior = jnp.zeros((num_envs, self.Ta, self.action_dim))
                        na, _ = sample_fn(params, None, k_s, prior,
                                          condition_cfg=nobs.reshape(num_envs, -1),
                                          w_cfg=1.0)
                        na = na[:, 0]
                    else:
                        prior = jnp.zeros((num_envs, self.action_dim))
                        na, _ = sample_fn(params, None, k_s, prior,
                                          condition_cfg=nobs, w_cfg=1.0)
                    state, obs, rew, done = env.step(state, unnormalize_act(na))
                    obs_win = jnp.concatenate(
                        [obs_win[:, 1:], obs[:, None]], axis=1)
                    return (state, obs_win, r), rew

                _, rews = jax.lax.scan(
                    env_step, (state, obs_win, r), None,
                    length=max_episode_steps)
                return rews.max(0)

            self._fn_cache[key] = jax.jit(rollout)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        best = self._fn_cache[key](self.agent.state.ema_params, rng)
        return float(best.mean()), float((best >= 1.0).mean())

    def act(self, nobs, rng: Optional[jax.Array] = None):
        """nobs: (B, To, obs_dim) -> (B, act_dim), normalized action."""
        B = nobs.shape[0]
        if B not in self._fn_cache:
            solver = "ddim" if self.diffusion_kind == "ddim" else (
                "euler" if self.diffusion_kind == "edm" else "ddpm"
            )
            sample_fn = self.agent.build_sample_fn(
                solver=solver, sample_steps=self.sample_steps, cfg_mode="cond",
                diffusion_x_sampling_steps=self.x_steps, final_logp=False,
            )

            def act_fn(params, r, nobs):
                if self.chunked:
                    prior = jnp.zeros((B, self.Ta, self.action_dim))
                    cond = nobs.reshape(B, -1)
                    a, _ = sample_fn(params, None, r, prior, condition_cfg=cond, w_cfg=1.0)
                    return a[:, 0]  # CLIs execute one action per control step
                prior = jnp.zeros((B, self.action_dim))
                a, _ = sample_fn(params, None, r, prior, condition_cfg=nobs, w_cfg=1.0)
                return a

            self._fn_cache[B] = jax.jit(act_fn)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        return self._fn_cache[B](self.agent.state.ema_params, rng, jnp.asarray(nobs))

    def save(self, path: str):
        self.agent.save(path)

    def load(self, path: str):
        self.agent.load(path)
