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
                x_max=jnp.ones(x_shape),
                x_min=-jnp.ones(x_shape),
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
