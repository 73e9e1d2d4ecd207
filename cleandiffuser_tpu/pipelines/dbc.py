"""DiffusionBC (Pearce et al.) pipeline (TPU-native).

Re-design of reference pipelines/dbc_pusht.py:50-187: single-action
diffusion BC with PearceMlp or PearceTransformer backbone conditioned on a
To-frame observation window through PearceObsCondition; DDPM/DDIM/EDM
engine switch and optional diffusion-x sampling (dbc_pusht.py:101-106).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion import ContinuousEDM, DiscreteDiffusionSDE
from ..nn_condition import PearceObsCondition
from ..nn_diffusion import PearceMlp, PearceTransformer

__all__ = ["DBCPipeline"]


class DBCPipeline:
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        obs_steps: int = 2,
        nn: str = "pearce_mlp",  # pearce_mlp | pearce_transformer
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
        self.diffusion_kind = diffusion
        self.sample_steps = sample_steps
        self.x_steps = diffusion_x_sampling_steps

        if nn == "pearce_mlp":
            nn_diffusion = PearceMlp(act_dim=action_dim, To=obs_steps, emb_dim=emb_dim)
        elif nn == "pearce_transformer":
            nn_diffusion = PearceTransformer(act_dim=action_dim, To=obs_steps, emb_dim=emb_dim)
        else:
            raise ValueError(f"Invalid nn type {nn}")
        nn_condition = PearceObsCondition(obs_dim=obs_dim, emb_dim=emb_dim, flatten=False,
                                          dropout=0.0)

        optim_params = {
            "lr": optax.cosine_decay_schedule(lr, gradient_steps),
            "weight_decay": 0.0,
        }
        if diffusion in ("ddpm", "ddim"):
            self.agent = DiscreteDiffusionSDE(
                nn_diffusion, nn_condition,
                diffusion_steps=sample_steps,
                x_max=jnp.ones((action_dim,)),
                x_min=-jnp.ones((action_dim,)),
                ema_rate=ema_rate, optim_params=optim_params, rng=rng,
            )
        elif diffusion == "edm":
            self.agent = ContinuousEDM(
                nn_diffusion, nn_condition, ema_rate=ema_rate,
                optim_params=optim_params, rng=rng,
            )
        else:
            raise NotImplementedError(diffusion)

        self.agent.init(
            jnp.zeros((1, action_dim)), jnp.zeros((1, obs_steps, obs_dim))
        )
        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 1)

    # ------------------------------------------------------------------
    def train_step(self, batch):
        """batch: action chunk windows; BC on the last action of the obs
        window (reference dbc uses (b, To, obs) -> single action)."""
        nobs = batch["obs"]["state"][:, : self.To]
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
