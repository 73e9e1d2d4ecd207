"""DiffusionBC with image observations (TPU-native).

Re-design of reference pipelines/dbc_pusht_image.py:113-260 and
dbc_robomimic_image.py: Pearce MLP/Transformer action head conditioned on a
MultiImageObsCondition (GN-ResNet18 per camera + low_dim concat) over the
To-frame obs window, trained with DDPM/EDM and sampled with optional
diffusion-x extra steps. The per-step action sampling (vision encoder +
k-step denoise scan) compiles into ONE jitted program per batch size.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousEDM, DiscreteDiffusionSDE
from ..nn_condition import MultiImageObsCondition
from ..nn_diffusion import PearceMlp, PearceTransformer

__all__ = ["DBCImagePipeline"]


class DBCImagePipeline:
    def __init__(
        self,
        shape_meta: Dict,
        action_dim: int,
        obs_steps: int = 2,
        nn: str = "pearce_mlp",
        diffusion: str = "ddpm",
        emb_dim: int = 128,
        sample_steps: int = 50,
        diffusion_x_sampling_steps: int = 0,
        crop_shape=(84, 84),
        lr: float = 1e-3,
        gradient_steps: int = 1_000_000,
        ema_rate: float = 0.9999,
        rng: int = 0,
    ):
        self.shape_meta = shape_meta
        self.action_dim, self.To = action_dim, obs_steps
        self.diffusion_kind = diffusion
        self.sample_steps = sample_steps
        self.x_steps = diffusion_x_sampling_steps

        if nn == "pearce_mlp":
            nn_diffusion = PearceMlp(act_dim=action_dim, To=obs_steps, emb_dim=emb_dim)
        elif nn == "pearce_transformer":
            nn_diffusion = PearceTransformer(act_dim=action_dim, To=obs_steps,
                                             emb_dim=emb_dim)
        else:
            raise ValueError(f"Invalid nn type {nn}")
        nn_condition = MultiImageObsCondition(
            shape_meta=shape_meta, emb_dim=emb_dim, crop_shape=crop_shape,
            use_seq=True, keep_horizon_dims=True,
        )

        optim_params = {
            "lr": optax.cosine_decay_schedule(lr, gradient_steps),
            "weight_decay": 0.0,
        }
        if diffusion in ("ddpm", "ddim"):
            self.agent = DiscreteDiffusionSDE(
                nn_diffusion, nn_condition,
                diffusion_steps=sample_steps,
                x_max=np.ones((action_dim,)),
                x_min=-np.ones((action_dim,)),
                ema_rate=ema_rate, optim_params=optim_params, rng=rng,
            )
        elif diffusion == "edm":
            self.agent = ContinuousEDM(
                nn_diffusion, nn_condition, ema_rate=ema_rate,
                optim_params=optim_params, rng=rng,
            )
        else:
            raise NotImplementedError(diffusion)

        ex_cond = {}
        for key, meta in shape_meta["obs"].items():
            shp = tuple(meta["shape"])
            ex_cond[key] = jnp.zeros((1, obs_steps) + shp, jnp.float32)
        self.agent.init(jnp.zeros((1, action_dim)), ex_cond)
        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 1)

    # ------------------------------------------------------------------
    def _condition_of(self, obs: Dict):
        """obs: dict of (B, T>=To, ...) arrays; keep the first To frames,
        normalize uint8/channels-last images to float CHW."""
        cond = {}
        for key, meta in self.shape_meta["obs"].items():
            x = jnp.asarray(obs[key])[:, : self.To]
            if meta["type"] == "rgb":
                if x.shape[-1] == meta["shape"][0]:  # channels-last storage
                    x = jnp.moveaxis(x, -1, -3)
                if jnp.issubdtype(x.dtype, jnp.integer):
                    x = x.astype(jnp.float32) / 255.0
                x = x.astype(jnp.float32)
            cond[key] = x
        return cond

    def train_step(self, batch):
        cond = self._condition_of(batch["obs"])
        naction = batch["action"][:, self.To - 1]
        return self.agent.update(naction, cond)

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused image-DBC trainer (mirrors DPImagePipeline.make_train_scan):
        `n_steps` x (uint8 device gather + vision-condition encode +
        grad/opt/EMA) in ONE `lax.scan`; the device store is passed as jit
        ARGUMENTS (see dp_image.py for why closure constants fail here)."""
        raw = self.agent._make_update_fn(update_ema=True, has_wrt=False)
        raw = getattr(raw, "__wrapped__", raw)

        def fused(state, arrays, widx, rng):
            N = widx.shape[0]

            def body(state, k):
                ks, _ = jax.random.split(k)
                i = jax.random.randint(ks, (batch_size,), 0, N)
                rows = widx[i]
                batch = jax.tree_util.tree_map(lambda a: a[rows], arrays)
                cond = self._condition_of(batch["obs"])
                state, log = raw(state, batch["action"][:, self.To - 1], cond, None)
                return state, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda x: x.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            arrays, widx = dataset._placed_store()
            self.agent.state, log = fused_jit(self.agent.state, arrays, widx, rng)
            return log

        return run

    def act(self, obs: Dict, rng: Optional[jax.Array] = None):
        cond = self._condition_of(obs)
        b = next(iter(cond.values())).shape[0]
        if b not in self._fn_cache:
            solver = "ddim" if self.diffusion_kind == "ddim" else (
                "euler" if self.diffusion_kind == "edm" else "ddpm"
            )
            sample_fn = self.agent.build_sample_fn(
                solver=solver, sample_steps=self.sample_steps, cfg_mode="cond",
                diffusion_x_sampling_steps=self.x_steps, final_logp=False,
            )

            def act_fn(params, r, cond):
                prior = jnp.zeros((b, self.action_dim))
                a, _ = sample_fn(params, None, r, prior, condition_cfg=cond, w_cfg=1.0)
                return a

            self._fn_cache[b] = jax.jit(act_fn)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        return self._fn_cache[b](self.agent.state.ema_params, rng, cond)

    def evaluate_on_device(
        self,
        env,
        normalizer,
        num_envs: int = 8,
        max_episode_steps: int = 300,
        rng: Optional[jax.Array] = None,
    ):
        """Fully on-device per-step visuomotor eval on the pure-JAX image
        env: every env step renders, encodes the To-frame window, denoises
        one action and steps the sim, all inside ONE jitted scan (the host
        loop paid two ~30ms tunnel round-trips per env step). Returns
        (mean best-coverage reward, mean success)."""
        pos_consts = normalizer["obs"]["agent_pos"].as_device_constants()
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

            def normalize_pos(p):
                return (p - pos_consts["min"]) / pos_consts["range"] * 2.0 - 1.0

            def unnormalize_act(a):
                return (a + 1.0) / 2.0 * act_consts["range"] + act_consts["min"]

            def rollout(params, r):
                r, k_reset = jax.random.split(r)
                state, obs = env.reset(k_reset, num_envs)
                img_win = jnp.repeat(obs["image"][:, None], To, axis=1)
                pos_win = jnp.repeat(
                    normalize_pos(obs["agent_pos"])[:, None], To, axis=1)

                def env_step(carry, _):
                    state, img_win, pos_win, r = carry
                    r, k_s = jax.random.split(r)
                    cond = self._condition_of(
                        {"image": img_win, "agent_pos": pos_win})
                    prior = jnp.zeros((num_envs, self.action_dim))
                    na, _ = sample_fn(params, None, k_s, prior,
                                      condition_cfg=cond, w_cfg=1.0)
                    state, obs, rew, done = env.step(state, unnormalize_act(na))
                    img_win = jnp.concatenate(
                        [img_win[:, 1:], obs["image"][:, None]], axis=1)
                    pos_win = jnp.concatenate(
                        [pos_win[:, 1:],
                         normalize_pos(obs["agent_pos"])[:, None]], axis=1)
                    return (state, img_win, pos_win, r), rew

                _, rews = jax.lax.scan(
                    env_step, (state, img_win, pos_win, r), None,
                    length=max_episode_steps)
                return rews.max(0)  # (E,) best coverage

            self._fn_cache[key] = jax.jit(rollout)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        best = self._fn_cache[key](self.agent.state.ema_params, rng)
        return float(best.mean()), float((best >= 1.0).mean())

    # ------------------------------------------------------------------
    def save(self, path: str):
        self.agent.save(path)

    def load(self, path: str):
        self.agent.load(path)
