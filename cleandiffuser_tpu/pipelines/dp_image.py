"""Image-observation Diffusion Policy pipeline (TPU-native).

Re-design of reference pipelines/dp_pusht_image.py:137-186 and
dp_robomimic_image.py: action-chunk diffusion with a visual obs encoder
(MultiImageObsCondition: per-key GN-ResNet18 + crop randomizer) as the
global condition. Image batches stay uint8 in HBM and normalize inside the
jitted train step; on-device eval renders observations with the SDF
rasterizer of PushTImageEnvJax.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousEDM, DiscreteDiffusionSDE
from ..nn_condition import MultiImageObsCondition
from ..nn_diffusion import ChiUNet1d, DiT1d

__all__ = ["DPImagePipeline"]


class DPImagePipeline:
    def __init__(
        self,
        shape_meta: Dict,
        action_dim: int,
        horizon: int = 16,
        obs_steps: int = 2,
        action_steps: int = 8,
        nn: str = "chi_unet",  # chi_unet | dit
        diffusion: str = "ddpm",
        sample_steps: int = 5,
        emb_dim: int = 256,
        crop_shape=(76, 76),
        lr: float = 1e-4,
        gradient_steps: int = 1_000_000,
        ema_rate: float = 0.9999,
        rng: int = 0,
    ):
        self.shape_meta = shape_meta
        self.action_dim = action_dim
        self.horizon, self.To, self.Ta = horizon, obs_steps, action_steps
        self.nn_kind, self.diffusion_kind = nn, diffusion
        self.sample_steps = sample_steps

        if nn == "chi_unet":
            # To-frame sequence conditioning (reference image DP encodes
            # EVERY obs frame): encoder emits (b, To, emb), ChiUNet consumes
            # the flattened To-window as its global condition
            nn_condition = MultiImageObsCondition(
                shape_meta=shape_meta, emb_dim=emb_dim, crop_shape=crop_shape,
                use_seq=True, keep_horizon_dims=True,
            )
            nn_diffusion = ChiUNet1d(
                act_dim=action_dim, obs_dim=emb_dim, To=obs_steps,
                model_dim=256, emb_dim=256, dim_mult=(1, 2, 2),
                obs_as_global_cond=True,
            )
        elif nn == "dit":
            nn_condition = MultiImageObsCondition(
                shape_meta=shape_meta, emb_dim=emb_dim, crop_shape=crop_shape,
            )
            nn_diffusion = DiT1d(
                in_dim=action_dim, emb_dim=emb_dim, d_model=320, n_heads=10,
                depth=2, timestep_emb_type="fourier",
            )
        else:
            raise ValueError(nn)

        optim_params = {
            "lr": optax.cosine_decay_schedule(lr, gradient_steps),
            "weight_decay": 0.0,
        }
        if diffusion == "ddpm":
            self.agent = DiscreteDiffusionSDE(
                nn_diffusion, nn_condition, diffusion_steps=sample_steps,
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

        # lazy init on first batch (image dims come from data)
        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 1)

    # ------------------------------------------------------------------
    def _condition_of(self, obs: Dict):
        """obs dict with image (B, T, ...) windows and low_dim keys.
        chi_unet (seq conditioning): keep the first To frames per key.
        dit: single-frame conditioning with the first obs frame."""
        seq = self.nn_kind == "chi_unet"
        cond = {}
        for key, meta in self.shape_meta["obs"].items():
            x = obs[key]
            if meta["type"] == "rgb":
                if x.ndim == 5:  # (B, T, ...) window
                    x = x[:, : self.To] if seq else x[:, 0]
                # accept channels-last storage (device image cache keeps the
                # raw (H, W, C) uint8 layout) or channels-first
                if x.shape[-1] == meta["shape"][0]:
                    x = jnp.moveaxis(x, -1, -3)
                x = x.astype(jnp.float32)
                if jnp.issubdtype(jnp.asarray(obs[key]).dtype, jnp.integer):
                    x = x / 255.0
            else:
                if x.ndim == 3:
                    x = x[:, : self.To] if seq else x[:, 0]
            cond[key] = x
        return cond

    def train_step(self, batch):
        cond = self._condition_of(batch["obs"])
        naction = batch["action"]
        return self.agent.update(naction, cond)

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused image trainer (mirrors DPPipeline.make_train_scan):
        `n_steps` x (uint8 device gather + vision-condition encode +
        grad/opt/EMA) compiled into ONE `lax.scan` program. The device
        store is passed as jit ARGUMENTS — closure-constant image arrays
        overflow the remote-compile payload (HTTP 413) and per-step
        dispatch caps image training at ~5 steps/s over the tunnel."""
        raw = self.agent._make_update_fn(update_ema=True, has_wrt=False)
        raw = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw

        def fused(state, arrays, widx, rng):
            N = widx.shape[0]

            def body(state, k):
                ks, _ = jax.random.split(k)
                i = jax.random.randint(ks, (batch_size,), 0, N)
                rows = widx[i]
                batch = jax.tree_util.tree_map(lambda a: a[rows], arrays)
                cond = self._condition_of(batch["obs"])
                state, log = raw(state, batch["action"], cond, None)
                return state, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda x: x.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            arrays, widx = dataset._placed_store()
            if self.agent.state is None:  # lazy engine init (first window)
                b = dataset.sample_batch(jax.random.PRNGKey(0), batch_size)
                self.agent._ensure_init(b["action"], self._condition_of(b["obs"]))
            self.agent.state, log = fused_jit(self.agent.state, arrays, widx, rng)
            return log

        return run

    def act_chunk(self, obs: Dict, rng: Optional[jax.Array] = None):
        cond = self._condition_of(obs)
        b = next(iter(cond.values())).shape[0]
        key = ("chunk", b)
        if key not in self._fn_cache:
            solver = "ddpm" if self.diffusion_kind == "ddpm" else "euler"
            sample_fn = self.agent.build_sample_fn(
                solver=solver, sample_steps=self.sample_steps,
                cfg_mode="cond", final_logp=False,
            )

            def chunk(params, r, cond):
                prior = jnp.zeros((b, self.horizon, self.action_dim))
                naction, _ = sample_fn(params, None, r, prior,
                                       condition_cfg=cond, w_cfg=1.0)
                start = self.To - 1
                return naction[:, start : start + self.Ta]

            self._fn_cache[key] = jax.jit(chunk)
        if rng is None:
            self._rng, rng = jax.random.split(rng if rng is not None else self._rng)
        return self._fn_cache[key](self.agent.state.ema_params, rng, cond)

    def evaluate_on_device(
        self,
        env,
        normalizer,
        num_envs: int = 8,
        max_episode_steps: int = 300,
        rng: Optional[jax.Array] = None,
    ):
        """Fully on-device receding-horizon visuomotor evaluation on the
        pure-JAX image env (PushTImageEnvJax): SDF-rasterized observation
        render, vision-encoder conditioning, k-step denoise and Ta env
        steps all inside ONE jitted rollout — no per-step host dispatch
        (the host eval loop pays ~30ms tunnel round-trip per env step).
        Returns (mean best-coverage reward, mean success)."""
        pos_consts = normalizer["obs"]["agent_pos"].as_device_constants()
        act_consts = normalizer["action"].as_device_constants()
        key = ("eval", num_envs, max_episode_steps)
        if key not in self._fn_cache:
            solver = "ddpm" if self.diffusion_kind == "ddpm" else "euler"
            sample_fn = self.agent.build_sample_fn(
                solver=solver, sample_steps=self.sample_steps,
                cfg_mode="cond", final_logp=False,
            )
            n_chunks = max_episode_steps // self.Ta
            To, Ta = self.To, self.Ta

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

                def control_step(carry, _):
                    state, img_win, pos_win, r = carry
                    r, k_s = jax.random.split(r)
                    cond = self._condition_of(
                        {"image": img_win, "agent_pos": pos_win})
                    prior = jnp.zeros((num_envs, self.horizon, self.action_dim))
                    naction, _ = sample_fn(params, None, k_s, prior,
                                           condition_cfg=cond, w_cfg=1.0)
                    chunk = unnormalize_act(naction[:, To - 1 : To - 1 + Ta])

                    def env_step(c, a):
                        state, img_win, pos_win = c
                        state, obs, rew, done = env.step(state, a)
                        img_win = jnp.concatenate(
                            [img_win[:, 1:], obs["image"][:, None]], axis=1)
                        pos_win = jnp.concatenate(
                            [pos_win[:, 1:],
                             normalize_pos(obs["agent_pos"])[:, None]], axis=1)
                        return (state, img_win, pos_win), rew

                    (state, img_win, pos_win), rews = jax.lax.scan(
                        env_step, (state, img_win, pos_win),
                        jnp.swapaxes(chunk, 0, 1))
                    return (state, img_win, pos_win, r), rews

                _, all_rews = jax.lax.scan(
                    control_step, (state, img_win, pos_win, r), None,
                    length=n_chunks)
                best = all_rews.reshape(-1, num_envs).max(0)  # (E,)
                return best

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
