"""Karras EDM engine with fused Euler/Heun lax.scan sampler.

TPU-native re-design of reference cleandiffuser/diffusion/newedm.py:15-438.
Preconditioning (c_skip/c_out/c_in/c_noise, newedm.py:130-141), log-normal
training noise (:152-164), EDM-weighted x0 loss (:166-176), Karras
rho-schedule (:386-388), 1st-order Euler with optional Heun 2nd-order
correction (:407-423) — all compiled into one scan program. Heun's second
guided model call is traced statically so euler/heun compile to different
programs with no runtime branching.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..utils.schedules import karras_sigma_schedule
from ..utils.tensors import at_least_ndim
from .basic import DiffusionModel, bf16_cast, host_constants

__all__ = ["ContinuousEDM"]


class ContinuousEDM(DiffusionModel):
    def __init__(
        self,
        nn_diffusion,
        nn_condition=None,
        fix_mask=None,
        loss_weight=None,
        classifier=None,
        grad_clip_norm: Optional[float] = None,
        ema_rate: float = 0.995,
        optim_params: Optional[dict] = None,
        sigma_data: float = 0.5,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        P_mean: float = -1.2,
        P_std: float = 1.2,
        x_max=None,
        x_min=None,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        super().__init__(
            nn_diffusion, nn_condition, fix_mask, loss_weight, classifier,
            grad_clip_norm, 0, ema_rate, optim_params, rng, device,
        )
        self.sigma_data, self.sigma_min, self.sigma_max = sigma_data, sigma_min, sigma_max
        self.rho, self.P_mean, self.P_std = rho, P_mean, P_std
        with host_constants():
            self.x_max = jnp.asarray(x_max, jnp.float32) if x_max is not None else None
            self.x_min = jnp.asarray(x_min, jnp.float32) if x_min is not None else None
        self.t_diffusion = [sigma_min, sigma_max]

    @property
    def supported_solvers(self):
        return ["euler", "heun"]

    @property
    def clip_pred(self):
        return (self.x_max is not None) or (self.x_min is not None)

    def t_example(self, batch: int):
        return jnp.ones((batch,), jnp.float32)

    # ---------------- EDM pre-conditioning ----------------
    def c_skip(self, sigma):
        return self.sigma_data**2 / (self.sigma_data**2 + sigma**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(self.sigma_data**2 + sigma**2)

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(self.sigma_data**2 + sigma**2)

    def c_noise(self, sigma):
        return 0.25 * jnp.log(sigma)

    def D(self, params, x, sigma, emb=None, train=False, rng=None):
        """Preconditioned denoiser D(x; sigma) (newedm.py:142-148)."""
        cs = at_least_ndim(self.c_skip(sigma), x.ndim)
        co = at_least_ndim(self.c_out(sigma), x.ndim)
        ci = at_least_ndim(self.c_in(sigma), x.ndim)
        cn = self.c_noise(sigma)
        return cs * x + co * self.apply_diffusion(params, ci * x, cn, emb, train=train, rng=rng)

    # ---------------- Training ----------------
    def add_noise(self, rng, x0, t=None, eps=None):
        k_t, k_eps = jax.random.split(rng)
        if t is None:
            t = jnp.exp(jax.random.normal(k_t, (x0.shape[0],)) * self.P_std + self.P_mean)
        if eps is None:
            eps = jax.random.normal(k_eps, x0.shape)
        sigma = at_least_ndim(t, x0.ndim)
        xt = x0 + sigma * eps
        xt = (1.0 - self.fix_mask) * xt + self.fix_mask * x0
        return xt, t, eps

    def loss_fn(self, params, rng, x0, condition, weighted_regression=None):
        k_noise, k_cond, k_drop = jax.random.split(rng, 3)
        xt, t, _ = self.add_noise(k_noise, x0)
        emb = self.apply_condition(params, condition, train=True, rng=k_cond)
        pred = self.D(params, xt, t, emb, train=True, rng=k_drop)
        loss = (pred - x0) ** 2
        edm_weight = at_least_ndim(
            (t**2 + self.sigma_data**2) / ((t * self.sigma_data) ** 2), x0.ndim
        )
        loss = loss * self.loss_weight * (1.0 - self.fix_mask) * edm_weight
        if weighted_regression is not None:
            loss = loss * weighted_regression[..., None]
        return loss.mean()

    def update_classifier(self, x0, condition):
        rng = self.next_sample_rng()
        xt, t, _ = self.add_noise(rng, jnp.asarray(x0))
        return self.classifier.update(xt, jnp.log(t) / 4.0, condition)

    # ---------------- Guided prediction ----------------
    def _guided_pred(self, params, cls_params, xt, t, emb, condition_cg, w_cfg, w_cg, sigma,
                     cfg_mode, use_cg):
        b = xt.shape[0]
        if cfg_mode == "mix":
            xt2 = jnp.concatenate([xt, xt], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            emb2 = jax.tree_util.tree_map(
                lambda e: jnp.concatenate([e, jnp.zeros_like(e)], axis=0), emb
            )
            pred_all = self.D(params, xt2, t2, emb2)
            pred, pred_uncond = pred_all[:b], pred_all[b:]
            bar_pred = w_cfg * pred + (1 - w_cfg) * pred_uncond
        elif cfg_mode == "cond":
            bar_pred = self.D(params, xt, t, emb)
        else:
            bar_pred = self.D(params, xt, t, None)

        if use_cg:
            # classifier sees c_noise-scaled time: log(sigma)/4 (newedm.py:231-233)
            _, grad = self.classifier.gradients(cls_params, xt, jnp.log(t) / 4.0, condition_cg)
            bar_pred = bar_pred + w_cg * at_least_ndim(sigma, bar_pred.ndim) ** 2 * grad

        if self.clip_pred:
            lo = self.x_min if self.x_min is not None else -jnp.inf
            hi = self.x_max if self.x_max is not None else jnp.inf
            bar_pred = jnp.clip(bar_pred, lo, hi)
        return bar_pred

    # ---------------- Sampling ----------------
    def build_sample_fn(
        self,
        solver: str = "euler",
        sample_steps: int = 5,
        cfg_mode: str = "uncond",
        use_cg: bool = False,
        diffusion_x_sampling_steps: int = 0,
        warm_start: bool = False,
        warm_start_forward_level: float = 0.3,
        preserve_history: bool = False,
        final_logp: Optional[bool] = None,
    ):
        assert solver in ("euler", "heun"), f"Solver {solver} is not supported."
        if final_logp is None:
            final_logp = self.classifier is not None

        fwd_sigma = (
            self.sigma_min + (self.sigma_max - self.sigma_min) * warm_start_forward_level
            if warm_start
            else self.sigma_max
        )
        with host_constants():  # tables embed as constants: host-backed
            sigmas = karras_sigma_schedule(self.sigma_min, fwd_sigma, self.rho, sample_steps)
            idxs = jnp.concatenate(
                [
                    jnp.arange(sample_steps, 0, -1, dtype=jnp.int32),
                    jnp.ones((diffusion_x_sampling_steps,), jnp.int32),
                ]
            )

        def fn(
            params, cls_params, rng, prior,
            condition_cfg=None, mask_cfg=None, condition_cg=None,
            w_cfg: float = 0.0, w_cg: float = 0.0, temperature: float = 1.0,
            warm_reference=None,
        ):
            if self.bf16_sampling:  # pre-cast once, hoisted out of the scan
                params = {**params, "diffusion": bf16_cast(params["diffusion"])}
            k_init, k_scan = jax.random.split(rng)
            if warm_start and warm_reference is not None:
                xt = warm_reference + fwd_sigma * jax.random.normal(k_init, prior.shape)
            else:
                xt = jax.random.normal(k_init, prior.shape) * self.sigma_max * temperature
            xt = xt * (1.0 - self.fix_mask) + prior * self.fix_mask

            emb = self.apply_condition(params, condition_cfg, mask=mask_cfg, train=False)

            def body(carry, i):
                xt, rng = carry
                t = jnp.full((prior.shape[0],), sigmas[i])
                pred = self._guided_pred(
                    params, cls_params, xt, t, emb, condition_cg,
                    w_cfg, w_cg, sigmas[i], cfg_mode, use_cg,
                )
                dot_x = (xt - pred) / sigmas[i]
                delta_t = sigmas[i] - sigmas[i - 1]
                x_next = xt - dot_x * delta_t
                x_next = x_next * (1.0 - self.fix_mask) + prior * self.fix_mask

                if solver == "heun":
                    t_next = jnp.full((prior.shape[0],), sigmas[i - 1])
                    pred2 = self._guided_pred(
                        params, cls_params, x_next, t_next, emb, condition_cg,
                        w_cfg, w_cg, sigmas[i - 1], cfg_mode, use_cg,
                    )
                    dot_x2 = (x_next - pred2) / sigmas[i - 1]
                    x_heun = xt - (dot_x + dot_x2) / 2.0 * delta_t
                    x_heun = x_heun * (1.0 - self.fix_mask) + prior * self.fix_mask
                    # 2nd-order correction only applies when i > 1
                    x_next = jnp.where(i > 1, x_heun, x_next)

                out = x_next if preserve_history else None
                return (x_next, rng), out

            (xt, _), history = jax.lax.scan(body, (xt, k_scan), idxs)

            log = {}
            if preserve_history:
                log["sample_history"] = jnp.swapaxes(history, 0, 1)
            if final_logp and self.classifier is not None:
                t0 = jnp.full((prior.shape[0],), self.sigma_min)
                log["log_p"] = self.classifier.logp(
                    cls_params, xt, jnp.log(t0) / 4.0, condition_cg
                )
            if self.clip_pred:
                lo = self.x_min if self.x_min is not None else -jnp.inf
                hi = self.x_max if self.x_max is not None else jnp.inf
                xt = jnp.clip(xt, lo, hi)
            return xt, log

        return fn

    def sample(
        self,
        prior,
        solver: str = "euler",
        n_samples: Optional[int] = None,
        sample_steps: int = 5,
        use_ema: bool = True,
        temperature: float = 1.0,
        condition_cfg=None,
        mask_cfg=None,
        w_cfg: float = 0.0,
        condition_cg=None,
        w_cg: float = 0.0,
        diffusion_x_sampling_steps: int = 0,
        warm_start_reference=None,
        warm_start_forward_level: float = 0.3,
        requires_grad: bool = False,
        preserve_history: bool = False,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ):
        del n_samples
        prior = jnp.asarray(prior)
        self._ensure_init(prior, condition_cfg)

        if w_cfg != 0.0 and w_cfg != 1.0 and condition_cfg is not None:
            cfg_mode = "mix"
        elif w_cfg == 0.0 or condition_cfg is None:
            cfg_mode = "uncond"
        else:
            cfg_mode = "cond"
        use_cg = (self.classifier is not None) and (w_cg != 0.0) and (condition_cg is not None)
        warm = warm_start_reference is not None

        key = (
            "sample", solver, sample_steps, cfg_mode, use_cg, diffusion_x_sampling_steps,
            warm, warm_start_forward_level if warm else None, preserve_history, use_ema,
        )
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                self.build_sample_fn(
                    solver=solver,
                    sample_steps=sample_steps,
                    cfg_mode=cfg_mode,
                    use_cg=use_cg,
                    diffusion_x_sampling_steps=diffusion_x_sampling_steps,
                    warm_start=warm,
                    warm_start_forward_level=warm_start_forward_level,
                    preserve_history=preserve_history,
                )
            )
        params = self.state.ema_params if use_ema else self.state.params
        cls_params = self.classifier.inference_params if self.classifier is not None else None
        rng = rng if rng is not None else self.next_sample_rng()
        x0, log = self._fn_cache[key](
            params, cls_params, rng, prior, condition_cfg, mask_cfg, condition_cg,
            float(w_cfg), float(w_cg), float(temperature), warm_start_reference,
        )
        log = dict(log)
        log.setdefault("sample_history", None)
        log.setdefault("log_p", None)
        return x0, log
