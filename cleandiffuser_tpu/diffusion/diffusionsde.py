"""Discrete & continuous VP-SDE diffusion engines with a fused lax.scan sampler.

TPU-native re-design of reference cleandiffuser/diffusion/diffusionsde.py.
The reference runs a Python `for` loop of `sample_steps` network calls
(diffusionsde.py:525-594); here the ENTIRE k-step denoising loop — guided
prediction (CFG doubled-batch forward + classifier-gradient), prediction
clipping, solver update, noise injection, and fix_mask inpainting — is one
`lax.scan` traced into a single XLA program. Solver choice, CFG mode, and
guidance structure are static, so each configuration compiles once and
executes with zero host round-trips.

Supported solvers (reference diffusionsde.py:15-18): ddpm, ddim,
ode_dpmsolver_1, ode_dpmsolver++_1, ode_dpmsolver++_2M, sde_dpmsolver_1,
sde_dpmsolver++_1, sde_dpmsolver++_2M. Features kept: warm-starting,
temperature, diffusion-x extra steps, fix_mask re-pinning, history
preservation, final classifier log-p scoring, CFG + CG guidance, and
x_min/x_max prediction clipping.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.schedules import (
    SUPPORTED_DISCRETIZATIONS,
    SUPPORTED_NOISE_SCHEDULES,
    SUPPORTED_SAMPLING_STEP_SCHEDULE,
)
from ..utils.tensors import at_least_ndim
from .basic import DiffusionModel, host_constants
from .vp_solvers import (
    SUPPORTED_SOLVERS,
    epstheta_to_xtheta,
    solver_step,
    xtheta_to_epstheta,
)

__all__ = ["DiscreteDiffusionSDE", "ContinuousDiffusionSDE", "BaseDiffusionSDE"]


def _tree_cat2(tree):
    """Stack [emb; zeros] along batch for the CFG doubled forward."""
    return jax.tree_util.tree_map(
        lambda e: jnp.concatenate([e, jnp.zeros_like(e)], axis=0), tree
    )


class BaseDiffusionSDE(DiffusionModel):
    """Shared VP-SDE logic (reference diffusionsde.py:35-244)."""

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
        epsilon: float = 1e-3,
        noise_schedule: Union[str, Dict[str, Callable]] = "cosine",
        noise_schedule_params: Optional[dict] = None,
        x_max=None,
        x_min=None,
        predict_noise: bool = True,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        super().__init__(
            nn_diffusion,
            nn_condition,
            fix_mask,
            loss_weight,
            classifier,
            grad_clip_norm,
            0,
            ema_rate,
            optim_params,
            rng,
            device,
        )
        self.predict_noise = predict_noise
        self.epsilon = epsilon
        with host_constants():
            self.x_max = jnp.asarray(x_max, jnp.float32) if x_max is not None else None
            self.x_min = jnp.asarray(x_min, jnp.float32) if x_min is not None else None

    @property
    def supported_solvers(self):
        return SUPPORTED_SOLVERS

    @property
    def clip_pred(self):
        return (self.x_max is not None) or (self.x_min is not None)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def add_noise(self, rng, x0):
        """Returns (xt, t, eps). Engine-specific t sampling."""
        raise NotImplementedError

    def loss_fn(self, params, rng, x0, condition, weighted_regression=None):
        k_noise, k_cond, k_drop = jax.random.split(rng, 3)
        xt, t, eps = self.add_noise(k_noise, x0)
        emb = self.apply_condition(params, condition, train=True, rng=k_cond)
        pred = self.apply_diffusion(params, xt, t, emb, train=True, rng=k_drop)
        target = eps if self.predict_noise else x0
        loss = (pred - target) ** 2
        loss = loss * self.loss_weight * (1.0 - self.fix_mask)
        if weighted_regression is not None:
            loss = loss * weighted_regression[..., None]
        return loss.mean()

    # ------------------------------------------------------------------
    # Guided prediction (inside the scan)
    # ------------------------------------------------------------------
    def clip_prediction(self, pred, xt, alpha, sigma):
        """Clip x0 (or implied eps bounds) to [x_min, x_max]
        (reference diffusionsde.py:208-223)."""
        if not self.clip_pred:
            return pred
        if self.predict_noise:
            upper = (xt - alpha * self.x_min) / sigma if self.x_min is not None else jnp.inf
            lower = (xt - alpha * self.x_max) / sigma if self.x_max is not None else -jnp.inf
            return jnp.clip(pred, lower, upper)
        lo = self.x_min if self.x_min is not None else -jnp.inf
        hi = self.x_max if self.x_max is not None else jnp.inf
        return jnp.clip(pred, lo, hi)

    def _guided_pred(
        self,
        params,
        cls_params,
        xt,
        t,
        emb,
        condition_cg,
        w_cfg,
        w_cg,
        alpha_i,
        sigma_i,
        cfg_mode: str,
        use_cg: bool,
    ):
        """CFG then CG (reference diffusionsde.py:153-241).

        When `self.bf16_sampling` is set, the network forward runs in
        bfloat16 (params are pre-cast by the sampler; inputs cast here,
        prediction cast back) — solver math stays float32.
        """
        b = xt.shape[0]
        cdt = jnp.bfloat16 if getattr(self, "bf16_sampling", False) else None
        xt_c = xt.astype(cdt) if cdt else xt
        emb_c = (
            jax.tree_util.tree_map(lambda e: e.astype(cdt), emb)
            if (cdt and emb is not None)
            else emb
        )
        if cfg_mode == "mix":
            xt2 = jnp.concatenate([xt_c, xt_c], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            emb2 = _tree_cat2(emb_c)
            pred_all = self.apply_diffusion(params, xt2, t2, emb2).astype(jnp.float32)
            pred, pred_uncond = pred_all[:b], pred_all[b:]
            bar_pred = w_cfg * pred + (1 - w_cfg) * pred_uncond
        elif cfg_mode == "cond":
            bar_pred = self.apply_diffusion(params, xt_c, t, emb_c).astype(jnp.float32)
        else:  # "uncond"
            bar_pred = self.apply_diffusion(params, xt_c, t, None).astype(jnp.float32)

        if use_cg:
            _, grad = self.classifier.gradients(cls_params, xt, t, condition_cg)
            if self.predict_noise:
                bar_pred = bar_pred - w_cg * sigma_i * grad
            else:
                bar_pred = bar_pred + w_cg * (sigma_i**2 / alpha_i) * grad
        return bar_pred

    # ------------------------------------------------------------------
    # Sampling tables (engine-specific)
    # ------------------------------------------------------------------
    def _sample_tables(self, sample_step_schedule: str, sample_steps: int, warm_level):
        """Returns (ts, alphas, sigmas) each (steps+1,). `ts` feeds the net."""
        raise NotImplementedError

    def _forward_level(self, warm_level: float):
        """(alpha, sigma) at the warm-start forward noise level."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Pure sampler builder
    # ------------------------------------------------------------------
    def build_sample_fn(
        self,
        solver: str = "ddpm",
        sample_steps: int = 5,
        sample_step_schedule: str = "uniform",
        cfg_mode: str = "uncond",
        use_cg: bool = False,
        diffusion_x_sampling_steps: int = 0,
        warm_start: bool = False,
        warm_start_forward_level: float = 0.3,
        preserve_history: bool = False,
        final_logp: Optional[bool] = None,
        fix_mask=None,
    ):
        """Build the pure k-step sampling program.

        Signature of the returned fn:
            fn(params, cls_params, rng, prior, condition_cfg, mask_cfg,
               condition_cg, w_cfg, w_cg, temperature, warm_reference)
            -> (x0, log dict)

        The returned fn is NOT jitted so callers (e.g. DQL's
        backprop-through-sampling policy loss) can compose it into larger
        programs; `sample()` wraps and jits it.

        `fix_mask` overrides the engine's training-time mask for THIS
        sampler only — inference-time inpainting over extra dims (e.g.
        pinning a plan's final state to a goal, Diffuser's maze2d
        protocol) without touching the training loss mask.
        """
        assert solver in SUPPORTED_SOLVERS, f"Solver {solver} is not supported."
        if final_logp is None:
            final_logp = self.classifier is not None

        # host_constants: these tables close over the sampling program as
        # MLIR constants; host-backed arrays lower without a tunnel fetch
        with host_constants():
            if fix_mask is None:
                fix_mask = self.fix_mask
            else:
                fix_mask = jnp.asarray(fix_mask, dtype=jnp.float32)[None]
            ts, alphas, sigmas = self._sample_tables(
                sample_step_schedule, sample_steps, warm_start_forward_level if warm_start else None
            )
            logSNRs = jnp.log(alphas / sigmas)
            hs = jnp.concatenate([jnp.zeros((1,)), logSNRs[:-1] - logSNRs[1:]])
            stds = jnp.concatenate(
                [
                    jnp.zeros((1,)),
                    sigmas[:-1] / sigmas[1:] * jnp.sqrt(1 - (alphas[1:] / alphas[:-1]) ** 2),
                ]
            )
            # loop index sequence: steps, steps-1, ..., 1, then x extra steps at 1
            idxs = jnp.concatenate(
                [
                    jnp.arange(sample_steps, 0, -1, dtype=jnp.int32),
                    jnp.ones((diffusion_x_sampling_steps,), jnp.int32),
                ]
            )
            is_firsts = jnp.arange(idxs.shape[0]) == 0

        def fn(
            params,
            cls_params,
            rng,
            prior,
            condition_cfg=None,
            mask_cfg=None,
            condition_cg=None,
            w_cfg: float = 0.0,
            w_cg: float = 0.0,
            temperature: float = 1.0,
            warm_reference=None,
        ):
            if getattr(self, "bf16_sampling", False):
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16)
                    if jnp.issubdtype(p.dtype, jnp.floating) else p,
                    params,
                )
            k_init, k_scan = jax.random.split(rng)
            if warm_start and warm_reference is not None:
                fwd_alpha, fwd_sigma = self._forward_level(warm_start_forward_level)
                xt = warm_reference * fwd_alpha + fwd_sigma * jax.random.normal(
                    k_init, prior.shape
                )
            else:
                xt = jax.random.normal(k_init, prior.shape) * temperature
            xt = xt * (1.0 - fix_mask) + prior * fix_mask

            emb = self.apply_condition(params, condition_cfg, mask=mask_cfg, train=False)

            def body(carry, xs):
                xt, prev_x_theta, rng = carry
                i, is_first = xs
                rng, k_noise = jax.random.split(rng)
                t = jnp.full((prior.shape[0],), ts[i], dtype=ts.dtype)
                a_i, s_i = alphas[i], sigmas[i]

                pred = self._guided_pred(
                    params, cls_params, xt, t, emb, condition_cg,
                    w_cfg, w_cg, a_i, s_i, cfg_mode, use_cg,
                )
                pred = self.clip_prediction(pred, xt, a_i, s_i)

                eps_theta = (
                    pred if self.predict_noise else xtheta_to_epstheta(xt, a_i, s_i, pred)
                )
                x_theta = (
                    pred if not self.predict_noise else epstheta_to_xtheta(xt, a_i, s_i, pred)
                )

                noise = jax.random.normal(k_noise, xt.shape)
                x_next = solver_step(
                    solver, xt, eps_theta, x_theta, prev_x_theta, is_first,
                    i, alphas, sigmas, hs, stds, noise,
                )
                x_next = x_next * (1.0 - fix_mask) + prior * fix_mask
                out = x_next if preserve_history else None
                return (x_next, x_theta, rng), out

            (xt, _, _), history = jax.lax.scan(
                body, (xt, jnp.zeros_like(xt), k_scan), (idxs, is_firsts)
            )

            log = {}
            if preserve_history:
                log["sample_history"] = jnp.swapaxes(history, 0, 1)
            if final_logp and self.classifier is not None:
                t0 = jnp.zeros((prior.shape[0],), dtype=ts.dtype)
                log["log_p"] = self.classifier.logp(cls_params, xt, t0, condition_cg)
            if self.clip_pred:
                lo = self.x_min if self.x_min is not None else -jnp.inf
                hi = self.x_max if self.x_max is not None else jnp.inf
                xt = jnp.clip(xt, lo, hi)
            return xt, log

        return fn

    # ------------------------------------------------------------------
    # Parallel-in-time sampling (TPU-native extension, no reference
    # counterpart): Picard iteration over the whole DDIM grid
    # (ParaDiGMS, arXiv:2305.16317 — PAPERS.md). Instead of N sequential
    # network calls, keep estimates x_i at ALL N grid points, evaluate the
    # network at every point in ONE (N*B)-batched forward (the MXU is far
    # from saturated at control batch sizes), propagate the now-linear
    # DDIM recurrence x_{i-1} = c1_i x_i + c2_i eps_i in closed form, and
    # repeat K times. Converges EXACTLY to sequential DDIM in K = N
    # iterations (the system is triangular); K ~ N/3 is tight in practice.
    # Sequential depth drops N -> K: a latency win whenever the chip has
    # spare throughput at batch B (real-time planning, B = num_envs).
    # ------------------------------------------------------------------
    def build_parallel_sample_fn(
        self,
        sample_steps: int = 20,
        picard_iters: int = 8,
        sample_step_schedule: str = "uniform",
        cfg_mode: str = "uncond",
    ):
        """Pure parallel-in-time DDIM sampler.

        fn(params, rng, prior, condition_cfg=None, mask_cfg=None,
           w_cfg=0.0, temperature=1.0) -> (x0, {"picard_residual": r})
        """
        with host_constants():
            ts, alphas, sigmas = self._sample_tables(
                sample_step_schedule, sample_steps, None)
            # DDIM map at grid step i (i = sample_steps..1):
            #   x_{i-1} = (a_{i-1}/a_i) x_i + (s_{i-1} - (a_{i-1}/a_i) s_i) eps_i
            idx = jnp.arange(sample_steps, 0, -1, dtype=jnp.int32)  # N..1
            c1 = alphas[idx - 1] / alphas[idx]
            c2 = sigmas[idx - 1] - c1 * sigmas[idx]
            t_rows = ts[idx]
            a_rows, s_rows = alphas[idx], sigmas[idx]

        N = sample_steps

        def fn(params, rng, prior, condition_cfg=None, mask_cfg=None,
               w_cfg: float = 0.0, temperature: float = 1.0):
            if getattr(self, "bf16_sampling", False):
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16)
                    if jnp.issubdtype(p.dtype, jnp.floating) else p,
                    params,
                )
            B = prior.shape[0]
            feat_shape = prior.shape[1:]
            bc = (N * B,) + (1,) * len(feat_shape)
            # same split as build_sample_fn so the DDIM comparison is
            # noise-for-noise exact
            k_init, _ = jax.random.split(rng)
            xT = jax.random.normal(k_init, prior.shape) * temperature
            xT = xT * (1.0 - self.fix_mask) + prior * self.fix_mask

            emb = self.apply_condition(params, condition_cfg, mask=mask_cfg,
                                       train=False)
            # tile the condition embedding over the N grid rows
            emb_rows = (
                jax.tree_util.tree_map(
                    lambda e: jnp.tile(e, (N,) + (1,) * (e.ndim - 1)), emb)
                if emb is not None else None
            )
            t_all = jnp.repeat(t_rows, B)          # (N*B,)
            a_all = jnp.repeat(a_rows, B).reshape(bc)
            s_all = jnp.repeat(s_rows, B).reshape(bc)
            c1_col = c1[:, None]
            c2_col = c2[:, None]

            prior_flat = prior.reshape(B, -1)
            fixm = (self.fix_mask * jnp.ones(prior.shape)).reshape(B, -1)

            def sweep(X, _):
                # X: (N+1, B, F) flat estimates, X[0] = x at grid N (noise)
                xs = X[:-1].reshape((N * B,) + feat_shape)
                pred = self._guided_pred(
                    params, None, xs, t_all, emb_rows, None,
                    w_cfg, 0.0, a_all, s_all, cfg_mode, False,
                )
                pred = self.clip_prediction(pred, xs, a_all, s_all)
                eps = (pred if self.predict_noise
                       else xtheta_to_epstheta(xs, a_all, s_all, pred))
                eps = eps.reshape(N, B, -1)

                def prop(x_i, inp):
                    c1_i, c2_i, eps_i = inp
                    x_next = c1_i * x_i + c2_i * eps_i
                    x_next = x_next * (1.0 - fixm) + prior_flat * fixm
                    return x_next, x_next

                _, X_new = jax.lax.scan(prop, X[0], (c1_col, c2_col, eps))
                X_new = jnp.concatenate([X[:1], X_new], axis=0)
                resid = jnp.abs(X_new - X).max()
                return X_new, resid

            X0 = jnp.broadcast_to(xT.reshape(1, B, -1),
                                  (N + 1, B, int(np.prod(feat_shape)) or 1))
            X, resids = jax.lax.scan(sweep, X0, None, length=picard_iters)
            x0 = X[-1].reshape(prior.shape)
            if self.clip_pred:
                lo = self.x_min if self.x_min is not None else -jnp.inf
                hi = self.x_max if self.x_max is not None else jnp.inf
                x0 = jnp.clip(x0, lo, hi)
            return x0, {"picard_residual": resids[-1]}

        return fn

    def sample_parallel(
        self,
        prior,
        sample_steps: int = 20,
        picard_iters: int = 8,
        sample_step_schedule: str = "uniform",
        use_ema: bool = True,
        temperature: float = 1.0,
        condition_cfg=None,
        mask_cfg=None,
        w_cfg: float = 0.0,
        rng: Optional[jax.Array] = None,
    ):
        """Parallel-in-time DDIM sampling (see build_parallel_sample_fn)."""
        prior = jnp.asarray(prior)
        self._ensure_init(prior, condition_cfg)
        if w_cfg != 0.0 and w_cfg != 1.0 and condition_cfg is not None:
            cfg_mode = "mix"
        elif w_cfg == 0.0 or condition_cfg is None:
            cfg_mode = "uncond"
        else:
            cfg_mode = "cond"
        key = ("sample_parallel", sample_steps, picard_iters,
               sample_step_schedule, cfg_mode, use_ema)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(self.build_parallel_sample_fn(
                sample_steps=sample_steps, picard_iters=picard_iters,
                sample_step_schedule=sample_step_schedule, cfg_mode=cfg_mode,
            ))
        params = self.state.ema_params if use_ema else self.state.params
        rng = rng if rng is not None else self.next_sample_rng()
        return self._fn_cache[key](params, rng, prior, condition_cfg,
                                   mask_cfg, float(w_cfg), float(temperature))

    # ------------------------------------------------------------------
    # User-facing sampling (parity with reference diffusionsde.py:401-606)
    # ------------------------------------------------------------------
    def sample(
        self,
        prior,
        solver: str = "ddpm",
        n_samples: Optional[int] = None,
        sample_steps: int = 5,
        sample_step_schedule: Union[str, Callable] = "uniform",
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
        del n_samples  # implied by prior.shape[0]
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
            "sample", solver, sample_steps, sample_step_schedule, cfg_mode, use_cg,
            diffusion_x_sampling_steps, warm, warm_start_forward_level if warm else None,
            preserve_history, use_ema,
        )
        if key not in self._fn_cache:
            fn = self.build_sample_fn(
                solver=solver,
                sample_steps=sample_steps,
                sample_step_schedule=sample_step_schedule,
                cfg_mode=cfg_mode,
                use_cg=use_cg,
                diffusion_x_sampling_steps=diffusion_x_sampling_steps,
                warm_start=warm,
                warm_start_forward_level=warm_start_forward_level,
                preserve_history=preserve_history,
            )
            self._fn_cache[key] = jax.jit(fn)

        params = self.state.ema_params if use_ema else self.state.params
        cls_params = self.classifier.inference_params if self.classifier is not None else None
        rng = rng if rng is not None else self.next_sample_rng()

        x0, log = self._fn_cache[key](
            params,
            cls_params,
            rng,
            prior,
            condition_cfg,
            mask_cfg,
            condition_cg,
            float(w_cfg),
            float(w_cg),
            float(temperature),
            warm_start_reference,
        )
        log = {k: v for k, v in log.items()}
        log.setdefault("sample_history", None)
        log.setdefault("log_p", None)
        return x0, log


class DiscreteDiffusionSDE(BaseDiffusionSDE):
    """Discrete-time VP-SDE (reference diffusionsde.py:247-606).

    Time lives on a T-point grid mapping [epsilon, 1] -> [0, T-1]; alpha and
    sigma are precomputed (T,) tables.
    """

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
        epsilon: float = 1e-3,
        diffusion_steps: int = 1000,
        discretization: Union[str, Callable] = "uniform",
        noise_schedule: Union[str, Dict[str, Callable]] = "cosine",
        noise_schedule_params: Optional[dict] = None,
        x_max=None,
        x_min=None,
        predict_noise: bool = True,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        super().__init__(
            nn_diffusion, nn_condition, fix_mask, loss_weight, classifier,
            grad_clip_norm, ema_rate, optim_params, epsilon, noise_schedule,
            noise_schedule_params, x_max, x_min, predict_noise, rng, device,
        )
        self.diffusion_steps = diffusion_steps
        if 1.0 / diffusion_steps < epsilon:
            raise ValueError("epsilon is too large for the number of diffusion steps")

        with host_constants():
            if isinstance(discretization, str):
                disc_fn = SUPPORTED_DISCRETIZATIONS.get(discretization, SUPPORTED_DISCRETIZATIONS["uniform"])
                self.t_diffusion = disc_fn(diffusion_steps, epsilon)
            elif callable(discretization):
                self.t_diffusion = discretization(diffusion_steps, epsilon)
            else:
                raise ValueError("discretization must be a callable or a string")

            if isinstance(noise_schedule, str):
                if noise_schedule not in SUPPORTED_NOISE_SCHEDULES:
                    raise ValueError(f"Noise schedule {noise_schedule} is not supported.")
                fwd = SUPPORTED_NOISE_SCHEDULES[noise_schedule]["forward"]
            elif isinstance(noise_schedule, dict):
                fwd = noise_schedule["forward"]
            else:
                raise ValueError("noise_schedule must be a dict or a string")
            self.alpha, self.sigma = fwd(self.t_diffusion, **(noise_schedule_params or {}))
            self.logSNR = jnp.log(self.alpha / self.sigma)

    def t_example(self, batch: int):
        return jnp.zeros((batch,), jnp.int32)

    def add_noise(self, rng, x0, t=None, eps=None):
        k_t, k_eps = jax.random.split(rng)
        if t is None:
            t = jax.random.randint(k_t, (x0.shape[0],), 0, self.diffusion_steps)
        if eps is None:
            eps = jax.random.normal(k_eps, x0.shape)
        alpha = at_least_ndim(self.alpha[t], x0.ndim)
        sigma = at_least_ndim(self.sigma[t], x0.ndim)
        xt = alpha * x0 + sigma * eps
        xt = (1.0 - self.fix_mask) * xt + self.fix_mask * x0
        return xt, t, eps

    def _sample_tables(self, sample_step_schedule, sample_steps, warm_level):
        T_eff = (
            int(warm_level * self.diffusion_steps) if warm_level is not None else self.diffusion_steps
        )
        if isinstance(sample_step_schedule, str):
            sched_fn = SUPPORTED_SAMPLING_STEP_SCHEDULE[sample_step_schedule]
        else:
            sched_fn = sample_step_schedule
        sched = sched_fn(T_eff, sample_steps)
        return sched, self.alpha[sched], self.sigma[sched]

    def _forward_level(self, warm_level):
        i = int(warm_level * self.diffusion_steps)
        return self.alpha[i], self.sigma[i]


class ContinuousDiffusionSDE(BaseDiffusionSDE):
    """Continuous-time VP-SDE (reference diffusionsde.py:609-952)."""

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
        epsilon: float = 1e-3,
        noise_schedule: Union[str, Dict[str, Callable]] = "cosine",
        noise_schedule_params: Optional[dict] = None,
        x_max=None,
        x_min=None,
        predict_noise: bool = True,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        super().__init__(
            nn_diffusion, nn_condition, fix_mask, loss_weight, classifier,
            grad_clip_norm, ema_rate, optim_params, epsilon, noise_schedule,
            noise_schedule_params, x_max, x_min, predict_noise, rng, device,
        )
        # cosine alpha hits 0 at t=0.9946 (reference diffusionsde.py:705-708)
        if noise_schedule == "cosine":
            self.t_diffusion = [epsilon, 0.9946]
        else:
            self.t_diffusion = [epsilon, 1.0]
        if isinstance(noise_schedule, str):
            if noise_schedule not in SUPPORTED_NOISE_SCHEDULES:
                raise ValueError(f"Noise schedule {noise_schedule} is not supported.")
            self.noise_schedule_funcs = SUPPORTED_NOISE_SCHEDULES[noise_schedule]
        elif isinstance(noise_schedule, dict):
            self.noise_schedule_funcs = noise_schedule
        else:
            raise ValueError("noise_schedule must be a dict or a string")
        self.noise_schedule_params = noise_schedule_params

    def t_example(self, batch: int):
        return jnp.zeros((batch,), jnp.float32)

    def add_noise(self, rng, x0, t=None, eps=None):
        k_t, k_eps = jax.random.split(rng)
        if t is None:
            t = jax.random.uniform(
                k_t, (x0.shape[0],),
                minval=self.t_diffusion[0], maxval=self.t_diffusion[1],
            )
        if eps is None:
            eps = jax.random.normal(k_eps, x0.shape)
        alpha, sigma = self.noise_schedule_funcs["forward"](
            t, **(self.noise_schedule_params or {})
        )
        alpha = at_least_ndim(alpha, x0.ndim)
        sigma = at_least_ndim(sigma, x0.ndim)
        xt = alpha * x0 + sigma * eps
        xt = (1.0 - self.fix_mask) * xt + self.fix_mask * x0
        return xt, t, eps

    def _sample_tables(self, sample_step_schedule, sample_steps, warm_level):
        if warm_level is not None:
            level = self.epsilon + warm_level * (1.0 - self.epsilon)
            trange = [self.t_diffusion[0], level]
        else:
            trange = self.t_diffusion
        if isinstance(sample_step_schedule, str):
            if not sample_step_schedule.endswith("_continuous"):
                sample_step_schedule = sample_step_schedule + "_continuous"
            sched_fn = SUPPORTED_SAMPLING_STEP_SCHEDULE[sample_step_schedule]
        else:
            sched_fn = sample_step_schedule
        sched = sched_fn(trange, sample_steps)
        alphas, sigmas = self.noise_schedule_funcs["forward"](
            sched, **(self.noise_schedule_params or {})
        )
        return sched, alphas, sigmas

    def _forward_level(self, warm_level):
        level = self.epsilon + warm_level * (1.0 - self.epsilon)
        alpha, sigma = self.noise_schedule_funcs["forward"](
            jnp.asarray([level]), **(self.noise_schedule_params or {})
        )
        return alpha[0], sigma[0]
