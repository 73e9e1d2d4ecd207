"""Continuous-time Consistency Model (training + distillation).

TPU-native re-design of reference
cleandiffuser/diffusion/consistency_model.py:90-428.

- iCT discretization curriculum (CMCurriculumLogger, reference :51-87) runs
  on host, but the per-level tables (sigmas + erf-based sampling pmf) are
  PADDED to the fixed maximum size s1 so every curriculum stage reuses ONE
  compiled training program (the reference resizes numpy arrays per stage).
- Consistency training: pseudo-Huber between adjacent noise levels sharing
  the same eps (reference :292-317).
- Consistency distillation: teacher EDM Euler step m->n, student(x_m)
  matched to EMA-student(x_n), weight 1/(t_m - t_n) (reference :264-290).
- Sampling: 1 evaluation + (steps-1) noise-reinjection iterations compiled
  into one scan (reference :366-428).
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.schedules import karras_sigma_schedule
from ..utils.tensors import at_least_ndim
from ..utils.train_state import ema_update
from .basic import DiffusionModel, bf16_cast, host_constants
from .edm import ContinuousEDM

__all__ = ["ContinuousConsistencyModel", "CMCurriculumLogger"]


def compare_properties(obj1, obj2, properties: List[str]):
    """Names in `properties` whose values differ between the two objects
    (arrays compared by allclose). Distillation-compat check, same contract
    as the reference's helper (consistency_model.py:30-43)."""

    def _differs(a, b):
        if isinstance(a, (jnp.ndarray, np.ndarray)) or isinstance(b, (jnp.ndarray, np.ndarray)):
            return a is None or b is None or not np.allclose(np.asarray(a), np.asarray(b))
        return a != b

    return [p for p in properties
            if _differs(getattr(obj1, p), getattr(obj2, p))]


def pseudo_huber_loss(source, target, c: float = 0.0):
    """sqrt(err^2 + c^2) - c — the iCT loss; c=0 degenerates to |err|."""
    return jnp.sqrt((source - target) ** 2 + c**2) - c


class CMCurriculumLogger:
    """iCT curriculum N(k) + erf-based noise-level pmf (reference :51-87).

    Tables are padded to fixed length s1 (pmf zero beyond Nk) so the jitted
    training step never recompiles across curriculum stages.
    """

    def __init__(
        self,
        s0: int = 10,
        s1: int = 1280,
        curriculum_cycle: int = 100_000,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        P_mean: float = -1.1,
        P_std: float = 2.0,
    ):
        self.Kprime = np.ceil(curriculum_cycle / (np.log2(np.ceil(s1 / s0)) + 1))
        self.Nk = s0
        self.s0, self.s1 = s0, s1
        self.curriculum_cycle = curriculum_cycle
        self.sigma_min, self.sigma_max, self.rho = sigma_min, sigma_max, rho
        self.P_mean, self.P_std = P_mean, P_std
        self.ceil_k_div_Kprime, self.k = None, None
        self.update_k(0)

    def update_k(self, k):
        self.k = k
        if np.ceil(k / self.Kprime) != self.ceil_k_div_Kprime:
            self.ceil_k_div_Kprime = np.ceil(k / self.Kprime)
            self.Nk = int(min(self.s0 * (2**self.ceil_k_div_Kprime), self.s1))

            sig = (
                self.sigma_min ** (1 / self.rho)
                + np.arange(self.Nk + 1, dtype=np.float32)
                / self.Nk
                * (self.sigma_max ** (1 / self.rho) - self.sigma_min ** (1 / self.rho))
            ) ** self.rho
            from math import erf

            z = (np.log(sig) - self.P_mean) / (self.P_std * math.sqrt(2.0))
            erfv = np.vectorize(erf)(z)
            p = erfv[1:] - erfv[:-1]
            p = p / p.sum()

            # padded device tables (fixed shapes: s1+1 and s1)
            sig_pad = np.full((self.s1 + 1,), sig[-1], np.float32)
            sig_pad[: self.Nk + 1] = sig
            p_pad = np.zeros((self.s1,), np.float32)
            p_pad[: self.Nk] = p
            self.sigmas_padded = jnp.asarray(sig_pad)
            self.p_padded = jnp.asarray(p_pad)

    def incremental_update_k(self):
        self.update_k(self.k + 1)

    @property
    def curriculum_process(self):
        return (self.k % self.curriculum_cycle) / self.curriculum_cycle


class ContinuousConsistencyModel(DiffusionModel):
    def __init__(
        self,
        nn_diffusion,
        nn_condition=None,
        fix_mask=None,
        loss_weight=None,
        classifier=None,
        grad_clip_norm: Optional[float] = None,
        ema_rate: float = 0.9999,
        optim_params: Optional[dict] = None,
        s0: int = 10,
        s1: int = 1280,
        data_dim: Optional[int] = None,
        P_mean: float = -1.1,
        P_std: float = 2.0,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        sigma_data: float = 0.5,
        rho: float = 7.0,
        curriculum_cycle: int = 100_000,
        x_max=None,
        x_min=None,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        assert classifier is None, "Consistency Model does not support classifier guidance."
        super().__init__(
            nn_diffusion, nn_condition, fix_mask, loss_weight, None,
            grad_clip_norm, 0, ema_rate, optim_params, rng, device,
        )
        self.cur_logger = CMCurriculumLogger(
            s0, s1, curriculum_cycle, sigma_min, sigma_max, rho, P_mean, P_std
        )
        self.pseudo_huber_constant = 0.01 if data_dim is None else 0.00054 * math.sqrt(data_dim)
        self.rho = rho
        self.sigma_data, self.sigma_max, self.sigma_min = sigma_data, sigma_max, sigma_min
        with host_constants():
            self.x_max = jnp.asarray(x_max, jnp.float32) if x_max is not None else None
            self.x_min = jnp.asarray(x_min, jnp.float32) if x_min is not None else None

        self.edm: Optional[ContinuousEDM] = None
        self.distillation_sigmas, self.distillation_N = None, None

    @property
    def supported_solvers(self):
        return ["none"]

    @property
    def clip_pred(self):
        return (self.x_max is not None) or (self.x_min is not None)

    def t_example(self, batch: int):
        return jnp.ones((batch,), jnp.float32)

    def training_noise_schedule(self, N: int):
        return karras_sigma_schedule(self.sigma_min, self.sigma_max, self.rho, N)

    def prepare_distillation(self, edm: ContinuousEDM, distillation_N: int = 18):
        """Copy a trained EDM's weights and set up the teacher
        (reference :214-225)."""
        checklist = ["sigma_data", "sigma_max", "sigma_min", "rho", "x_max", "x_min"]
        differences = compare_properties(self, edm, checklist)
        if differences:
            raise ValueError(
                f"Properties {differences} differ between the EDM and the Consistency Model."
            )
        assert edm.state is not None, "EDM must be initialized/trained first."
        self.edm = edm
        # adopt the teacher's weights as the student init
        import jax.tree_util as jtu

        if self.state is None:
            self.state = edm.state.replace(
                params=jtu.tree_map(jnp.copy, edm.state.params),
                ema_params=jtu.tree_map(jnp.copy, edm.state.ema_params),
                opt_state=self.tx.init(edm.state.params),
                step=jnp.zeros((), jnp.int32),
            )
        else:
            self.state = self.state.replace(
                params=jtu.tree_map(jnp.copy, edm.state.params),
                ema_params=jtu.tree_map(jnp.copy, edm.state.ema_params),
            )
        self.distillation_N = distillation_N
        self.distillation_sigmas = self.training_noise_schedule(distillation_N)

    # ---------------- CM pre-conditioning (reference :241-262) ----------------
    def c_skip(self, sigma):
        return self.sigma_data**2 / (self.sigma_data**2 + (sigma - self.sigma_min) ** 2)

    def c_out(self, sigma):
        return (sigma - self.sigma_min) * self.sigma_data / jnp.sqrt(self.sigma_data**2 + sigma**2)

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(self.sigma_data**2 + sigma**2)

    def c_noise(self, sigma):
        return 0.25 * jnp.log(sigma)

    def f(self, params, x, t, emb=None, train=False, rng=None):
        cs = at_least_ndim(self.c_skip(t), x.ndim)
        co = at_least_ndim(self.c_out(t), x.ndim)
        ci = at_least_ndim(self.c_in(t), x.ndim)
        cn = self.c_noise(t)
        pred = cs * x + co * self.apply_diffusion(params, ci * x, cn, emb, train=train, rng=rng)
        if self.clip_pred:
            lo = self.x_min if self.x_min is not None else -jnp.inf
            hi = self.x_max if self.x_max is not None else jnp.inf
            pred = jnp.clip(pred, lo, hi)
        return pred

    # ---------------- Losses ----------------
    def _training_loss(self, params, rng, x0, condition, sigmas_padded, p_padded):
        k_idx, k_eps, k_cond, k_drop = jax.random.split(rng, 4)
        b = x0.shape[0]
        logits = jnp.log(jnp.maximum(p_padded, 1e-37))
        idx = jax.random.categorical(k_idx, logits, shape=(b,))
        sigma_n = sigmas_padded[idx]
        sigma_m = sigmas_padded[idx + 1]
        eps = jax.random.normal(k_eps, x0.shape)
        x_n = x0 + at_least_ndim(sigma_n, x0.ndim) * eps
        x_m = x0 + at_least_ndim(sigma_m, x0.ndim) * eps

        emb = self.apply_condition(params, condition, train=True, rng=k_cond)
        pred_x_m = self.f(params, x_m, sigma_m, emb, train=True, rng=k_drop)
        emb_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, emb) if emb is not None else None
        pred_x_n = jax.lax.stop_gradient(self.f(params, x_n, sigma_n, emb_sg))

        loss = pseudo_huber_loss(pred_x_m, pred_x_n, self.pseudo_huber_constant)
        unweighted = loss * (1.0 - self.fix_mask) * self.loss_weight
        cm_weight = at_least_ndim(1.0 / (sigma_m - sigma_n), x0.ndim)
        return (unweighted * cm_weight).mean(), {"unweighted_loss": unweighted.mean()}

    def _distillation_loss(self, params, ema_params, teacher_params, rng, x0, condition):
        k_t, k_eps, k_cond = jax.random.split(rng, 3)
        b = x0.shape[0]
        idx = jax.random.randint(k_t, (b,), 0, self.distillation_N)
        t_m = self.distillation_sigmas[idx + 1]
        t_n = self.distillation_sigmas[idx]
        x_m, t_m, _ = self.edm.add_noise(k_eps, x0, t_m)

        # teacher Euler step m -> n (no grad)
        emb_teacher = self.edm.apply_condition(teacher_params, condition, train=False)
        pred = self.edm.D(teacher_params, x_m, t_m, emb_teacher)
        dot_x = (x_m - pred) / at_least_ndim(t_m, x_m.ndim)
        delta_t = at_least_ndim(t_m - t_n, x_m.ndim)
        x_n = x_m - dot_x * delta_t
        x_n = x_n * (1.0 - self.fix_mask) + x0 * self.fix_mask
        x_n = jax.lax.stop_gradient(x_n)

        emb = self.apply_condition(params, condition, train=False)
        pred_x_m = self.f(params, x_m, t_m, emb)
        emb_ema = self.apply_condition(ema_params, condition, train=False)
        pred_x_n = jax.lax.stop_gradient(self.f(ema_params, x_n, t_n, emb_ema))

        loss = (
            (pred_x_n - pred_x_m) ** 2
            * (1.0 - self.fix_mask)
            * self.loss_weight
            * at_least_ndim(1.0 / (t_m - t_n), pred_x_n.ndim)
        )
        return loss.mean(), {}

    # ---------------- Update ----------------
    def _make_update_fn(self, loss_type: str, update_ema: bool):
        def update_fn(state, x0, condition, sigmas_padded, p_padded, teacher_params):
            rng, sub = jax.random.split(state.rng)

            def loss_of(params):
                if loss_type == "training":
                    return self._training_loss(params, sub, x0, condition, sigmas_padded, p_padded)
                return self._distillation_loss(
                    params, state.ema_params, teacher_params, sub, x0, condition
                )

            (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = (
                ema_update(params, state.ema_params, self.ema_rate)
                if update_ema
                else state.ema_params
            )
            new_state = state.replace(
                params=params, ema_params=ema_params, opt_state=opt_state,
                step=state.step + 1, rng=rng,
            )
            return new_state, {"loss": loss, **aux}

        return jax.jit(update_fn, donate_argnums=0)

    def update(self, x0, condition=None, update_ema: bool = True, loss_type: str = "training", **kwargs):
        assert loss_type in ("training", "distillation")
        if loss_type == "distillation":
            assert self.edm is not None, "Call `prepare_distillation` before distillation."
        self._ensure_init(x0, condition)
        key = ("update", loss_type, update_ema, condition is None)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._make_update_fn(loss_type, update_ema)
        teacher_params = self.edm.state.ema_params if self.edm is not None else None
        self.state, log = self._fn_cache[key](
            self.state,
            jnp.asarray(x0),
            condition,
            self.cur_logger.sigmas_padded,
            self.cur_logger.p_padded,
            teacher_params,
        )
        if loss_type == "training":
            self.cur_logger.incremental_update_k()
        # device scalars: see DiffusionModel.update (no per-step host sync)
        return log

    # ---------------- Sampling ----------------
    def build_sample_fn(self, sample_steps: int = 5, cfg_mode: str = "uncond",
                        diffusion_x_sampling_steps: int = 0):
        with host_constants():  # tables embed as constants: host-backed
            sigmas = karras_sigma_schedule(self.sigma_min, self.sigma_max, self.rho, sample_steps)
            loop = list(range(1, sample_steps)) + [1] * diffusion_x_sampling_steps
            idxs = jnp.asarray(sorted(loop, reverse=True), jnp.int32) if loop else jnp.zeros((0,), jnp.int32)

        def fn(
            params, cls_params, rng, prior,
            condition_cfg=None, mask_cfg=None, condition_cg=None,
            w_cfg: float = 0.0, w_cg: float = 0.0, temperature: float = 1.0,
            warm_reference=None,
        ):
            del cls_params, condition_cg, w_cg, w_cfg, warm_reference
            if self.bf16_sampling:  # pre-cast once, hoisted out of the scan
                params = {**params, "diffusion": bf16_cast(params["diffusion"])}
            k_init, k_scan = jax.random.split(rng)
            xt = jax.random.normal(k_init, prior.shape) * self.sigma_max * temperature
            xt = xt * (1.0 - self.fix_mask) + prior * self.fix_mask

            emb = self.apply_condition(params, condition_cfg, mask=mask_cfg, train=False)

            t = jnp.full((prior.shape[0],), sigmas[-1])
            pred_x = self.f(params, xt, t, emb)
            pred_x = pred_x * (1.0 - self.fix_mask) + prior * self.fix_mask

            def body(carry, i):
                pred_x, rng = carry
                rng, k = jax.random.split(rng)
                t = jnp.full((prior.shape[0],), sigmas[i])
                noise_scale = jnp.sqrt(
                    jnp.maximum(at_least_ndim(t, pred_x.ndim) ** 2 - self.sigma_min**2, 0.0)
                )
                xt = pred_x + noise_scale * jax.random.normal(k, pred_x.shape)
                px = self.f(params, xt, t, emb)
                px = px * (1.0 - self.fix_mask) + prior * self.fix_mask
                return (px, rng), None

            (pred_x, _), _ = jax.lax.scan(body, (pred_x, k_scan), idxs)
            return pred_x, {}

        return fn

    def sample(
        self,
        prior,
        solver: str = "none",
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
        requires_grad: bool = False,
        preserve_history: bool = False,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ):
        assert w_cg == 0.0 and condition_cg is None, (
            "Consistency Distillation does not support classifier guidance."
        )
        del n_samples, solver
        prior = jnp.asarray(prior)
        self._ensure_init(prior, condition_cfg)
        key = ("sample", sample_steps, diffusion_x_sampling_steps, use_ema,
               condition_cfg is None)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                self.build_sample_fn(sample_steps, "uncond", diffusion_x_sampling_steps)
            )
        params = self.state.ema_params if use_ema else self.state.params
        rng = rng if rng is not None else self.next_sample_rng()
        x0, log = self._fn_cache[key](
            params, None, rng, prior, condition_cfg, mask_cfg, None,
            float(w_cfg), 0.0, float(temperature), None,
        )
        log = dict(log)
        log.setdefault("sample_history", None)
        log.setdefault("log_p", None)
        return x0, log
