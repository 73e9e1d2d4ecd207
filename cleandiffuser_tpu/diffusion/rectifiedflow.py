"""Rectified-flow engines with fused Euler lax.scan sampler.

TPU-native re-design of reference cleandiffuser/diffusion/rectifiedflow.py
(DiscreteRectifiedFlow :16-337, ContinuousRectifiedFlow :340-630). Straight
flow matching between an arbitrary source x1 (default Gaussian) and the data
x0: xt = t*x1 + (1-t)*x0, v-target = x0 - x1, Euler-only sampling with
inline CFG. No classifier guidance (asserted, reference :104). Supports
reflow (retraining on self-generated (x0, x1) pairs — DiffuserLite) because
`update`/`loss_fn` accept an explicit x1.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..utils.schedules import SUPPORTED_DISCRETIZATIONS, SUPPORTED_SAMPLING_STEP_SCHEDULE
from ..utils.tensors import at_least_ndim
from .basic import DiffusionModel, bf16_cast, host_constants

__all__ = ["DiscreteRectifiedFlow", "ContinuousRectifiedFlow"]


class _BaseRectifiedFlow(DiffusionModel):
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
        x_max=None,
        x_min=None,
        rng: Union[int, jax.Array] = 0,
        device=None,
    ):
        assert classifier is None, "Rectified Flow does not support classifier-guidance."
        super().__init__(
            nn_diffusion, nn_condition, fix_mask, loss_weight, None,
            grad_clip_norm, 0, ema_rate, optim_params, rng, device,
        )
        with host_constants():
            self.x_max = jnp.asarray(x_max, jnp.float32) if x_max is not None else None
            self.x_min = jnp.asarray(x_min, jnp.float32) if x_min is not None else None

    @property
    def supported_solvers(self):
        return ["euler"]

    @property
    def clip_pred(self):
        return (self.x_max is not None) or (self.x_min is not None)

    # engine-specific: (t_net, t_cont) sampled for training
    def _sample_t(self, rng, batch):
        raise NotImplementedError

    def loss_fn(self, params, rng, x0, condition, weighted_regression=None, x1=None):
        k_t, k_x1, k_cond, k_drop = jax.random.split(rng, 4)
        if x1 is None:
            x1 = jax.random.normal(k_x1, x0.shape)
        t_net, t_c = self._sample_t(k_t, x0.shape[0])
        t_c = at_least_ndim(t_c, x0.ndim)
        xt = t_c * x1 + (1 - t_c) * x0
        xt = xt * (1.0 - self.fix_mask) + x0 * self.fix_mask
        emb = self.apply_condition(params, condition, train=True, rng=k_cond)
        pred = self.apply_diffusion(params, xt, t_net, emb, train=True, rng=k_drop)
        loss = (pred - (x0 - x1)) ** 2
        loss = loss * self.loss_weight * (1.0 - self.fix_mask)
        if weighted_regression is not None:
            loss = loss * weighted_regression[..., None]
        return loss.mean()

    def _make_update_fn(self, update_ema: bool, has_wrt: bool, has_x1: bool = False):
        import optax

        def update_fn(state, x0, condition, wrt, x1):
            rng, sub = jax.random.split(state.rng)

            def loss_of(params):
                return self.loss_fn(
                    params, sub, x0, condition,
                    wrt if has_wrt else None, x1 if has_x1 else None,
                )

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            from ..utils.train_state import ema_update

            ema_params = (
                ema_update(params, state.ema_params, self.ema_rate)
                if update_ema
                else state.ema_params
            )
            return (
                state.replace(
                    params=params, ema_params=ema_params, opt_state=opt_state,
                    step=state.step + 1, rng=rng,
                ),
                {"loss": loss},
            )

        return jax.jit(update_fn, donate_argnums=0)

    def update(self, x0, condition=None, update_ema: bool = True, x1=None, **kwargs):
        self._ensure_init(x0, condition)
        wrt = kwargs.get("weighted_regression_tensor", None)
        key = ("update", update_ema, wrt is not None, x1 is not None, condition is None)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._make_update_fn(update_ema, wrt is not None, x1 is not None)
        self.state, log = self._fn_cache[key](self.state, jnp.asarray(x0), condition, wrt, x1)
        # device scalars: see DiffusionModel.update (no per-step host sync)
        return log

    # ---------------- sampling ----------------
    def _sample_times(self, sample_step_schedule: str, sample_steps: int, warm_level):
        """(ts_net, ts_cont): (steps+1,) network times and continuous times."""
        raise NotImplementedError

    def _warm_x1(self, rng, prior, warm_reference, warm_level):
        raise NotImplementedError

    def build_sample_fn(
        self,
        sample_steps: int = 5,
        sample_step_schedule: str = "uniform",
        cfg_mode: str = "uncond",
        diffusion_x_sampling_steps: int = 0,
        warm_start: bool = False,
        warm_start_forward_level: float = 0.3,
        preserve_history: bool = False,
        has_x1: bool = False,
    ):
        with host_constants():  # tables embed as constants: host-backed
            ts_net, ts_c = self._sample_times(
                sample_step_schedule, sample_steps, warm_start_forward_level if warm_start else None
            )
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
            warm_reference=None, x1=None,
        ):
            del cls_params, condition_cg, w_cg
            if self.bf16_sampling:  # pre-cast once, hoisted out of the scan
                params = {**params, "diffusion": bf16_cast(params["diffusion"])}
            k_init, _ = jax.random.split(rng)
            if warm_start and warm_reference is not None:
                x1_eff = self._warm_x1(k_init, prior, warm_reference, warm_start_forward_level)
            elif has_x1 and x1 is not None:
                x1_eff = x1
            else:
                x1_eff = jax.random.normal(k_init, prior.shape) * temperature

            xt = x1_eff * (1.0 - self.fix_mask) + prior * self.fix_mask

            emb = self.apply_condition(params, condition_cfg, mask=mask_cfg, train=False)

            def body(carry, i):
                xt = carry
                t = jnp.full((prior.shape[0],), ts_net[i], dtype=ts_net.dtype)
                delta_t = ts_c[i] - ts_c[i - 1]
                b = xt.shape[0]
                if cfg_mode == "mix":
                    xt2 = jnp.concatenate([xt, xt], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    emb2 = jax.tree_util.tree_map(
                        lambda e: jnp.concatenate([e, jnp.zeros_like(e)], axis=0), emb
                    )
                    vel_all = self.apply_diffusion(params, xt2, t2, emb2)
                    vel = w_cfg * vel_all[:b] + (1 - w_cfg) * vel_all[b:]
                elif cfg_mode == "cond":
                    vel = self.apply_diffusion(params, xt, t, emb)
                else:
                    vel = self.apply_diffusion(params, xt, t, None)
                x_next = xt + delta_t * vel
                x_next = x_next * (1.0 - self.fix_mask) + prior * self.fix_mask
                out = x_next if preserve_history else None
                return x_next, out

            xt, history = jax.lax.scan(body, xt, idxs)

            log = {}
            if preserve_history:
                log["sample_history"] = jnp.swapaxes(history, 0, 1)
            if self.clip_pred:
                lo = self.x_min if self.x_min is not None else -jnp.inf
                hi = self.x_max if self.x_max is not None else jnp.inf
                xt = jnp.clip(xt, lo, hi)
            return xt, log

        return fn

    def sample(
        self,
        prior,
        x1=None,
        solver: str = "euler",
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
        assert w_cg == 0.0 and condition_cg is None, (
            "Rectified Flow does not support classifier-guidance."
        )
        del n_samples, solver
        prior = jnp.asarray(prior)
        self._ensure_init(prior, condition_cfg)

        if w_cfg != 0.0 and w_cfg != 1.0 and condition_cfg is not None:
            cfg_mode = "mix"
        elif w_cfg == 0.0 or condition_cfg is None:
            cfg_mode = "uncond"
        else:
            cfg_mode = "cond"
        warm = warm_start_reference is not None
        has_x1 = x1 is not None

        key = (
            "sample", sample_steps, sample_step_schedule, cfg_mode,
            diffusion_x_sampling_steps, warm,
            warm_start_forward_level if warm else None, preserve_history, use_ema, has_x1,
        )
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                self.build_sample_fn(
                    sample_steps=sample_steps,
                    sample_step_schedule=sample_step_schedule,
                    cfg_mode=cfg_mode,
                    diffusion_x_sampling_steps=diffusion_x_sampling_steps,
                    warm_start=warm,
                    warm_start_forward_level=warm_start_forward_level,
                    preserve_history=preserve_history,
                    has_x1=has_x1,
                )
            )
        params = self.state.ema_params if use_ema else self.state.params
        rng = rng if rng is not None else self.next_sample_rng()
        x0, log = self._fn_cache[key](
            params, None, rng, prior, condition_cfg, mask_cfg, None,
            float(w_cfg), 0.0, float(temperature), warm_start_reference, x1,
        )
        log = dict(log)
        log.setdefault("sample_history", None)
        log.setdefault("log_p", None)
        return x0, log


class DiscreteRectifiedFlow(_BaseRectifiedFlow):
    """Discrete-time RF: t on a T-grid over [0, 1]
    (reference rectifiedflow.py:16-337)."""

    def __init__(self, *args, diffusion_steps: int = 1000,
                 discretization: Union[str, Callable] = "uniform", **kwargs):
        super().__init__(*args, **kwargs)
        self.diffusion_steps = diffusion_steps
        if isinstance(discretization, str):
            disc_fn = SUPPORTED_DISCRETIZATIONS.get(
                discretization, SUPPORTED_DISCRETIZATIONS["uniform"]
            )
            self.t_diffusion = disc_fn(diffusion_steps, 0.0)
        else:
            self.t_diffusion = discretization(diffusion_steps, 0.0)

    def t_example(self, batch: int):
        return jnp.zeros((batch,), jnp.int32)

    def _sample_t(self, rng, batch):
        t = jax.random.randint(rng, (batch,), 0, self.diffusion_steps)
        return t, self.t_diffusion[t]

    def _sample_times(self, sample_step_schedule, sample_steps, warm_level):
        T_eff = (
            int(warm_level * self.diffusion_steps) if warm_level is not None else self.diffusion_steps
        )
        if isinstance(sample_step_schedule, str):
            sched_fn = SUPPORTED_SAMPLING_STEP_SCHEDULE[sample_step_schedule]
        else:
            sched_fn = sample_step_schedule
        sched = sched_fn(T_eff, sample_steps)
        return sched, self.t_diffusion[sched]

    def _warm_x1(self, rng, prior, warm_reference, warm_level):
        i = int(warm_level * self.diffusion_steps)
        t_c = self.t_diffusion[i]
        return jax.random.normal(rng, prior.shape) * t_c + warm_reference * (1 - t_c)


class ContinuousRectifiedFlow(_BaseRectifiedFlow):
    """Continuous-time RF: t ~ U[0, 1] (reference rectifiedflow.py:340-630)."""

    def t_example(self, batch: int):
        return jnp.zeros((batch,), jnp.float32)

    def _sample_t(self, rng, batch):
        t = jax.random.uniform(rng, (batch,))
        return t, t

    def _sample_times(self, sample_step_schedule, sample_steps, warm_level):
        final_t = warm_level if warm_level is not None else 1.0
        if isinstance(sample_step_schedule, str):
            if not sample_step_schedule.endswith("_continuous"):
                sample_step_schedule = sample_step_schedule + "_continuous"
            sched_fn = SUPPORTED_SAMPLING_STEP_SCHEDULE[sample_step_schedule]
        else:
            sched_fn = sample_step_schedule
        sched = sched_fn([0.0, final_t], sample_steps)
        return sched, sched

    def _warm_x1(self, rng, prior, warm_reference, warm_level):
        return jax.random.normal(rng, prior.shape) * warm_level + warm_reference * (
            1 - warm_level
        )
