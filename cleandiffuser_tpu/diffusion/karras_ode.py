"""Generalized Karras probability-flow ODE engines: VE / VP / iDDPM-DDIM.

TPU-native re-design of the reference's legacy EDM-architecture family
(reference cleandiffuser/diffusion/edm.py:30-160 `EDMArchetecture` and its
subclasses veode.py:13, vpode.py:13, edmddim.py:12). Those engines express
every diffusion parameterization as the Karras et al. 2022 (Table 1) ODE

    dx/dt = [s'(t)/s(t) + sigma'(t)/sigma(t)] x
            - [sigma'(t)/sigma(t) * s(t)] D(x / s(t); sigma(t))

integrated over a per-parameterization (t_i, sigma_i, scale_i) grid with a
per-parameterization preconditioning (c_skip/c_out/c_in/c_noise), loss
weighting, and training-noise distribution.

Here the whole sampler is ONE `lax.scan` over static integration tables
(computed once at trace time), with Euler or Heun updates, CFG doubled-batch,
classifier guidance, and fix_mask support — the same fused-program design as
the exported ContinuousEDM (edm.py), which remains the recommended engine.

Deviation from the reference (documented): the legacy torch loop indexes
`t_s[i + 1]` for `i = N - 1` with only N grid points, which faults when
actually run (the engines are unexported and unused upstream). The tables
here carry N + 1 grid points, descending in sigma, so the loop is well-posed
for all three; a trace-time assert pins the invariant.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tensors import at_least_ndim
from .edm import ContinuousEDM

__all__ = ["KarrasODE", "VEODE", "VPODE", "EDMDDIM"]


class KarrasODE(ContinuousEDM):
    """Base: subclasses define the parameterization via
    `ode_tables(sample_steps)`, the `c_*` preconditioners, `loss_weighting`,
    and `sample_noise_distribution`.
    """

    @property
    def supported_solvers(self):
        return ["euler", "heun"]

    # ---- parameterization hooks (defaults = VE-style identity scale) ----
    def ode_tables(self, sample_steps: int):
        """(t_s, sigma_s, scale_s) numpy arrays of length sample_steps + 1,
        index 0 = highest noise."""
        raise NotImplementedError

    def loss_weighting(self, sigma):
        return 1.0 / (sigma**2)

    def sample_noise_distribution(self, rng, n: int):
        raise NotImplementedError

    # ---- training (x_t = x_0 + sigma * eps, unscaled; legacy edm.py:77-96) ----
    def add_noise(self, rng, x0, t=None, eps=None):
        k_t, k_eps = jax.random.split(rng)
        if t is None:
            t = self.sample_noise_distribution(k_t, x0.shape[0])
        if eps is None:
            eps = jax.random.normal(k_eps, x0.shape)
        xt = x0 + at_least_ndim(t, x0.ndim) * eps
        xt = (1.0 - self.fix_mask) * xt + self.fix_mask * x0
        return xt, t, eps

    def loss_fn(self, params, rng, x0, condition, weighted_regression=None):
        k_noise, k_cond, k_drop = jax.random.split(rng, 3)
        xt, t, _ = self.add_noise(k_noise, x0)
        emb = self.apply_condition(params, condition, train=True, rng=k_cond)
        pred = self.D(params, xt, t, emb, train=True, rng=k_drop)
        loss = (pred - x0) ** 2
        w = at_least_ndim(self.loss_weighting(t), x0.ndim)
        loss = loss * self.loss_weight * (1.0 - self.fix_mask) * w
        if weighted_regression is not None:
            loss = loss * weighted_regression[..., None]
        return loss.mean()

    def update_classifier(self, x0, condition):
        rng = self.next_sample_rng()
        xt, t, _ = self.add_noise(rng, jnp.asarray(x0))
        return self.classifier.update(xt, self.c_noise(t), condition)

    # ---- sampling: fused scan over the static ODE tables ----
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
        assert not warm_start, "warm-start is a DiffusionSDE/EDM feature"
        if final_logp is None:
            final_logp = self.classifier is not None

        N = sample_steps
        t_np, sigma_np, scale_np = self.ode_tables(N)
        assert len(t_np) == N + 1 and np.all(np.diff(sigma_np) < 0), (
            "tables must be descending in sigma with N + 1 points")
        t_s = jnp.asarray(t_np, jnp.float32)
        sigma_s = jnp.asarray(sigma_np, jnp.float32)
        scale_s = jnp.asarray(scale_np, jnp.float32)
        # d sigma/dt and d scale/dt via the closed forms baked into the tables
        x_w_np, D_w_np = self.ode_weights(t_np, sigma_np, scale_np)
        x_w = jnp.asarray(x_w_np, jnp.float32)
        D_w = jnp.asarray(D_w_np, jnp.float32)
        # Heun 2nd-order correction validity per step (legacy edm.py:257)
        heun_ok = jnp.asarray(
            (np.arange(N) != N - 1) & (sigma_np[1:] > 0.005), jnp.bool_)
        # diffusion-x: extra refinement steps repeating the final interval
        idxs = jnp.concatenate([
            jnp.arange(N, dtype=jnp.int32),
            jnp.full((diffusion_x_sampling_steps,), N - 1, jnp.int32),
        ])

        def dot_x(params, cls_params, x, i, emb, condition_cg, w_cfg, w_cg, b):
            sigma = jnp.full((b,), sigma_s[i])
            unscale = (1.0 / scale_s[i]) * (1.0 - self.fix_mask) + self.fix_mask
            xin = x * unscale
            if cfg_mode == "mix":
                x2 = jnp.concatenate([xin, xin], axis=0)
                s2 = jnp.concatenate([sigma, sigma], axis=0)
                emb2 = jax.tree_util.tree_map(
                    lambda e: jnp.concatenate([e, jnp.zeros_like(e)], axis=0), emb)
                D_all = self.D(params, x2, s2, emb2)
                D = w_cfg * D_all[:b] + (1.0 - w_cfg) * D_all[b:]
            elif cfg_mode == "cond":
                D = self.D(params, xin, sigma, emb)
            else:
                D = self.D(params, xin, sigma, None)
            if use_cg:
                _, grad = self.classifier.gradients(
                    cls_params, xin, self.c_noise(sigma), condition_cg)
                D = D + w_cg * scale_s[i] * at_least_ndim(sigma, D.ndim) ** 2 * grad
            if self.clip_pred:
                lo = self.x_min if self.x_min is not None else -jnp.inf
                hi = self.x_max if self.x_max is not None else jnp.inf
                D = jnp.clip(D, lo, hi)
            d = x_w[i] * x - D_w[i] * D
            return d * (1.0 - self.fix_mask)

        def fn(
            params, cls_params, rng, prior,
            condition_cfg=None, mask_cfg=None, condition_cg=None,
            w_cfg: float = 0.0, w_cg: float = 0.0, temperature: float = 1.0,
            warm_reference=None,
        ):
            del warm_reference
            b = prior.shape[0]
            k_init, _ = jax.random.split(rng)
            xt = (jax.random.normal(k_init, prior.shape)
                  * sigma_s[0] * scale_s[0] * temperature)
            xt = xt * (1.0 - self.fix_mask) + prior * self.fix_mask
            emb = self.apply_condition(params, condition_cfg, mask=mask_cfg,
                                       train=False)

            def body(xt, i):
                d1 = dot_x(params, cls_params, xt, i, emb, condition_cg,
                           w_cfg, w_cg, b)
                delta_t = t_s[i] - t_s[i + 1]
                x_next = xt - d1 * delta_t
                x_next = x_next * (1.0 - self.fix_mask) + prior * self.fix_mask
                if solver == "heun":
                    d2 = dot_x(params, cls_params, x_next, i + 1, emb,
                               condition_cg, w_cfg, w_cg, b)
                    x_heun = xt - (d1 + d2) / 2.0 * delta_t
                    x_heun = x_heun * (1.0 - self.fix_mask) + prior * self.fix_mask
                    x_next = jnp.where(heun_ok[i], x_heun, x_next)
                out = x_next if preserve_history else None
                return x_next, out

            xt, history = jax.lax.scan(body, xt, idxs)

            log = {}
            if preserve_history:
                log["sample_history"] = jnp.swapaxes(history, 0, 1)
            if final_logp and self.classifier is not None:
                t0 = jnp.full((b,), sigma_s[-1])
                log["log_p"] = self.classifier.logp(
                    cls_params, xt, self.c_noise(t0), condition_cg)
            if self.clip_pred:
                lo = self.x_min if self.x_min is not None else -jnp.inf
                hi = self.x_max if self.x_max is not None else jnp.inf
                xt = jnp.clip(xt, lo, hi)
            return xt, log

        return fn

    def ode_weights(self, t_s, sigma_s, scale_s):
        """(x_weight_i, D_weight_i) numpy arrays from the parameterization's
        closed-form dot_sigma/dot_scale (legacy edm.py:50-51)."""
        raise NotImplementedError


# ---------------------------------------------------------------------------
class VEODE(KarrasODE):
    """Variance-exploding ODE (reference veode.py:13-73): geometric sigma
    grid over t = sigma^2, identity scale, F-prediction with c_out = sigma."""

    def __init__(self, *args, sigma_min: float = 0.02, sigma_max: float = 100.0,
                 **kwargs):
        super().__init__(*args, sigma_min=sigma_min, sigma_max=sigma_max,
                         **kwargs)

    def c_skip(self, sigma):
        return jnp.ones_like(sigma)

    def c_out(self, sigma):
        return sigma

    def c_in(self, sigma):
        return jnp.ones_like(sigma)

    def c_noise(self, sigma):
        return jnp.log(0.5 * sigma)

    def sample_noise_distribution(self, rng, n: int):
        u = jax.random.uniform(rng, (n,))
        return jnp.exp(u * np.log(self.sigma_max / self.sigma_min)
                       + np.log(self.sigma_min))

    def ode_tables(self, N: int):
        i = np.arange(N + 1)
        sigma = self.sigma_max * (self.sigma_min / self.sigma_max) ** (i / N)
        return sigma**2, sigma, np.ones_like(sigma)

    def ode_weights(self, t_s, sigma_s, scale_s):
        dot_sigma = 1.0 / (2.0 * sigma_s)  # t = sigma^2
        w = dot_sigma / sigma_s
        return w, w


class VPODE(KarrasODE):
    """Variance-preserving ODE (reference vpode.py:13-78): linear-beta VP
    schedule over t in [eps_s, 1] with shrinking scale 1/sqrt(1+sigma^2)."""

    def __init__(self, *args, beta_min: float = 0.1, beta_max: float = 20.0,
                 eps_s: float = 1e-3, eps_t: float = 1e-5,
                 diffusion_steps: int = 1000, **kwargs):
        self.beta_min, self.beta_d = beta_min, beta_max - beta_min
        self.eps_s, self.eps_t = eps_s, eps_t
        super().__init__(*args, **kwargs)
        self.diffusion_steps = diffusion_steps
        self.t_diffusion = [eps_t, 1.0]

    def _sigma_of_t(self, t):
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def c_skip(self, sigma):
        return jnp.ones_like(sigma)

    def c_out(self, sigma):
        return -sigma

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(1.0 + sigma**2)

    def c_noise(self, sigma):
        # invert sigma -> t, scaled to the discrete timestep range
        # (reference vpode.py:70-72; kept float for positional embeddings)
        log_scale = -0.5 * jnp.log(1.0 + sigma**2)
        t = (jnp.sqrt(self.beta_min**2 - 4.0 * self.beta_d * log_scale)
             - self.beta_min) / self.beta_d
        return (self.diffusion_steps - 1) * t

    def sample_noise_distribution(self, rng, n: int):
        t = jax.random.uniform(rng, (n,)) * (1.0 - self.eps_t) + self.eps_t
        return self._sigma_of_t(t)

    def ode_tables(self, N: int):
        t = 1.0 + np.arange(N + 1) / N * (self.eps_s - 1.0)  # 1 -> eps_s
        sigma = np.sqrt(np.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)
        scale = 1.0 / np.sqrt(1.0 + sigma**2)
        return t, sigma, scale

    def ode_weights(self, t_s, sigma_s, scale_s):
        dot_sigma = (0.5 * (sigma_s**2 + 1.0)
                     * (self.beta_d * t_s + self.beta_min) / sigma_s)
        dot_scale = -sigma_s / (1.0 + sigma_s**2) ** 1.5 * dot_sigma
        x_w = dot_sigma / sigma_s + dot_scale / scale_s
        D_w = dot_sigma / sigma_s * scale_s
        return x_w, D_w


class EDMDDIM(KarrasODE):
    """iDDPM/DDIM grid ODE (reference edmddim.py:12-84): the Karras 'DDIM'
    column — sigma grid drawn from the iDDPM u-recursion over a cosine
    bar-alpha schedule, identity scale, dot_sigma = 1."""

    def __init__(self, *args, C1: float = 0.001, C2: float = 0.008,
                 j0: int = 8, diffusion_steps: int = 1000, **kwargs):
        self.C1, self.C2, self.j0 = C1, C2, j0
        M = diffusion_steps
        # u-recursion (reference edmddim.py:52-60), computed once in numpy
        j = np.arange(M + 1)
        bar_alpha = np.sin(j / (M * (C2 + 1)) * np.pi / 2.0) ** 2
        tmp = np.maximum(bar_alpha[:-1] / bar_alpha[1:], C1)
        u = np.zeros(M)
        u[M - 1] = np.sqrt(1.0 / tmp[M - 1] - 1.0)
        for i in range(1, M):
            u[M - 1 - i] = np.sqrt((u[M - i] ** 2 + 1.0) / tmp[M - 1 - i] - 1.0)
        self._u = u
        super().__init__(*args, **kwargs)
        self.diffusion_steps = M
        self.t_diffusion = [float(u[-1]), float(u[j0])]  # u decreasing in j

    def c_skip(self, sigma):
        return jnp.ones_like(sigma)

    def c_out(self, sigma):
        return -sigma

    def c_in(self, sigma):
        return 1.0 / jnp.sqrt(1.0 + sigma**2)

    def c_noise(self, sigma):
        return sigma

    def sample_noise_distribution(self, rng, n: int):
        j = jax.random.randint(rng, (n,), self.j0, self.diffusion_steps)
        return jnp.asarray(self._u, jnp.float32)[j]

    def ode_tables(self, N: int):
        M, j0 = self.diffusion_steps, self.j0
        idx = np.floor(j0 + (M - 1 - j0) / N * np.arange(N + 1) + 0.5).astype(int)
        # u is DECREASING in j (the recursion divides by tmp < 1 walking
        # down), so ascending j indices already give a descending sigma grid
        sigma = self._u[idx].copy()
        return sigma, sigma, np.ones_like(sigma)

    def ode_weights(self, t_s, sigma_s, scale_s):
        w = 1.0 / sigma_s  # t = sigma, dot_sigma = 1
        return w, w
