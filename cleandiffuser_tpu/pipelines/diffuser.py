"""Diffuser pipeline (TPU-native).

Re-design of reference pipelines/diffuser_d4rl_mujoco.py:22-166: joint
(state, action) trajectory diffusion with first-state inpainting
(fix_mask[0, :obs_dim] = 1), action loss weight, CumRewClassifier
classifier guidance, and candidate-argmax plan selection at eval.

TPU-native: the diffusion update and the classifier update fuse into two
jitted programs fed from a device-resident dataset; the eval planner —
K x E candidate sampling, per-step classifier-gradient guidance inside the
scan, final log-p scoring, argmax plan selection, and a0 extraction — is
ONE jitted program per (K, E) shape.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..classifier import CumRewClassifier
from ..diffusion import DiscreteDiffusionSDE
from ..nn_classifier import HalfJannerUNet1d
from ..nn_diffusion import JannerUNet1d

__all__ = ["DiffuserPipeline"]


class DiffuserPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        horizon: int = 32,
        model_dim: int = 32,
        dim_mult: Sequence[int] = (1, 2, 2, 2),
        diffusion_steps: int = 20,
        sampling_steps: int = 20,
        solver: str = "ddpm",
        predict_noise: bool = True,
        action_loss_weight: float = 10.0,
        terminal_penalty: float = -100.0,
        discount: float = 0.997,
        ema_rate: float = 0.9999,
        diffusion_gradient_steps: int = 1_000_000,
        classifier_gradient_steps: int = 1_000_000,
        lr: float = 2e-4,
        w_cg: float = 0.1,
        temperature: float = 0.5,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim, self.horizon = obs_dim, act_dim, horizon
        self.sampling_steps, self.solver = sampling_steps, solver
        self.w_cg, self.temperature = w_cg, temperature
        self.classifier_gradient_steps = classifier_gradient_steps
        self.terminal_penalty, self.discount = terminal_penalty, discount

        in_dim = obs_dim + act_dim
        nn_diffusion = JannerUNet1d(
            in_dim=in_dim, model_dim=model_dim, emb_dim=model_dim,
            dim_mult=dim_mult, attention=False, kernel_size=5,
        )
        nn_classifier = HalfJannerUNet1d(
            horizon=horizon, in_dim=in_dim, out_dim=1,
            model_dim=model_dim, emb_dim=model_dim, dim_mult=dim_mult, kernel_size=3,
        )
        self.classifier = CumRewClassifier(
            nn_classifier,
            optim_params={"lr": optax.cosine_decay_schedule(lr, classifier_gradient_steps)},
            rng=rng + 1,
        )

        fix_mask = np.zeros((horizon, in_dim), np.float32)
        fix_mask[0, :obs_dim] = 1.0
        loss_weight = np.ones((horizon, in_dim), np.float32)
        loss_weight[0, obs_dim:] = action_loss_weight

        self.agent = DiscreteDiffusionSDE(
            nn_diffusion,
            None,
            fix_mask=fix_mask,
            loss_weight=loss_weight,
            classifier=self.classifier,
            ema_rate=ema_rate,
            diffusion_steps=diffusion_steps,
            predict_noise=predict_noise,
            optim_params={
                "lr": optax.cosine_decay_schedule(lr, diffusion_gradient_steps),
                "weight_decay": 0.0,
            },
            rng=rng,
        )
        x_ex = jnp.zeros((1, horizon, in_dim))
        self.agent.init(x_ex)
        self.classifier.init(x_ex, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1)))
        self._plan_fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 2)

    # ------------------------------------------------------------------
    def train_step(self, batch):
        """One diffusion step + (while under budget) one classifier step."""
        obs, act, val = batch["obs"]["state"], batch["act"], batch["val"]
        x = jnp.concatenate([obs, act], axis=-1)
        log = self.agent.update(x)
        # python-side counter: int(state.step) would host-sync every step
        self._py_step = getattr(self, "_py_step", 0) + 1
        if self._py_step <= self.classifier_gradient_steps:
            xt, t, _ = self.agent.add_noise(self.agent.next_sample_rng(), x)
            log_cls = self.classifier.update(xt, t, val)
            log["classifier_loss"] = log_cls["loss"]
        return log

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused planner trainer: `n_steps` x (device gather + diffusion
        update + budget-gated classifier update) in ONE `lax.scan` program
        (see runner.make_rl_train_scan for why). The classifier stage is
        gated on the DEVICE step counter via `lax.cond` — same steps
        1..classifier_gradient_steps window as train_step's host counter."""
        gather = dataset.gather_fn(batch_size)
        dif_raw = self.agent._make_update_fn(update_ema=True, has_wrt=False)
        dif_raw = getattr(dif_raw, "__wrapped__", dif_raw)
        cls_raw = self.classifier._make_update_fn(update_ema=True)
        cls_raw = getattr(cls_raw, "__wrapped__", cls_raw)
        add_noise = self.agent.add_noise
        budget = self.classifier_gradient_steps

        def fused(a_st, c_st, rng):
            def body(carry, k):
                a_st, c_st = carry
                # gather with the WHOLE key (matches the sequential
                # sample_batch(k) stream); classifier noise from a fold
                k_n = jax.random.fold_in(k, 1)
                batch = gather(k)
                obs, act, val = batch["obs"]["state"], batch["act"], batch["val"]
                x = jnp.concatenate([obs, act], axis=-1)
                a_st, log = dif_raw(a_st, x, None, None)

                def with_cls(c):
                    xt, t, _ = add_noise(k_n, x)
                    c, clog = cls_raw(c, xt, t, val)
                    return c, clog["loss"]

                c_st, cls_loss = jax.lax.cond(
                    a_st.step <= budget, with_cls,
                    lambda c: (c, jnp.float32(0.0)), c_st)
                log["classifier_loss"] = cls_loss
                return (a_st, c_st), log

            keys = jax.random.split(rng, n_steps)
            (a_st, c_st), logs = jax.lax.scan(body, (a_st, c_st), keys)
            return a_st, c_st, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=(0, 1))

        def run(rng):
            self.agent.state, self.classifier.state, log = fused_jit(
                self.agent.state, self.classifier.state, rng)
            return log

        return run

    # ------------------------------------------------------------------
    def _make_plan_fn(self, num_envs: int, num_candidates: int):
        E, K = num_envs, num_candidates
        H, O, A = self.horizon, self.obs_dim, self.act_dim
        sample_fn = self.agent.build_sample_fn(
            solver=self.solver,
            sample_steps=self.sampling_steps,
            cfg_mode="uncond",
            use_cg=True,
            final_logp=True,
        )

        def plan(params, cls_params, rng, obs_normed):
            # obs_normed: (E, O)
            prior = jnp.zeros((E, H, O + A))
            prior = prior.at[:, 0, :O].set(obs_normed)
            prior = jnp.tile(prior, (K, 1, 1))  # (K*E, H, O+A)
            traj, log = sample_fn(
                params, cls_params, rng, prior,
                w_cg=self.w_cg, temperature=self.temperature,
            )
            logp = log["log_p"].reshape(K, E, -1).sum(-1)  # (K, E)
            idx = logp.argmax(0)
            traj = traj.reshape(K, E, H, O + A)
            best = traj[idx, jnp.arange(E)]  # (E, H, O+A)
            act = jnp.clip(best[:, 0, O:], -1.0, 1.0)
            return act, best, logp[idx, jnp.arange(E)]

        return jax.jit(plan)

    def act(self, obs_normed, num_candidates: int = 64, rng: Optional[jax.Array] = None,
            use_ema: bool = True):
        E = obs_normed.shape[0]
        key = (E, num_candidates)
        if key not in self._plan_fn_cache:
            self._plan_fn_cache[key] = self._make_plan_fn(E, num_candidates)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        params = self.agent.state.ema_params if use_ema else self.agent.state.params
        act, traj, logp = self._plan_fn_cache[key](
            params, self.classifier.inference_params, rng, jnp.asarray(obs_normed)
        )
        return act, {"traj": traj, "logp": logp}

    # ------------------------------------------------------------------
    def save(self, path: str):
        self.agent.save(path + ".diffusion")
        self.classifier.save(path + ".classifier")

    def load(self, path: str):
        self.agent.load(path + ".diffusion")
        self.classifier.load(path + ".classifier")
