"""Decision Diffuser pipeline (TPU-native).

Re-design of reference pipelines/dd_d4rl_mujoco.py:22-160: state-only DiT
planner with classifier-free guidance on the normalized return
(MLPCondition(1 -> emb) with label dropout), first-state inpainting, an
MlpInvDynamic for action extraction, and DD_RETURN_SCALE value
normalization.

TPU-native: diffusion + inverse-dynamics updates are fused jitted programs;
eval = one jitted program: CFG trajectory sampling (doubled-batch forward
inside the scan) -> invdyn(s0, s1) -> action.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousDiffusionSDE
from ..invdynamic import MlpInvDynamic
from ..nn_condition import MLPCondition
from ..nn_diffusion import DiT1d

__all__ = ["DDPipeline"]


class DDPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        horizon: int = 32,
        emb_dim: int = 128,
        d_model: int = 320,
        n_heads: int = 10,
        depth: int = 2,
        label_dropout: float = 0.25,
        predict_noise: bool = False,
        next_obs_loss_weight: float = 10.0,
        return_scale: float = 1000.0,
        ema_rate: float = 0.9999,
        diffusion_gradient_steps: int = 1_000_000,
        invdyn_gradient_steps: int = 1_000_000,
        lr: float = 2e-4,
        solver: str = "ddpm",
        sampling_steps: int = 20,
        w_cfg: float = 1.2,
        target_return: float = 0.9,
        temperature: float = 0.5,
        val_shift: float = 0.0,
        use_pallas_block: bool = False,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim, self.horizon = obs_dim, act_dim, horizon
        # antmaze conditions on val/scale + 1 so returns land in [0, 1]
        # (reference dd_d4rl_antmaze.py); val_shift implements the "+ 1".
        self.return_scale, self.val_shift = return_scale, val_shift
        self.solver, self.sampling_steps = solver, sampling_steps
        self.w_cfg, self.target_return, self.temperature = w_cfg, target_return, temperature
        self.invdyn_gradient_steps = invdyn_gradient_steps

        nn_diffusion = DiT1d(
            in_dim=obs_dim, emb_dim=emb_dim, d_model=d_model, n_heads=n_heads,
            depth=depth, timestep_emb_type="fourier",
            # fused Pallas DiT block (ops/dit_block.py): ~2x sampling at
            # candidate-eval batch sizes on TPU; config key use_pallas_block
            use_pallas_block=use_pallas_block,
        )
        nn_condition = MLPCondition(
            in_dim=1, out_dim=emb_dim, hidden_dims=(emb_dim,), act=nn.silu,
            dropout=label_dropout,
        )

        fix_mask = np.zeros((horizon, obs_dim), np.float32)
        fix_mask[0] = 1.0
        loss_weight = np.ones((horizon, obs_dim), np.float32)
        loss_weight[1] = next_obs_loss_weight

        self.agent = ContinuousDiffusionSDE(
            nn_diffusion,
            nn_condition,
            fix_mask=fix_mask,
            loss_weight=loss_weight,
            ema_rate=ema_rate,
            predict_noise=predict_noise,
            noise_schedule="linear",
            optim_params={
                "lr": optax.cosine_decay_schedule(lr, diffusion_gradient_steps),
                "weight_decay": 0.0,
            },
            rng=rng,
        )
        self.invdyn = MlpInvDynamic(
            obs_dim, act_dim, 512, jnp.tanh, {"lr": 2e-4}, rng=rng + 1
        )
        self.agent.init(jnp.zeros((1, horizon, obs_dim)), jnp.zeros((1, 1)))
        self._plan_fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 2)

    # ------------------------------------------------------------------
    def train_step(self, batch):
        obs, act, val = batch["obs"]["state"], batch["act"], batch["val"]
        val = val / self.return_scale + self.val_shift
        log = self.agent.update(obs, val)
        # python-side counter: int(state.step) would host-sync every step
        self._py_step = getattr(self, "_py_step", 0) + 1
        if self._py_step <= self.invdyn_gradient_steps:
            o = obs[:, :-1].reshape(-1, self.obs_dim)
            a = act[:, :-1].reshape(-1, self.act_dim)
            o2 = obs[:, 1:].reshape(-1, self.obs_dim)
            log["invdyn_loss"] = self.invdyn.update(o, a, o2)["loss"]
        return log

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused trainer: `n_steps` x (device gather + CFG diffusion update
        + budget-gated inverse-dynamics update) in ONE `lax.scan` program
        (see runner.make_rl_train_scan). Invdyn gated on the DEVICE step
        counter via `lax.cond` — same 1..invdyn_gradient_steps window as
        train_step's host counter."""
        gather = dataset.gather_fn(batch_size)
        dif_raw = self.agent._make_update_fn(update_ema=True, has_wrt=False)
        dif_raw = getattr(dif_raw, "__wrapped__", dif_raw)
        inv_raw = getattr(self.invdyn._jit_update, "__wrapped__",
                          self.invdyn._jit_update)
        budget = self.invdyn_gradient_steps
        scale, shift = self.return_scale, self.val_shift
        O, A = self.obs_dim, self.act_dim

        def fused(a_st, inv_params, inv_opt, rng):
            def body(carry, k):
                a_st, ip, io = carry
                # gather with the WHOLE key (matches the sequential
                # sample_batch(k) stream); invdyn dropout rng from a fold
                k_i = jax.random.fold_in(k, 1)
                batch = gather(k)
                obs, act, val = batch["obs"]["state"], batch["act"], batch["val"]
                val = val / scale + shift
                a_st, log = dif_raw(a_st, obs, val, None)

                def with_inv(arg):
                    ip, io = arg
                    o = obs[:, :-1].reshape(-1, O)
                    a = act[:, :-1].reshape(-1, A)
                    o2 = obs[:, 1:].reshape(-1, O)
                    ip, io, loss = inv_raw(ip, io, k_i, o, a, o2)
                    return ip, io, loss

                ip, io, inv_loss = jax.lax.cond(
                    a_st.step <= budget, with_inv,
                    lambda arg: (arg[0], arg[1], jnp.float32(0.0)), (ip, io))
                log["invdyn_loss"] = inv_loss
                return (a_st, ip, io), log

            keys = jax.random.split(rng, n_steps)
            (a_st, inv_params, inv_opt), logs = jax.lax.scan(
                body, (a_st, inv_params, inv_opt), keys)
            return a_st, inv_params, inv_opt, jax.tree_util.tree_map(
                lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=(0, 1, 2))

        def run(rng):
            (self.agent.state, self.invdyn.params, self.invdyn.opt_state,
             log) = fused_jit(self.agent.state, self.invdyn.params,
                              self.invdyn.opt_state, rng)
            return log

        return run

    # ------------------------------------------------------------------
    def _make_plan_fn(self, num_envs: int):
        E, H, O = num_envs, self.horizon, self.obs_dim
        sample_fn = self.agent.build_sample_fn(
            solver=self.solver, sample_steps=self.sampling_steps,
            cfg_mode="mix", final_logp=False,
        )
        invdyn_fn = self.invdyn.pure_predict_fn()

        def plan(params, invdyn_params, rng, obs_normed, condition):
            prior = jnp.zeros((E, H, O)).at[:, 0].set(obs_normed)
            traj, _ = sample_fn(
                params, None, rng, prior,
                condition_cfg=condition, w_cfg=self.w_cfg, temperature=self.temperature,
            )
            act = invdyn_fn(invdyn_params, obs_normed, traj[:, 1, :])
            return act, traj

        return jax.jit(plan)

    def act(self, obs_normed, target_return: Optional[float] = None,
            rng: Optional[jax.Array] = None, use_ema: bool = True):
        E = obs_normed.shape[0]
        if E not in self._plan_fn_cache:
            self._plan_fn_cache[E] = self._make_plan_fn(E)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        tr = self.target_return if target_return is None else target_return
        condition = jnp.ones((E, 1)) * tr
        params = self.agent.state.ema_params if use_ema else self.agent.state.params
        act, traj = self._plan_fn_cache[E](
            params, self.invdyn.params, rng, jnp.asarray(obs_normed), condition
        )
        return act, {"traj": traj}

    # ------------------------------------------------------------------
    def save(self, path: str):
        self.agent.save(path + ".diffusion")
        self.invdyn.save(path + ".invdyn")

    def load(self, path: str):
        self.agent.load(path + ".diffusion")
        self.invdyn.load(path + ".invdyn")
