"""DiffuserLite pipeline (TPU-native).

Re-design of reference pipelines/diffuserlite_d4rl_mujoco.py:20-340: a
3-level coarse-to-fine rectified-flow planner (planning horizons [5, 5, 9]
refining endpoint-inpainted segments — effective horizon ~257), an optional
reflow stage (retraining on self-generated (sample, noise) pairs for 1-step
sampling = "R2"), and a FancyMlpInvDynamic for action extraction.

TPU-native: the entire hierarchical planning cascade — all levels' sampling
scans plus the inverse-dynamics action head — compiles into ONE jitted
program per num_envs (the reference dispatches n_levels Python-loop sample
calls per control step).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import ContinuousRectifiedFlow
from ..invdynamic import FancyMlpInvDynamic
from ..nn_condition import MLPCondition
from ..nn_diffusion import DiT1d

__all__ = ["DiffuserLitePipeline", "compute_temporal_horizons"]


def compute_temporal_horizons(planning_horizons: Sequence[int]) -> List[int]:
    """Per-level spans in raw env steps (reference diffuserlite:31-36)."""
    n = len(planning_horizons)
    temporal = [planning_horizons[-1]] * n
    for i in range(n - 1):
        temporal[-2 - i] = (planning_horizons[-2 - i] - 1) * (temporal[-1 - i] - 1) + 1
    return temporal


class DiffuserLitePipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        planning_horizons: Sequence[int] = (5, 5, 9),
        emb_dim: int = 128,
        d_model: int = 256,
        n_heads: int = 8,
        depth: int = 2,
        next_obs_loss_weight: float = 10.0,
        return_scale: float = 1000.0,
        ema_rate: float = 0.9995,
        diffusion_gradient_steps: int = 1_000_000,
        lr: float = 2e-4,
        w_cfg: float = 1.2,
        target_return: float = 0.9,
        temperature: float = 1.0,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.planning_horizons = list(planning_horizons)
        self.temporal_horizons = compute_temporal_horizons(planning_horizons)
        self.n_levels = len(planning_horizons)
        self.return_scale = return_scale
        self.w_cfg, self.target_return, self.temperature = w_cfg, target_return, temperature

        self.diffusions: List[ContinuousRectifiedFlow] = []
        for i, h in enumerate(self.planning_horizons):
            fix_mask = np.zeros((h, obs_dim), np.float32)
            if i == 0:
                fix_mask[0] = 1.0
            else:
                fix_mask[[0, -1]] = 1.0  # endpoint inpainting at finer levels
            loss_weight = np.ones((h, obs_dim), np.float32)
            loss_weight[1] = next_obs_loss_weight

            engine = ContinuousRectifiedFlow(
                DiT1d(in_dim=obs_dim, emb_dim=emb_dim, d_model=d_model,
                      n_heads=n_heads, depth=depth, timestep_emb_type="fourier"),
                MLPCondition(in_dim=1, out_dim=emb_dim, hidden_dims=(emb_dim,)),
                fix_mask=fix_mask,
                loss_weight=loss_weight,
                ema_rate=ema_rate,
                optim_params={
                    "lr": optax.cosine_decay_schedule(lr, diffusion_gradient_steps),
                    "weight_decay": 0.0,
                },
                rng=rng + i,
            )
            engine.init(jnp.zeros((1, h, obs_dim)), jnp.zeros((1, 1)))
            self.diffusions.append(engine)

        self.invdyn = FancyMlpInvDynamic(
            obs_dim, act_dim, 256, jnp.tanh, add_dropout=True, rng=rng + 100
        )
        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 200)

    # ------------------------------------------------------------------
    def _level_strided(self, batch_level, i):
        """Subsample the level's temporal window to its planning horizon."""
        stride = self.temporal_horizons[i + 1] - 1 if i < self.n_levels - 1 else 1
        obs = batch_level["obs"]["state"][:, ::stride]
        act = batch_level["act"][:, ::stride]
        return obs, act

    def train_step(self, batches, invdyn_budget_left: bool = True):
        """batches: list of per-level dict batches (multi-horizon dataset)."""
        log = {}
        for i in range(self.n_levels):
            obs, act = self._level_strided(batches[i], i)
            val = batches[i]["val"] / self.return_scale
            log[f"loss{i}"] = self.diffusions[i].update(obs, val)["loss"]
            if i == self.n_levels - 1 and invdyn_budget_left:
                # slice on device: host np.asarray here would force a
                # ~30ms tunnel round trip per training step
                o = obs[:, :-1].reshape(-1, self.obs_dim)
                a = act[:, :-1].reshape(-1, self.act_dim)
                o2 = obs[:, 1:].reshape(-1, self.obs_dim)
                log["invdyn_loss"] = self.invdyn.update(o, a, o2)["loss"]
        return log

    def make_train_scan(self, dataset, batch_size: int, n_steps: int,
                        invdyn_budget: int):
        """Fused hierarchy trainer: `n_steps` x (per-level device gathers +
        per-level RF updates + budget-gated invdyn update) in ONE `lax.scan`
        program (see runner.make_rl_train_scan). The invdyn budget gates on
        the DEVICE step counter via `lax.cond` (CLI semantics: global step
        < invdyn_gradient_steps)."""
        gathers = [dataset._samplers[i].gather_fn(batch_size)
                   for i in range(self.n_levels)]
        raws = []
        for d in self.diffusions:
            r = d._make_update_fn(update_ema=True, has_wrt=False)
            raws.append(getattr(r, "__wrapped__", r))
        inv_raw = getattr(self.invdyn._jit_update, "__wrapped__",
                          self.invdyn._jit_update)
        scale = self.return_scale
        O, A = self.obs_dim, self.act_dim

        def body(carry, k):
            dif_states, ip, io = carry
            dif_states = list(dif_states)
            log = {}
            for i in range(self.n_levels):
                out = gathers[i](k)  # CLI samples every level with the same key
                batch_i = {"obs": {"state": out["obs"]}, "act": out["act"],
                           "val": out["val"]}
                obs, act = self._level_strided(batch_i, i)
                val = batch_i["val"] / scale
                # RF engines take an extra x1 arg (reflow pair; None here)
                dif_states[i], dlog = raws[i](dif_states[i], obs, val, None, None)
                log[f"loss{i}"] = dlog["loss"]
                if i == self.n_levels - 1:
                    def with_inv(arg):
                        ip, io = arg
                        o = obs[:, :-1].reshape(-1, O)
                        a = act[:, :-1].reshape(-1, A)
                        o2 = obs[:, 1:].reshape(-1, O)
                        return inv_raw(ip, io, jax.random.fold_in(k, 99),
                                       o, a, o2)

                    # post-update step == global step + 1, so `<= budget`
                    # reproduces the CLI's 0-based `step < budget` gate
                    ip, io, inv_loss = jax.lax.cond(
                        dif_states[i].step <= invdyn_budget, with_inv,
                        lambda arg: (arg[0], arg[1], jnp.float32(0.0)),
                        (ip, io))
                    log["invdyn_loss"] = inv_loss
            return (tuple(dif_states), ip, io), log

        def fused(dif_states, ip, io, rng):
            keys = jax.random.split(rng, n_steps)
            (dif_states, ip, io), logs = jax.lax.scan(
                body, (dif_states, ip, io), keys)
            return dif_states, ip, io, jax.tree_util.tree_map(
                lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=(0, 1, 2))

        def run(rng):
            dif_states, self.invdyn.params, self.invdyn.opt_state, log = fused_jit(
                tuple(d.state for d in self.diffusions),
                self.invdyn.params, self.invdyn.opt_state, rng)
            for d, st in zip(self.diffusions, dif_states):
                d.state = st
            return log

        return run

    # ------------------------------------------------------------------
    def prepare_reflow_pairs(self, batches, sampling_steps: int = 20, conditioned=True):
        """Generate (sample, noise[, condition]) pairs for reflow
        (reference mode=prepare_dataset, diffuserlite:118-185)."""
        out = []
        for i in range(self.n_levels):
            obs, _ = self._level_strided(batches[i], i)
            b = obs.shape[0]
            h = self.planning_horizons[i]
            prior = jnp.zeros((b, h, self.obs_dim))
            if i == 0:
                prior = prior.at[:, 0].set(obs[:, 0])
            else:
                prior = prior.at[:, 0].set(obs[:, 0]).at[:, -1].set(obs[:, -1])
            self._rng, k1, k2 = jax.random.split(self._rng, 3)
            noise = jax.random.normal(k1, prior.shape)
            val = batches[i]["val"] / self.return_scale if conditioned else None
            traj, _ = self.diffusions[i].sample(
                prior, x1=noise, sample_steps=sampling_steps, use_ema=True,
                condition_cfg=val, w_cfg=1.0 if conditioned else 0.0,
                sample_step_schedule="quad_continuous", rng=k2,
            )
            pair = {"x0": np.asarray(traj), "x1": np.asarray(noise)}
            if conditioned:
                pair["condition"] = np.asarray(val)
            out.append(pair)
        return out

    def reflow_step(self, pairs_per_level, conditioned=True):
        """One reflow gradient step per level (reference diffuserlite:205-220)."""
        log = {}
        for i in range(self.n_levels):
            p = pairs_per_level[i]
            cond = p.get("condition") if conditioned else None
            log[f"loss{i}"] = self.diffusions[i].update(
                p["x0"], cond, x1=jnp.asarray(p["x1"])
            )["loss"]
        return log

    # ------------------------------------------------------------------
    def _make_plan_fn(self, num_envs: int, sample_steps: int):
        E, O = num_envs, self.obs_dim
        sample_fns = [
            self.diffusions[i].build_sample_fn(
                sample_steps=sample_steps,
                sample_step_schedule="quad_continuous",
                cfg_mode="mix",
            )
            for i in range(self.n_levels)
        ]

        def plan(params_list, invdyn_params, rng, obs_normed, condition):
            keys = jax.random.split(rng, self.n_levels)
            prior = jnp.zeros((E, self.planning_horizons[0], O)).at[:, 0].set(obs_normed)
            traj = None
            for j in range(self.n_levels):
                traj, _ = sample_fns[j](
                    params_list[j], None, keys[j], prior,
                    condition_cfg=condition, w_cfg=self.w_cfg,
                    temperature=self.temperature,
                )
                if j < self.n_levels - 1:
                    h_next = self.planning_horizons[j + 1]
                    prior = jnp.zeros((E, h_next, O))
                    prior = prior.at[:, 0].set(traj[:, 0]).at[:, -1].set(traj[:, 1])
            act = self.invdyn.net.apply(
                invdyn_params, jnp.concatenate([traj[:, 0], traj[:, 1]], -1)
            )
            return act, traj

        return jax.jit(plan)

    def act(self, obs_normed, sample_steps: int = 3, target_return: Optional[float] = None,
            use_ema: bool = True, rng: Optional[jax.Array] = None):
        """sample_steps=1 for R2 (after reflow), 3 for R1
        (reference diffuserlite:259)."""
        E = obs_normed.shape[0]
        key = (E, sample_steps)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._make_plan_fn(E, sample_steps)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        tr = self.target_return if target_return is None else target_return
        condition = jnp.ones((E, 1)) * tr
        params_list = [
            (d.state.ema_params if use_ema else d.state.params) for d in self.diffusions
        ]
        act, traj = self._fn_cache[key](
            params_list, self.invdyn.params, rng, jnp.asarray(obs_normed), condition
        )
        return act, {"traj": traj}

    # ------------------------------------------------------------------
    def save(self, path: str):
        for i, d in enumerate(self.diffusions):
            d.save(path + f".diffusion{i}")
        self.invdyn.save(path + ".invdyn")

    def load(self, path: str):
        for i, d in enumerate(self.diffusions):
            d.load(path + f".diffusion{i}")
        self.invdyn.load(path + ".invdyn")
