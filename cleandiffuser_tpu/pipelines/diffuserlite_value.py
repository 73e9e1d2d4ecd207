"""IQL-value-conditioned DiffuserLite (antmaze / kitchen variants).

Re-design of reference pipelines/diffuserlite_d4rl_antmaze.py:22-430 and
diffuserlite_d4rl_kitchen.py: the sparse-reward benchmarks condition each
hierarchy level on a *reward-derived progress value* instead of the MC
return — level 0 bootstraps the window tail with an IQL V(s) estimate
(antmaze) or uses the discounted in-window reward (kitchen), finer levels
use time-to-success statistics. Inference draws K candidate coarse plans,
scores them with IQL V, and refines the argmax — all fused into one jitted
program per (num_envs, num_candidates).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..dataset.base import DeviceSeqSampler
from ..utils.iql import IQL
from .diffuserlite import DiffuserLitePipeline

__all__ = [
    "IQLValueMultiHorizonDataset",
    "antmaze_level_values",
    "kitchen_level_values",
    "value_train_step",
    "prepare_value_reflow_pairs",
    "build_candidate_plan_fn",
    "train_iql",
]


class IQLValueMultiHorizonDataset:
    """Wraps a MultiHorizon dataset, adding per-step reward and IQL value
    windows to each sampled batch (reference MultiHorizonD4RL*DatasetwQ)."""

    def __init__(self, base, iql: IQL, chunk: int = 64):
        self.base = base
        self.o_dim, self.a_dim = base.o_dim, base.a_dim
        v_fn = jax.jit(lambda p, o: iql.V.apply(p, o))
        pv = []
        n_paths = base.seq_obs.shape[0]
        for i in range(0, n_paths, chunk):
            pv.append(np.asarray(v_fn(iql.state.v_params, base.seq_obs[i:i + chunk])))
        self.pred_values = np.concatenate(pv, 0)

        self._samplers = [
            DeviceSeqSampler(
                {"obs": base.seq_obs, "act": base.seq_act,
                 "rew": base.seq_rew, "pred_val": self.pred_values},
                idxs, horizon, scalars={"val": base.seq_val},
            )
            for idxs, horizon in zip(base.indices, base.horizons)
        ]

    def get_normalizer(self):
        return self.base.get_normalizer()

    def place_on_mesh(self, mesh, axis: str = "dp"):
        for s in self._samplers:
            s.place_on_mesh(mesh, axis)
        return self

    def sample_batch(self, rng, batch_size: int, horizon_idx: int = 0):
        out = self._samplers[horizon_idx].sample(rng, batch_size)
        return {"obs": {"state": out["obs"]}, "act": out["act"],
                "rew": out["rew"], "pred_val": out["pred_val"], "val": out["val"]}


# ---------------------------------------------------------------------------
def antmaze_level_values(batch, level: int, discount: float):
    """Level-conditioned value (reference diffuserlite_d4rl_antmaze.py:167-190).

    Rewards arrive iql-tuned (-1 per step, 0 at goal). Level 0: discounted
    masked step rewards with an IQL bootstrap at the window tail, mapped
    near [0, 1]. Finer levels: 1 / steps-to-success if the goal is reached
    inside the window, else 0.
    """
    rew = batch["rew"] + 1.0  # back to sparse {0, 1}
    cum = jnp.cumsum(rew, axis=1)
    mask = (cum == 0.0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
    if level == 0:
        val = rew - 1.0
        val = val.at[:, -1].set(batch["pred_val"][:, -1])
        disc = discount ** jnp.arange(rew.shape[1], dtype=jnp.float32)
        val = (disc[None, :, None] * val * mask).sum(axis=1) / 100.0 + 1.0
    else:
        val = rew.max(axis=1) / mask.sum(axis=1)
    return val


def kitchen_level_values(batch, level: int, discount: float):
    """Reference diffuserlite_d4rl_kitchen.py:178-184: level 0 conditions on
    the discounted in-window reward sum / 100, finer levels on mean reward."""
    rew = batch["rew"]
    if level == 0:
        disc = discount ** jnp.arange(rew.shape[1], dtype=jnp.float32)
        return (disc[None, :, None] * rew).sum(axis=1) / 100.0
    return rew.mean(axis=1)


# ---------------------------------------------------------------------------
def value_train_step(pipe: DiffuserLitePipeline, batches, val_fn: Callable,
                     invdyn_budget_left: bool = True):
    """One gradient step per level, conditioning on val_fn(batch, level)."""
    log = {}
    for i in range(pipe.n_levels):
        obs, act = pipe._level_strided(batches[i], i)
        val = val_fn(batches[i], i)
        log[f"loss{i}"] = pipe.diffusions[i].update(obs, val)["loss"]
        if i == pipe.n_levels - 1 and invdyn_budget_left:
            o = obs[:, :-1].reshape(-1, pipe.obs_dim)
            a = act[:, :-1].reshape(-1, pipe.act_dim)
            o2 = obs[:, 1:].reshape(-1, pipe.obs_dim)
            log["invdyn_loss"] = pipe.invdyn.update(o, a, o2)["loss"]
    return log


def prepare_value_reflow_pairs(pipe: DiffuserLitePipeline, batches, val_fn,
                               sampling_steps: int = 20):
    """Reflow pairs: level 0 sampled WITH its value condition, finer levels
    unconditional (reference antmaze prepare_dataset :216-305 — only level 0
    carries CFG, w_cfgs=[1,0,0])."""
    out = []
    for i in range(pipe.n_levels):
        obs, _ = pipe._level_strided(batches[i], i)
        b, h = obs.shape[0], pipe.planning_horizons[i]
        prior = jnp.zeros((b, h, pipe.obs_dim)).at[:, 0].set(obs[:, 0])
        if i > 0:
            prior = prior.at[:, -1].set(obs[:, -1])
        pipe._rng, k1, k2 = jax.random.split(pipe._rng, 3)
        noise = jax.random.normal(k1, prior.shape)
        cond = val_fn(batches[i], i) if i == 0 else None
        traj, _ = pipe.diffusions[i].sample(
            prior, x1=noise, sample_steps=sampling_steps, use_ema=True,
            condition_cfg=cond, w_cfg=1.0 if i == 0 else 0.0,
            sample_step_schedule="quad_continuous", rng=k2,
        )
        pair = {"x0": np.asarray(traj), "x1": np.asarray(noise)}
        if i == 0:
            pair["condition"] = np.asarray(cond)
        out.append(pair)
    return out


# ---------------------------------------------------------------------------
def build_candidate_plan_fn(pipe: DiffuserLitePipeline, iql: IQL,
                            num_envs: int, num_candidates: int,
                            sample_steps: int, w_cfgs: Sequence[float],
                            select_t: int):
    """Jitted hierarchical plan with K-candidate IQL selection at level 0
    (reference inference loop; select_t = 1 for antmaze, -1 for kitchen)."""
    E, K, O = num_envs, num_candidates, pipe.obs_dim
    sample_fns = [
        pipe.diffusions[i].build_sample_fn(
            sample_steps=sample_steps,
            sample_step_schedule="quad_continuous", cfg_mode="mix",
        )
        for i in range(pipe.n_levels)
    ]

    def plan(params_list, v_params, invdyn_params, rng, obs_normed, tgt):
        keys = jax.random.split(rng, pipe.n_levels)
        h0 = pipe.planning_horizons[0]
        obs_rep = jnp.repeat(obs_normed[:, None], K, axis=1).reshape(E * K, O)
        prior = jnp.zeros((E * K, h0, O)).at[:, 0].set(obs_rep)
        cond0 = jnp.repeat(tgt[:, None], K, axis=1).reshape(E * K, 1)
        traj, _ = sample_fns[0](
            params_list[0], None, keys[0], prior,
            condition_cfg=cond0, w_cfg=w_cfgs[0], temperature=pipe.temperature,
        )
        traj = traj.reshape(E, K, h0, O)
        v = iql.V.apply(v_params, traj[:, :, select_t])  # (E, K, 1)
        idx = jnp.argmax(v[..., 0], axis=-1)
        traj = jnp.take_along_axis(traj, idx[:, None, None, None], axis=1)[:, 0]
        for j in range(1, pipe.n_levels):
            h = pipe.planning_horizons[j]
            prior = jnp.zeros((E, h, O)).at[:, 0].set(traj[:, 0]).at[:, -1].set(traj[:, 1])
            traj, _ = sample_fns[j](
                params_list[j], None, keys[j], prior,
                condition_cfg=tgt, w_cfg=w_cfgs[j], temperature=pipe.temperature,
            )
        act = pipe.invdyn.net.apply(
            invdyn_params, jnp.concatenate([traj[:, 0], traj[:, 1]], -1)
        )
        return act

    return jax.jit(plan)


# ---------------------------------------------------------------------------
def train_iql(iql: IQL, dataset, gradient_steps: int, batch_size: int,
              log_interval: int, save_interval: int, save_fn, seed: int = 0):
    """IQL pre-training stage (reference mode=iql_training :112-146).

    Fused path: log_interval x (device gather + V update + Q/target update)
    in ONE lax.scan program (see runner.make_rl_train_scan)."""
    rng = jax.random.PRNGKey(seed)
    if gradient_steps % log_interval == 0 and save_interval % log_interval == 0:
        gather = dataset.gather_fn(batch_size)
        upd_v, upd_q = iql._update_v, iql._update_q

        def window(state, r):
            def body(st, k):
                b = gather(k)
                obs, act = b["obs"]["state"], b["act"]
                st, lv = upd_v(st, obs, act)
                st, lq = upd_q(st, obs, act, b["rew"], b["next_obs"]["state"],
                               b["tml"])
                return st, {"loss_v": lv, "loss_q": lq}

            keys = jax.random.split(r, log_interval)
            st, logs = jax.lax.scan(body, state, keys)
            return st, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        window_jit = jax.jit(window, donate_argnums=0)
        step = 0
        while step < gradient_steps:
            rng, k = jax.random.split(rng)
            iql.state, log = window_jit(iql.state, k)
            step += log_interval
            print({k_: float(v) for k_, v in log.items()},
                  {"gradient_steps": step})
            if step % save_interval == 0:
                save_fn()
        return

    log = {"loss_v": 0.0, "loss_q": 0.0}
    for step in range(gradient_steps):
        rng, k = jax.random.split(rng)
        batch = dataset.sample_batch(k, batch_size)
        obs, act = batch["obs"]["state"], batch["act"]
        log["loss_v"] += iql.update_V(obs, act)
        log["loss_q"] += iql.update_Q(
            obs, act, batch["rew"], batch["next_obs"]["state"], batch["tml"]
        )
        if (step + 1) % log_interval == 0:
            print({k_: v / log_interval for k_, v in log.items()},
                  {"gradient_steps": step + 1})
            log = {"loss_v": 0.0, "loss_q": 0.0}
        if (step + 1) % save_interval == 0:
            save_fn()
