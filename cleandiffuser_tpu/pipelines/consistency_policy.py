"""Consistency-policy staged pipeline (TPU-native).

Re-design of reference tutorials/sp_consistency_policy.py:25-410 — the
staged mode chain: iql_training -> edm_training -> (cd_training |
ct_training) -> inference. The actor is an IDQLMlp behavior policy trained
as a ContinuousEDM, then distilled into a ContinuousConsistencyModel (CD)
or trained directly with consistency training (CT), giving 1-2 NFE action
sampling; at inference, candidates are reweighted by the IQL advantage.
This is BASELINE.json config #5's consistency-distillation component.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import ContinuousConsistencyModel, ContinuousEDM
from ..nn_condition import IdentityCondition
from ..nn_diffusion import IDQLMlp
from ..utils.iql import IQL

__all__ = ["ConsistencyPolicyPipeline"]


class ConsistencyPolicyPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        emb_dim: int = 64,
        hidden_dim: int = 256,
        iql_tau: float = 0.7,
        discount: float = 0.99,
        curriculum_cycle: int = 100_000,
        s0: int = 10,
        s1: int = 1280,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim

        self.iql = IQL(obs_dim, act_dim, tau=iql_tau, discount=discount,
                       hidden_dim=hidden_dim, rng=rng)

        def make_backbone():
            return IDQLMlp(obs_dim=obs_dim, act_dim=act_dim, emb_dim=emb_dim,
                           hidden_dim=hidden_dim)

        self.edm = ContinuousEDM(
            make_backbone(), IdentityCondition(dropout=0.0),
            x_max=np.ones((act_dim,)), x_min=-np.ones((act_dim,)),
            rng=rng + 1,
        )
        self.edm.init(jnp.zeros((1, act_dim)), jnp.zeros((1, obs_dim)))

        self.cm = ContinuousConsistencyModel(
            make_backbone(), IdentityCondition(dropout=0.0),
            x_max=np.ones((act_dim,)), x_min=-np.ones((act_dim,)),
            s0=s0, s1=s1, data_dim=act_dim, curriculum_cycle=curriculum_cycle,
            rng=rng + 2,
        )
        self.cm.init(jnp.zeros((1, act_dim)), jnp.zeros((1, obs_dim)))

        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 3)

    # ------------------------------------------------------------------
    # Stage 1: IQL
    def iql_train_step(self, batch):
        obs, act = batch["obs"]["state"], batch["act"]
        next_obs, rew, tml = batch["next_obs"]["state"], batch["rew"], batch["tml"]
        loss_v = self.iql.update_V(obs, act)
        loss_q = self.iql.update_Q(obs, act, rew, next_obs, tml)
        return {"loss_v": loss_v, "loss_q": loss_q}

    # Stage 2: EDM behavior cloning
    def edm_train_step(self, batch):
        return self.edm.update(batch["act"], batch["obs"]["state"])

    # Stage 3a: consistency distillation from the EDM
    def prepare_distillation(self, distillation_N: int = 18):
        self.cm.prepare_distillation(self.edm, distillation_N)

    def cd_train_step(self, batch):
        return self.cm.update(batch["act"], batch["obs"]["state"], loss_type="distillation")

    # Stage 3b: direct consistency training
    def ct_train_step(self, batch):
        return self.cm.update(batch["act"], batch["obs"]["state"], loss_type="training")

    # ------------------------------------------------------------------
    def act(self, obs_normed, model: str = "ct", num_candidates: int = 32,
            sampling_steps: int = 2, weight_temperature: float = 100.0,
            rng: Optional[jax.Array] = None):
        """Sample candidates from the chosen actor (edm|cd|ct) and resample
        by softmax of the IQL advantage (reference sp:384-405)."""
        E, K = obs_normed.shape[0], num_candidates
        key = (model, E, K, sampling_steps)
        if key not in self._fn_cache:
            if model == "edm":
                actor = self.edm
                sample_fn = actor.build_sample_fn(
                    solver="euler", sample_steps=sampling_steps, cfg_mode="cond",
                    final_logp=False,
                )
            else:  # cd / ct share the consistency model
                actor = self.cm
                sample_fn = actor.build_sample_fn(
                    sample_steps=sampling_steps, cfg_mode="cond",
                )

            def act_fn(params, iql_state, r, obs):
                k_s, k_c = jax.random.split(r)
                obs_rep = jnp.repeat(obs[:, None, :], K, axis=1).reshape(E * K, -1)
                prior = jnp.zeros((E * K, self.act_dim))
                a, _ = sample_fn(params, None, k_s, prior,
                                 condition_cfg=obs_rep, w_cfg=1.0)
                a = jnp.clip(a, -1.0, 1.0)
                q = self.iql.Q.apply(iql_state.q_target_params, obs_rep, a)
                v = self.iql.V.apply(iql_state.v_params, obs_rep)
                adv = (q - v).reshape(E, K)
                idx = jax.random.categorical(k_c, adv * weight_temperature, axis=-1)
                a = a.reshape(E, K, -1)
                return jnp.take_along_axis(a, idx[:, None, None], axis=1)[:, 0]

            self._fn_cache[key] = (jax.jit(act_fn), actor)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        fn, actor = self._fn_cache[key]
        return fn(actor.state.ema_params, self.iql.state, rng, jnp.asarray(obs_normed))

    # ------------------------------------------------------------------
    def save(self, path: str):
        self.iql.save(path + ".iql")
        self.edm.save(path + ".edm")
        self.cm.save(path + ".cm")

    def load(self, path: str):
        self.iql.load(path + ".iql")
        self.edm.load(path + ".edm")
        self.cm.load(path + ".cm")
