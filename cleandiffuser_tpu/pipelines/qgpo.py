"""QGPO pipeline (TPU-native).

Re-design of reference pipelines/qgpo_d4rl_mujoco.py:20-260, four staged
modes: (1) behavior BC actor training, (2) supported-action collection
(K actions per next-state sampled from the behavior actor), (3) Q training
over the support set (softmax-weighted TD backup), (4) CEP energy
classifier training, then CG-guided eval sampling.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..classifier import QGPOClassifier
from ..diffusion import ContinuousDiffusionSDE
from ..nn_classifier import QGPONNClassifier
from ..nn_condition import MLPCondition
from ..nn_diffusion import SfBCUNet
from ..utils.blocks import TwinQ

__all__ = ["QGPOPipeline"]


class QGPOPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        K: int = 16,
        betaQ: float = 1.0,
        beta: float = 1.0,
        emb_dim: int = 64,
        ema_rate: float = 0.995,
        discount: float = 0.99,
        rng: int = 0,
    ):
        self.obs_dim, self.act_dim, self.K = obs_dim, act_dim, K
        self.betaQ, self.beta, self.discount = betaQ, beta, discount

        self.actor = ContinuousDiffusionSDE(
            SfBCUNet(act_dim=act_dim, emb_dim=emb_dim),
            MLPCondition(in_dim=obs_dim, out_dim=emb_dim, hidden_dims=(emb_dim,), act=nn.silu),
            ema_rate=ema_rate,
            x_max=np.ones((act_dim,)),
            x_min=-np.ones((act_dim,)),
            rng=rng,
        )
        self.actor.init(jnp.zeros((1, act_dim)), jnp.zeros((1, obs_dim)))

        self.q_net = TwinQ(hidden_dim=256)
        key = jax.random.PRNGKey(rng + 1)
        kq, self._rng = jax.random.split(key)
        self.q_tx = optax.adam(3e-4)

        def _build_q(kq):
            q_params = self.q_net.init(kq, jnp.zeros((1, obs_dim)), jnp.zeros((1, act_dim)))
            return (q_params, jax.tree_util.tree_map(jnp.copy, q_params),
                    self.q_tx.init(q_params))

        self.q_params, self.q_target_params, self.q_opt_state = jax.jit(_build_q)(kq)

        nn_classifier = QGPONNClassifier(
            obs_dim=obs_dim, act_dim=act_dim, emb_dim=emb_dim,
            hidden_dims=(256, 256, 256), timestep_emb_type="untrainable_fourier",
        )
        self.classifier = QGPOClassifier(
            nn_classifier, ema_rate=ema_rate, optim_params={"lr": 1e-3}, rng=rng + 2
        )
        self._fn_cache = {}

    # ------------------------------------------------------------------
    def bc_train_step(self, batch):
        return self.actor.update(batch["act"], batch["obs"]["state"])

    def make_bc_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused behavior-cloning trainer (see runner.make_rl_train_scan)."""
        gather = dataset.gather_fn(batch_size)
        raw = self.actor._make_update_fn(update_ema=True, has_wrt=False)
        raw = getattr(raw, "__wrapped__", raw)

        def fused(state, rng):
            def body(st, k):
                b = gather(k)
                st, log = raw(st, b["act"], b["obs"]["state"], None)
                return st, log

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.actor.state, log = fused_jit(self.actor.state, rng)
            return log

        return run

    def _support_store(self, dataset, sup):
        """Device-resident transitions + (N, K, act_dim) support set, passed
        to the fused trainers as explicit jit ARGUMENTS. Never close the
        fused fn over these: closure arrays are embedded by value into the
        lowered MLIR, and a ~1M-transition constant overflows the tunnel's
        request-body limit (HTTP 413 at remote_compile, round 4)."""
        return jax.device_put({
            "obs": np.asarray(dataset.obs),
            "next_obs": np.asarray(dataset.next_obs),
            "act": np.asarray(dataset.act),
            "rew": np.asarray(dataset.rew),
            "tml": np.asarray(dataset.tml),
            "sup": np.asarray(sup),
        })

    def make_q_train_scan(self, dataset, sup, batch_size: int, n_steps: int):
        """Fused support-softmax TD trainer: the CLI's per-step HOST batch
        assembly (numpy fancy-indexing + H2D of a (B,K,act) support slice
        every step) moves inside the scan as a device gather."""
        store = self._support_store(dataset, sup)
        size = dataset.size
        q_raw = self._make_q_step()

        def fused(qp, qt, qo, store, rng):
            def body(carry, k):
                qp, qt, qo = carry
                idx = jax.random.randint(k, (batch_size,), 0, size)
                batch = {
                    "obs": {"state": store["obs"][idx]},
                    "next_obs": {"state": store["next_obs"][idx]},
                    "act": store["act"][idx], "rew": store["rew"][idx],
                    "tml": store["tml"][idx],
                    "supported_act": store["sup"][idx],
                }
                qp, qt, qo, loss = q_raw(qp, qt, qo, batch)
                return (qp, qt, qo), {"q_loss": loss}

            keys = jax.random.split(rng, n_steps)
            (qp, qt, qo), logs = jax.lax.scan(body, (qp, qt, qo), keys)
            return qp, qt, qo, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=(0, 1, 2))

        def run(rng):
            (self.q_params, self.q_target_params, self.q_opt_state,
             log) = fused_jit(self.q_params, self.q_target_params,
                              self.q_opt_state, store, rng)
            return log

        return run

    def make_cep_train_scan(self, dataset, sup, batch_size: int, n_steps: int):
        """Fused contrastive-energy trainer: soft labels from the frozen Q
        + classifier update per step, one scan program."""
        store = self._support_store(dataset, sup)
        size = dataset.size
        # the classifier inits lazily on first update(); the scan bypasses
        # update, so materialize its state from example shapes first
        K, A = sup.shape[1], sup.shape[2]
        ex_x = jnp.zeros((1, K, A))
        ex_y = {"soft_label": jnp.zeros((1, K, 1)),
                "obs": jnp.zeros((1, self.obs_dim))}
        xe, te, ye = self.classifier._init_example(ex_x, jnp.zeros((1,)), ex_y)
        self.classifier._ensure_init(xe, te, ye)
        cls_raw = self.classifier._make_update_fn(update_ema=True)
        cls_raw = getattr(cls_raw, "__wrapped__", cls_raw)
        add_noise = self.actor.add_noise
        beta = self.beta

        def fused(c_st, q_params, store, rng):
            def body(c_st, k):
                idx = jax.random.randint(k, (batch_size,), 0, size)
                next_obs = store["next_obs"][idx]
                sup_b = store["sup"][idx]
                K = sup_b.shape[1]
                next_obs_rep = jnp.repeat(next_obs[:, None, :], K, axis=1)
                pred_q = self.q_net.apply(q_params, next_obs_rep, sup_b)
                soft_label = jax.nn.softmax(beta * pred_q, axis=1)
                noisy_act, t, _ = add_noise(jax.random.fold_in(k, 1), sup_b)
                c_st, log = cls_raw(
                    c_st, noisy_act, t,
                    {"soft_label": soft_label, "obs": next_obs})
                return c_st, log

            keys = jax.random.split(rng, n_steps)
            c_st, logs = jax.lax.scan(body, c_st, keys)
            return c_st, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.classifier.state, log = fused_jit(
                self.classifier.state, self.q_params, store, rng)
            return log

        return run

    # ------------------------------------------------------------------
    def collect_supported_actions(self, next_obs: np.ndarray, batch_size: int = 5000,
                                  sampling_steps: int = 10):
        """Sample K actions per state from the EMA behavior actor
        (reference qgpo:95-119). Returns (N, K, act_dim)."""
        K = self.K
        key = ("collect", batch_size, sampling_steps)
        if key not in self._fn_cache:
            sample_fn = self.actor.build_sample_fn(
                solver="ddpm", sample_steps=sampling_steps,
                sample_step_schedule="quad_continuous", cfg_mode="cond", final_logp=False,
            )

            def collect(params, rng, obs):
                obs_rep = jnp.repeat(obs[:, None, :], K, axis=1).reshape(-1, self.obs_dim)
                prior = jnp.zeros((obs.shape[0] * K, self.act_dim))
                act, _ = sample_fn(params, None, rng, prior, condition_cfg=obs_rep, w_cfg=1.0)
                return act.reshape(obs.shape[0], K, self.act_dim)

            self._fn_cache[key] = jax.jit(collect)

        N = next_obs.shape[0]
        out = np.empty((N, K, self.act_dim), np.float32)
        for i in range(0, N, batch_size):
            sl = slice(i, min(i + batch_size, N))
            n = sl.stop - sl.start
            obs = np.zeros((batch_size, self.obs_dim), np.float32)
            obs[:n] = next_obs[sl]
            self._rng, k = jax.random.split(self._rng)
            acts = self._fn_cache[key](self.actor.state.ema_params, k, jnp.asarray(obs))
            out[sl] = np.asarray(acts)[:n]
            if (i // batch_size) % 10 == 0 or sl.stop == N:
                print(f"supported actions: step {sl.stop}/{N}", flush=True)
        return out

    # ------------------------------------------------------------------
    def _make_q_step(self):
        def q_step(q_params, q_target_params, q_opt_state, batch):
            obs, act = batch["obs"]["state"], batch["act"]
            next_obs, rew, tml = batch["next_obs"]["state"], batch["rew"], batch["tml"]
            sup = batch["supported_act"]
            K = sup.shape[1]
            next_obs_rep = jnp.repeat(next_obs[:, None, :], K, axis=1)
            next_q = self.q_net.apply(q_target_params, next_obs_rep, sup)
            w = jax.nn.softmax(self.betaQ * next_q, axis=1)
            td_target = jax.lax.stop_gradient(
                rew + self.discount * (1 - tml) * (next_q * w).sum(1)
            )

            def loss_fn(p):
                q1, q2 = self.q_net.apply(p, obs, act, method=TwinQ.both)
                return ((q1 - td_target) ** 2 + (q2 - td_target) ** 2).mean()

            loss, grads = jax.value_and_grad(loss_fn)(q_params)
            updates, q_opt_state = self.q_tx.update(grads, q_opt_state, q_params)
            q_params = optax.apply_updates(q_params, updates)
            q_target_params = jax.tree_util.tree_map(
                lambda t, p: 0.995 * t + 0.005 * p, q_target_params, q_params
            )
            return q_params, q_target_params, q_opt_state, loss

        return q_step

    def q_train_step(self, batch):
        """Softmax-weighted TD backup over the support set
        (reference qgpo:139-146)."""
        if "q_step" not in self._fn_cache:
            self._fn_cache["q_step"] = jax.jit(self._make_q_step(),
                                               donate_argnums=(0, 1, 2))
        self.q_params, self.q_target_params, self.q_opt_state, loss = self._fn_cache["q_step"](
            self.q_params, self.q_target_params, self.q_opt_state, batch
        )
        return {"q_loss": loss}  # device scalar (no per-step host sync)
    # ------------------------------------------------------------------
    def cep_train_step(self, batch):
        """Contrastive energy prediction step (reference qgpo:180-196)."""
        next_obs = batch["next_obs"]["state"]
        sup = jnp.asarray(batch["supported_act"])
        K = sup.shape[1]
        next_obs_rep = jnp.repeat(next_obs[:, None, :], K, axis=1)
        pred_q = self.q_net.apply(self.q_params, next_obs_rep, sup)
        soft_label = jax.nn.softmax(self.beta * pred_q, axis=1)
        self._rng, k = jax.random.split(self._rng)
        noisy_act, t, _ = self.actor.add_noise(k, sup)
        return self.classifier.update(
            noisy_act, t, {"soft_label": soft_label, "obs": jnp.asarray(next_obs)}
        )

    # ------------------------------------------------------------------
    def act(self, obs_normed, w_cg: float = 1.0, num_candidates: int = 1,
            sampling_steps: int = 5, rng: Optional[jax.Array] = None):
        """CG-guided eval sampling with optional candidate reweighting
        (reference qgpo:230-258)."""
        self.actor.classifier = self.classifier
        E, K = obs_normed.shape[0], num_candidates
        key = ("act", E, K, sampling_steps, w_cg != 0.0)
        if key not in self._fn_cache:
            sample_fn = self.actor.build_sample_fn(
                solver="ddpm", sample_steps=sampling_steps,
                sample_step_schedule="quad_continuous", cfg_mode="cond",
                use_cg=w_cg != 0.0, final_logp=True,
            )

            def act_fn(params, cls_params, r, obs):
                k_s, k_c = jax.random.split(r)
                obs_rep = jnp.repeat(obs[:, None, :], K, axis=1).reshape(E * K, -1)
                prior = jnp.zeros((E * K, self.act_dim))
                act, log = sample_fn(
                    params, cls_params, k_s, prior,
                    condition_cfg=obs_rep, w_cfg=1.0,
                    condition_cg=obs_rep, w_cg=w_cg,
                )
                logp = log["log_p"].reshape(E, K)
                idx = jax.random.categorical(k_c, logp, axis=-1)
                act = act.reshape(E, K, -1)
                return jnp.take_along_axis(act, idx[:, None, None], axis=1)[:, 0]

            self._fn_cache[key] = jax.jit(act_fn)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        return self._fn_cache[key](
            self.actor.state.ema_params, self.classifier.inference_params, rng,
            jnp.asarray(obs_normed),
        )
