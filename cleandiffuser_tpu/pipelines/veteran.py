"""Diffusion Veteran (DV) pipeline (TPU-native).

Re-design of reference pipelines/veteran_d4rl_mujoco.py:29-537. A
ContinuousDiffusionSDE planner (DiT or JannerUNet) over state (or
state-action) trajectories with three guidance modes:

- "MCSS": candidate argmax by summed per-step expected value (IDQLVNet EV
  net trained by TD; plus a DVHorizonCritic value head trained alongside the
  planner);
- "cfg": classifier-free guidance on normalized return;
- "cg": CumRewClassifier gradient guidance (HalfJannerUNet1d).

Action extraction: a DVInvMlp diffusion inverse-dynamics policy conditioned
on (s, s~') (or a plain MlpInvDynamic). Optional exponential
weighted-regression on the planner loss (veteran:230-232). The
`train_expected_value` stage trains the EV net by TD with a Polyak target
(veteran:309-360).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..classifier import CumRewClassifier
from ..diffusion import ContinuousDiffusionSDE, DiscreteDiffusionSDE
from ..nn_classifier import HalfJannerUNet1d
from ..nn_condition import IdentityCondition, MLPCondition
from ..nn_diffusion import DiT1d, DVInvMlp, JannerUNet1d
from ..utils.blocks import DVHorizonCritic, IDQLVNet

__all__ = ["VeteranPipeline"]


@flax.struct.dataclass
class EVState:
    params: Any
    target_params: Any
    opt_state: Any


class VeteranPipeline:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        planner_horizon: int = 32,
        guidance_type: str = "MCSS",  # MCSS | cfg | cg
        pipeline_type: str = "separate",  # separate | joint
        planner_net: str = "transformer",  # transformer | unet
        use_diffusion_invdyn: bool = True,
        use_weighted_regression: bool = False,
        weight_factor: float = 10.0,
        planner_emb_dim: int = 128,
        planner_d_model: int = 320,
        planner_depth: int = 2,
        unet_dim: int = 32,
        next_obs_loss_weight: float = 10.0,
        policy_hidden_dim: int = 256,
        policy_diffusion_steps: int = 5,
        discount: float = 0.997,
        gradient_steps: int = 1_000_000,
        lr: float = 2e-4,
        critic_lr: float = 2e-4,
        planner_solver: str = "ddpm",
        planner_sampling_steps: int = 20,
        policy_solver: str = "ddpm",
        policy_sampling_steps: int = 5,
        w_cfg: float = 1.2,
        target_return: float = 0.9,
        temperature: float = 1.0,
        rebase_policy: bool = False,
        mcss_selector: str = "ev",  # ev | critic
        goal_inpaint: bool = False,
        gi_pin_idx: Optional[int] = None,
        rng: int = 0,
    ):
        assert guidance_type in ("MCSS", "cfg", "cg")
        assert mcss_selector in ("ev", "critic")
        # MCSS candidate scoring: the reference mujoco/antmaze/kitchen CLIs
        # rank by the TD-trained EV net summed over the plan
        # (veteran_d4rl_mujoco.py:441-443), while maze2d ranks by the
        # DVHorizonCritic value head trained alongside the planner
        # (veteran_d4rl_maze2d.py:373-375) — no EV stage exists there.
        self.mcss_selector = mcss_selector
        # Goal inpainting (opt-in extension, NOT reference behavior): pin the
        # plan's final xy to the eval goal during denoising — Diffuser's
        # maze2d protocol (Janner et al.; d4rl maze2d data has roaming
        # collection goals, so value/MCSS ranking alone is goal-agnostic and
        # caps well below the env's expert ceiling; see PARITY.md).
        self.goal_inpaint = goal_inpaint
        # Where in the plan to pin the goal (gi mode). Default H-1 stretches
        # the traverse over (H-1)*stride env steps — with maze2d's
        # horizon 32 x stride 15 that is ~480 steps on a 300-step episode,
        # so plans dawdle while d4rl's maze2d score counts time-to-first-
        # reach (the scripted expert reaches in median 69 steps). Pinning
        # earlier (e.g. 7 ~= 105 steps) demands a time-optimal traverse.
        if gi_pin_idx is not None:
            assert 0 < gi_pin_idx < planner_horizon, (
                f"gi_pin_idx must be in (0, {planner_horizon})")
        self.gi_pin_idx = gi_pin_idx
        assert pipeline_type in ("separate", "joint")
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.rebase_policy = rebase_policy
        self.planner_horizon = planner_horizon
        self.guidance_type, self.pipeline_type = guidance_type, pipeline_type
        self.use_diffusion_invdyn = use_diffusion_invdyn
        self.use_weighted_regression = use_weighted_regression
        self.weight_factor = weight_factor
        self.discount = discount
        self.planner_solver, self.planner_sampling_steps = planner_solver, planner_sampling_steps
        self.policy_solver, self.policy_sampling_steps = policy_solver, policy_sampling_steps
        self.w_cfg, self.target_return, self.temperature = w_cfg, target_return, temperature

        planner_dim = obs_dim if pipeline_type == "separate" else obs_dim + act_dim
        self.planner_dim = planner_dim

        if planner_net == "transformer":
            nn_diffusion = DiT1d(
                in_dim=planner_dim, emb_dim=planner_emb_dim, d_model=planner_d_model,
                n_heads=planner_d_model // 32, depth=planner_depth,
                timestep_emb_type="fourier",
            )
        else:
            nn_diffusion = JannerUNet1d(
                in_dim=planner_dim, model_dim=unet_dim, emb_dim=unet_dim,
                attention=False, kernel_size=5,
            )

        nn_condition = None
        classifier = None
        self.critic = None
        self.critic_params = None
        if guidance_type == "MCSS":
            self.critic = DVHorizonCritic(
                in_dim=planner_dim, emb_dim=planner_emb_dim, d_model=planner_d_model,
                n_heads=planner_d_model // 32, depth=2, norm_type="pre",
            )
            self.critic_tx = optax.adam(critic_lr)
        elif guidance_type == "cfg":
            cond_dim = planner_emb_dim if planner_net == "transformer" else unet_dim
            nn_condition = MLPCondition(
                in_dim=1, out_dim=cond_dim, hidden_dims=(cond_dim,), act=nn.silu,
                dropout=0.25,
            )
        elif guidance_type == "cg":
            nn_classifier = HalfJannerUNet1d(
                horizon=planner_horizon, in_dim=planner_dim, out_dim=1,
                model_dim=unet_dim, emb_dim=unet_dim, kernel_size=3,
            )
            classifier = CumRewClassifier(nn_classifier, rng=rng + 1)

        fix_mask = np.zeros((planner_horizon, planner_dim), np.float32)
        fix_mask[0, :obs_dim] = 1.0
        loss_weight = np.ones((planner_horizon, planner_dim), np.float32)
        loss_weight[1] = next_obs_loss_weight

        self.planner = ContinuousDiffusionSDE(
            nn_diffusion, nn_condition,
            fix_mask=fix_mask, loss_weight=loss_weight, classifier=classifier,
            ema_rate=0.9999, predict_noise=False, noise_schedule="linear",
            optim_params={"lr": optax.cosine_decay_schedule(lr, gradient_steps),
                          "weight_decay": 0.0},
            rng=rng,
        )
        cond_ex = jnp.zeros((1, 1)) if guidance_type == "cfg" else None
        self.planner.init(jnp.zeros((1, planner_horizon, planner_dim)), cond_ex)
        if classifier is not None:
            classifier.init(jnp.zeros((1, planner_horizon, planner_dim)),
                            jnp.zeros((1,)), jnp.zeros((1, 1)))
        if self.critic is not None:
            k = jax.random.PRNGKey(rng + 2)
            def _build_critic(k):
                params = self.critic.init(k, jnp.zeros((1, planner_horizon, planner_dim)))
                return params, self.critic_tx.init(params)

            self.critic_params, self.critic_opt_state = jax.jit(_build_critic)(k)

        # policy / inverse dynamics
        self.policy = None
        self.invdyn = None
        if pipeline_type == "separate":
            if use_diffusion_invdyn:
                self.policy = DiscreteDiffusionSDE(
                    DVInvMlp(obs_dim=obs_dim, act_dim=act_dim, emb_dim=64,
                             hidden_dim=policy_hidden_dim),
                    IdentityCondition(dropout=0.0),
                    predict_noise=True,
                    x_max=np.ones((act_dim,)), x_min=-np.ones((act_dim,)),
                    diffusion_steps=policy_diffusion_steps, ema_rate=0.995,
                    optim_params={"lr": 3e-4, "weight_decay": 0.0},
                    rng=rng + 3,
                )
                self.policy.init(jnp.zeros((1, act_dim)), jnp.zeros((1, 2 * obs_dim)))
            else:
                from ..invdynamic import MlpInvDynamic

                self.invdyn = MlpInvDynamic(obs_dim, act_dim, 512, jnp.tanh,
                                            {"lr": 2e-4}, rng=rng + 3)

        # EV net (MCSS value selection)
        self.ev_net = IDQLVNet(hidden_dim=256)
        k = jax.random.PRNGKey(rng + 4)
        self.ev_tx = optax.adam(3e-4)

        def _build_ev(k):
            ev_params = self.ev_net.init(k, jnp.zeros((1, obs_dim)))
            return EVState(
                params=ev_params,
                target_params=jax.tree_util.tree_map(jnp.copy, ev_params),
                opt_state=self.ev_tx.init(ev_params),
            )

        self.ev_state = jax.jit(_build_ev)(k)

        self._fn_cache = {}
        self._rng = jax.random.PRNGKey(rng + 5)

    # ------------------------------------------------------------------
    def train_step(self, planner_batch, policy_batch=None):
        obs = planner_batch["obs"]["state"]
        act = planner_batch["act"]
        val = planner_batch["val"]
        data = obs if self.pipeline_type == "separate" else jnp.concatenate([obs, act], -1)

        log = {}
        if self.guidance_type == "cfg":
            log["planner_loss"] = self.planner.update(data, val)["loss"]
        elif self.use_weighted_regression:
            wrt = jnp.exp((val - 1.0) * self.weight_factor)
            log["planner_loss"] = self.planner.update(
                data, weighted_regression_tensor=wrt
            )["loss"]
        else:
            log["planner_loss"] = self.planner.update(data)["loss"]

        if self.guidance_type == "MCSS":
            log.update(self._critic_step(data, val))
        elif self.guidance_type == "cg":
            xt, t, _ = self.planner.add_noise(self.planner.next_sample_rng(), data)
            log["classifier_loss"] = self.planner.classifier.update(xt, t, val)["loss"]

        if policy_batch is not None and self.pipeline_type == "separate":
            p_obs = policy_batch["obs"]["state"]
            p_act = policy_batch["act"]
            o0, o1, a0 = p_obs[:, 0], p_obs[:, 1], p_act[:, 0]
            if self.use_diffusion_invdyn:
                log["policy_bc_loss"] = self.policy.update(
                    a0, jnp.concatenate([o0, o1], -1)
                )["loss"]
            else:
                log["invdyn_loss"] = self.invdyn.update(o0, a0, o1)["loss"]
        return log

    def make_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused planner-stage trainer: `n_steps` x (two device gathers +
        planner update + guidance-specific stage + policy/invdyn stage) in
        ONE `lax.scan` program (see runner.make_rl_train_scan). The carry
        is assembled statically from the config (guidance_type x
        pipeline_type), so every veteran variant compiles to a single
        program with no host dispatch inside the window."""
        gather = dataset.gather_fn(batch_size)
        gt, sep = self.guidance_type, self.pipeline_type == "separate"
        use_wrt = gt != "cfg" and self.use_weighted_regression
        wf = self.weight_factor
        pl_raw = self.planner._make_update_fn(update_ema=True, has_wrt=use_wrt)
        pl_raw = getattr(pl_raw, "__wrapped__", pl_raw)
        add_noise = self.planner.add_noise
        critic, critic_tx = self.critic, getattr(self, "critic_tx", None)
        cls_raw = pol_raw = inv_raw = None
        if gt == "cg":
            cls_raw = self.planner.classifier._make_update_fn(update_ema=True)
            cls_raw = getattr(cls_raw, "__wrapped__", cls_raw)
        if sep and self.policy is not None:
            pol_raw = self.policy._make_update_fn(update_ema=True, has_wrt=False)
            pol_raw = getattr(pol_raw, "__wrapped__", pol_raw)
        elif sep:
            inv_raw = getattr(self.invdyn._jit_update, "__wrapped__",
                              self.invdyn._jit_update)

        def body(carry, k):
            st = dict(carry)
            # mirror the sequential CLI's split: k1 -> planner batch,
            # k2 -> policy batch
            k1, k2 = jax.random.split(k)
            pb = gather(k1)
            obs, act, val = pb["obs"]["state"], pb["act"], pb["val"]
            data = obs if sep else jnp.concatenate([obs, act], -1)
            log = {}
            if gt == "cfg":
                st["planner"], plog = pl_raw(st["planner"], data, val, None)
            elif use_wrt:
                wrt = jnp.exp((val - 1.0) * wf)
                st["planner"], plog = pl_raw(st["planner"], data, None, wrt)
            else:
                st["planner"], plog = pl_raw(st["planner"], data, None, None)
            log["planner_loss"] = plog["loss"]

            if gt == "MCSS":
                def loss_fn(p):
                    pred = critic.apply(p, data)
                    return ((pred - val) ** 2).mean(), pred.mean()

                (vl, vp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    st["critic_params"])
                updates, new_opt = critic_tx.update(
                    grads, st["critic_opt"], st["critic_params"])
                st["critic_params"] = optax.apply_updates(st["critic_params"], updates)
                st["critic_opt"] = new_opt
                log["val_loss"], log["val_pred"] = vl, vp
            elif gt == "cg":
                xt, t, _ = add_noise(jax.random.fold_in(k1, 1), data)
                st["classifier"], clog = cls_raw(st["classifier"], xt, t, val)
                log["classifier_loss"] = clog["loss"]

            if sep:
                pb2 = gather(k2)
                p_obs, p_act = pb2["obs"]["state"], pb2["act"]
                o0, o1, a0 = p_obs[:, 0], p_obs[:, 1], p_act[:, 0]
                if pol_raw is not None:
                    st["policy"], plog2 = pol_raw(
                        st["policy"], a0, jnp.concatenate([o0, o1], -1), None)
                    log["policy_bc_loss"] = plog2["loss"]
                else:
                    ip, io, l = inv_raw(st["inv_params"], st["inv_opt"],
                                        jax.random.fold_in(k2, 1), o0, a0, o1)
                    st["inv_params"], st["inv_opt"] = ip, io
                    log["invdyn_loss"] = l
            return st, log

        def fused(carry, rng):
            keys = jax.random.split(rng, n_steps)
            carry, logs = jax.lax.scan(body, carry, keys)
            return carry, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            carry = {"planner": self.planner.state}
            if gt == "MCSS":
                carry["critic_params"] = self.critic_params
                carry["critic_opt"] = self.critic_opt_state
            elif gt == "cg":
                carry["classifier"] = self.planner.classifier.state
            if sep and pol_raw is not None:
                carry["policy"] = self.policy.state
            elif sep:
                carry["inv_params"] = self.invdyn.params
                carry["inv_opt"] = self.invdyn.opt_state
            carry, log = fused_jit(carry, rng)
            self.planner.state = carry["planner"]
            if gt == "MCSS":
                self.critic_params = carry["critic_params"]
                self.critic_opt_state = carry["critic_opt"]
            elif gt == "cg":
                self.planner.classifier.state = carry["classifier"]
            if sep and pol_raw is not None:
                self.policy.state = carry["policy"]
            elif sep:
                self.invdyn.params = carry["inv_params"]
                self.invdyn.opt_state = carry["inv_opt"]
            return log

        return run

    def _critic_step(self, data, val):
        if "critic_step" not in self._fn_cache:
            def critic_step(params, opt_state, data, val):
                def loss_fn(p):
                    pred = self.critic.apply(p, data)
                    return ((pred - val) ** 2).mean(), pred.mean()

                (loss, pred_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = self.critic_tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss, pred_mean

            self._fn_cache["critic_step"] = jax.jit(critic_step, donate_argnums=(0, 1))
        self.critic_params, self.critic_opt_state, loss, pred = self._fn_cache["critic_step"](
            self.critic_params, self.critic_opt_state, data, val
        )
        return {"val_loss": loss, "val_pred": pred}  # device scalars

    # ------------------------------------------------------------------
    def _make_ev_step(self):
        def ev_step(state: EVState, batch):
            obs, next_obs = batch["obs"]["state"], batch["next_obs"]["state"]
            rew, tml = batch["rew"], batch["tml"]
            target_v = jax.lax.stop_gradient(
                rew + (1 - tml) * self.discount
                * self.ev_net.apply(state.target_params, next_obs)
            )

            def loss_fn(p):
                v = self.ev_net.apply(p, obs)
                return ((v - target_v) ** 2).mean(), v.mean()

            (loss, v_mean), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.ev_tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            target = jax.tree_util.tree_map(
                lambda t, p: 0.995 * t + 0.005 * p, state.target_params, params
            )
            return EVState(params, target, opt_state), {"loss_v": loss, "v_mean": v_mean}

        return ev_step

    def train_expected_value_step(self, batch):
        """EV TD step with Polyak target (reference veteran:309-360)."""
        if "ev_step" not in self._fn_cache:
            self._fn_cache["ev_step"] = jax.jit(self._make_ev_step(), donate_argnums=0)
        self.ev_state, log = self._fn_cache["ev_step"](self.ev_state, batch)
        # device scalars: see DiffusionModel.update (no per-step host sync)
        return log

    def make_ev_train_scan(self, dataset, batch_size: int, n_steps: int):
        """Fused EV-stage trainer: `n_steps` x (device gather + TD/Polyak
        update) in ONE `lax.scan` (see runner.make_rl_train_scan)."""
        gather = dataset.gather_fn(batch_size)
        ev_step = self._make_ev_step()

        def fused(state, rng):
            def body(st, k):
                return ev_step(st, gather(k))

            keys = jax.random.split(rng, n_steps)
            state, logs = jax.lax.scan(body, state, keys)
            return state, jax.tree_util.tree_map(lambda v: v.mean(), logs)

        fused_jit = jax.jit(fused, donate_argnums=0)

        def run(rng):
            self.ev_state, log = fused_jit(self.ev_state, rng)
            return log

        return run

    # ------------------------------------------------------------------
    def act(self, obs_normed, num_candidates: int = 32, rng: Optional[jax.Array] = None,
            goal_normed=None):
        E = obs_normed.shape[0]
        with_goal = self.goal_inpaint and goal_normed is not None
        key = ("act", E, num_candidates, with_goal)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._make_act_fn(E, num_candidates, with_goal)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        use_critic = self.guidance_type == "MCSS" and self.mcss_selector == "critic"
        fn_args = (
            self.planner.state.ema_params,
            self.planner.classifier.inference_params if self.guidance_type == "cg" else None,
            self.critic_params if use_critic else self.ev_state.params,
            self.policy.state.ema_params if self.policy is not None else None,
            self.invdyn.params if self.invdyn is not None else None,
            rng,
            jnp.asarray(obs_normed),
        )
        if with_goal:
            fn_args = fn_args + (jnp.asarray(goal_normed),)
        return self._fn_cache[key](*fn_args)

    def _make_act_fn(self, E: int, K: int, with_goal: bool = False):
        H, PD, O = self.planner_horizon, self.planner_dim, self.obs_dim
        gt = self.guidance_type

        eval_fix_mask = None
        pin = self.gi_pin_idx if self.gi_pin_idx is not None else H - 1
        if with_goal:
            # pin the plan's goal-reach xy to the goal during denoising
            # (Diffuser maze2d protocol); training-time mask untouched.
            eval_fix_mask = np.zeros((H, PD), np.float32)
            eval_fix_mask[0, :O] = 1.0
            eval_fix_mask[pin, :2] = 1.0
        planner_sample = self.planner.build_sample_fn(
            solver=self.planner_solver, sample_steps=self.planner_sampling_steps,
            cfg_mode="mix" if gt == "cfg" else "uncond",
            use_cg=gt == "cg", final_logp=gt == "cg",
            fix_mask=eval_fix_mask,
        )
        policy_sample = (
            self.policy.build_sample_fn(
                solver=self.policy_solver, sample_steps=self.policy_sampling_steps,
                cfg_mode="cond", final_logp=False,
            )
            if self.policy is not None
            else None
        )
        invdyn_fn = self.invdyn.pure_predict_fn() if self.invdyn is not None else None

        def act_fn(planner_params, cls_params, ev_params, policy_params, invdyn_params,
                   rng, obs, goal=None):
            k_plan, k_policy = jax.random.split(rng)
            if gt in ("MCSS", "cg"):
                obs_rep = jnp.repeat(obs[:, None, :], K, axis=1).reshape(E * K, O)
                prior = jnp.zeros((E * K, H, PD)).at[:, 0, :O].set(obs_rep)
                if goal is not None:
                    goal_rep = jnp.repeat(goal[:, None, :], K, axis=1).reshape(E * K, 2)
                    prior = prior.at[:, pin, :2].set(goal_rep)
                traj, log = planner_sample(
                    planner_params, cls_params, k_plan, prior,
                    w_cg=self.w_cfg if gt == "cg" else 0.0,
                    temperature=self.temperature,
                )
                if gt == "MCSS":
                    if self.mcss_selector == "critic":
                        value = self.critic.apply(ev_params, traj).reshape(E, K)
                    else:
                        value = self.ev_net.apply(ev_params, traj[..., :O])[:, 1:].sum(1)
                        value = value.reshape(E, K)
                else:
                    value = log["log_p"].reshape(E, K)
                idx = value.argmax(-1)
                traj = traj.reshape(E, K, H, PD)[jnp.arange(E), idx]
            else:  # cfg
                condition = jnp.ones((E, 1)) * self.target_return
                prior = jnp.zeros((E, H, PD)).at[:, 0, :O].set(obs)
                if goal is not None:
                    prior = prior.at[:, pin, :2].set(goal)
                traj, _ = planner_sample(
                    planner_params, None, k_plan, prior,
                    condition_cfg=condition, w_cfg=self.w_cfg,
                    temperature=self.temperature,
                )

            if self.pipeline_type == "separate":
                next_obs_plan = traj[:, 1, :O]
                if policy_sample is not None:
                    obs_pol, next_pol = obs, next_obs_plan
                    if self.rebase_policy:
                        # translate the (s, s') pair so s sits at the origin
                        # in xy — antmaze translation invariance (reference
                        # veteran_d4rl_mujoco.py:490-492)
                        next_pol = next_pol.at[:, :2].add(-obs_pol[:, :2])
                        obs_pol = obs_pol.at[:, :2].set(0.0)
                    act, _ = policy_sample(
                        policy_params, None, k_policy, jnp.zeros((E, self.act_dim)),
                        condition_cfg=jnp.concatenate([obs_pol, next_pol], -1), w_cfg=1.0,
                    )
                else:
                    act = invdyn_fn(invdyn_params, obs, next_obs_plan)
            else:
                act = traj[:, 0, O:]
            return act, traj

        return jax.jit(act_fn)

    # ------------------------------------------------------------------
    def save(self, path: str):
        """Checkpoint EVERY inference-relevant component in one file —
        planner + (critic | classifier) + (policy | invdyn) + EV state.
        The reference saves these as separate .pt files
        (veteran_d4rl_maze2d.py:278-293); one pickle keeps the CLI's
        save_fn a single call."""
        import pickle
        from pathlib import Path

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
        state = {"planner": to_np(self.planner.state), "ev": to_np(self.ev_state)}
        if self.critic is not None:
            state["critic_params"] = to_np(self.critic_params)
            state["critic_opt"] = to_np(self.critic_opt_state)
        if self.planner.classifier is not None:
            state["classifier"] = to_np(self.planner.classifier.state)
        if self.policy is not None:
            state["policy"] = to_np(self.policy.state)
        if self.invdyn is not None:
            state["invdyn_params"] = to_np(self.invdyn.params)
            state["invdyn_opt"] = to_np(self.invdyn.opt_state)
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path: str):
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        to_dev = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
        self.planner.state = to_dev(state["planner"])
        self.ev_state = to_dev(state["ev"])
        if self.critic is not None and "critic_params" in state:
            self.critic_params = to_dev(state["critic_params"])
            self.critic_opt_state = to_dev(state["critic_opt"])
        if self.planner.classifier is not None and "classifier" in state:
            self.planner.classifier.state = to_dev(state["classifier"])
        if self.policy is not None and "policy" in state:
            self.policy.state = to_dev(state["policy"])
        if self.invdyn is not None and "invdyn_params" in state:
            self.invdyn.params = to_dev(state["invdyn_params"])
            self.invdyn.opt_state = to_dev(state["invdyn_opt"])
