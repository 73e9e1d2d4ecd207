"""One-off generator for the antmaze/kitchen/maze2d config trees.

Hyperparameter values mirror the reference configs/<algo>/<bench>/ tree
(the required "same Hydra config surface"); file format matches our
existing configs/<algo>/mujoco layout.
"""

from pathlib import Path

ROOT = Path(__file__).resolve().parents[1] / "configs"

DIMS = {"antmaze": (29, 8), "kitchen": (60, 9), "maze2d": (4, 2)}

ANTMAZE_TASKS = ["antmaze-medium-play-v2", "antmaze-medium-diverse-v2",
                 "antmaze-large-play-v2", "antmaze-large-diverse-v2"]
KITCHEN_TASKS = ["kitchen-mixed-v0", "kitchen-partial-v0"]
MAZE2D_TASKS = ["maze2d-umaze-v1", "maze2d-medium-v1", "maze2d-large-v1"]


def write(algo, bench, base: dict, tasks: dict):
    d = ROOT / algo / bench
    (d / "task").mkdir(parents=True, exist_ok=True)
    default_task = next(iter(tasks))
    lines = ["defaults:", "- _self_", f"- task: {default_task}"]
    for k, v in base.items():
        lines.append(f"{k}: {_fmt(v)}")
    (d / f"{bench}.yaml").write_text("\n".join(lines) + "\n")
    o_dim, a_dim = DIMS[bench]
    for name, fields in tasks.items():
        tl = [f"env_name: {name}", f"obs_dim: {o_dim}", f"act_dim: {a_dim}"]
        for k, v in fields.items():
            tl.append(f"{k}: {_fmt(v)}")
        (d / "task" / f"{name}.yaml").write_text("\n".join(tl) + "\n")
    print(f"wrote configs/{algo}/{bench} ({len(tasks)} tasks)")


def _fmt(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "\n" + "\n".join(f"- {x}" for x in v)
    return str(v)


# ---------------------------------------------------------------- diffuser
diffuser_base = dict(mode="train", seed=0, solver="ddpm", model_dim=64,
                     diffusion_steps=20, sampling_steps=20, predict_noise=False,
                     action_loss_weight=10.0, ema_rate=0.9999,
                     diffusion_gradient_steps=1000000,
                     classifier_gradient_steps=1000000, batch_size=64,
                     log_interval=1000, save_interval=100000, ckpt="latest",
                     num_envs=50, num_episodes=3, num_candidates=64,
                     temperature=0.5, use_ema=True)
write("diffuser", "antmaze",
      dict(pipeline_name="diffuser_d4rl_antmaze", noreaching_penalty=-100,
           discount=0.99, **diffuser_base),
      {t: dict(dim_mult=[1, 2, 2, 2], w_cg=0.001, horizon=64) for t in ANTMAZE_TASKS})
write("diffuser", "kitchen",
      dict(pipeline_name="diffuser_d4rl_kitchen", discount=0.997, **diffuser_base),
      {"kitchen-mixed-v0": dict(dim_mult=[1, 2, 2, 2], w_cg=0.0001, horizon=32),
       "kitchen-partial-v0": dict(dim_mult=[1, 2, 2, 2], w_cg=0.01, horizon=32)})

# ------------------------------------------------------------ adaptdiffuser
ad_base = dict(diffuser_base, mode="inference", ft_ckpt="latest")
write("adaptdiffuser", "antmaze",
      dict(pipeline_name="adaptdiffuser_d4rl_antmaze", noreaching_penalty=-100,
           discount=0.99, **ad_base),
      {t: dict(dim_mult=[1, 2, 2, 2], w_cg=0.001, horizon=64, metric_value=-80)
       for t in ANTMAZE_TASKS})
write("adaptdiffuser", "kitchen",
      dict(pipeline_name="adaptdiffuser_d4rl_kitchen", discount=0.997, **ad_base),
      {"kitchen-mixed-v0": dict(dim_mult=[1, 2, 2, 2], w_cg=0.0001, horizon=32,
                                metric_value=380),
       "kitchen-partial-v0": dict(dim_mult=[1, 2, 2, 2], w_cg=0.01, horizon=32,
                                  metric_value=480)})

# ---------------------------------------------------------------------- dd
dd_base = dict(mode="train", seed=0, solver="ddim", emb_dim=128, d_model=320,
               n_heads=10, depth=2, label_dropout=0.25, sampling_steps=20,
               predict_noise=True, next_obs_loss_weight=10.0, ema_rate=0.9999,
               diffusion_gradient_steps=1000000, invdyn_gradient_steps=200000,
               batch_size=64, log_interval=1000, save_interval=100000,
               diffusion_ckpt="latest", invdyn_ckpt="latest", num_envs=50,
               num_episodes=3, temperature=0.5, use_ema=True)
write("dd", "antmaze",
      dict(pipeline_name="dd_d4rl_antmaze", noreaching_penalty=-100,
           discount=0.99, **dd_base),
      {t: dict(target_return=0.3, w_cfg=2.5, horizon=64) for t in ANTMAZE_TASKS})
write("dd", "kitchen",
      dict(pipeline_name="dd_d4rl_kitchen", discount=0.997, **dd_base),
      {t: dict(target_return=0.85, w_cfg=1.0, horizon=32) for t in KITCHEN_TASKS})

# ----------------------------------------------------------------- dql/edp
dql_base = dict(mode="train", seed=0, discount=0.99, solver="ddpm",
                diffusion_steps=5, sampling_steps=5, predict_noise=True,
                ema_rate=0.995, actor_learning_rate=0.0003, hidden_dim=256,
                critic_learning_rate=0.0003, gradient_steps=2000000,
                batch_size=256, ema_update_interval=5, log_interval=1000,
                save_interval=100000, ckpt="latest", num_envs=50,
                num_episodes=3, num_candidates=50, temperature=0.5, use_ema=True)
DQL_ANTMAZE_TASK = {
    "antmaze-medium-play-v2": dict(weight_temperature=10.0, eta=2.0),
    "antmaze-medium-diverse-v2": dict(weight_temperature=5.0, eta=3.0),
    "antmaze-large-play-v2": dict(weight_temperature=5.0, eta=4.5),
    "antmaze-large-diverse-v2": dict(weight_temperature=10.0, eta=3.5),
}
write("dql", "antmaze", dict(pipeline_name="dql_d4rl_antmaze", **dql_base),
      DQL_ANTMAZE_TASK)
write("dql", "kitchen", dict(pipeline_name="dql_d4rl_kitchen", **dql_base),
      {t: dict(weight_temperature=3.0, eta=0.005) for t in KITCHEN_TASKS})

edp_antmaze = dict(dql_base, solver="ddim", diffusion_steps=50,
                   sampling_steps=15, num_candidates=200)
edp_antmaze.pop("predict_noise")
edp_kitchen = dict(dql_base, solver="ode_dpmsolver++_2M", diffusion_steps=50,
                   sampling_steps=15)
edp_kitchen.pop("predict_noise")
write("edp", "antmaze", dict(pipeline_name="edp_d4rl_antmaze", **edp_antmaze),
      DQL_ANTMAZE_TASK)
write("edp", "kitchen", dict(pipeline_name="edp_d4rl_kitchen", **edp_kitchen),
      {t: dict(weight_temperature=5.0, eta=0.005) for t in KITCHEN_TASKS})

# -------------------------------------------------------------------- idql
idql_base = dict(mode="train", seed=0, discount=0.99, solver="ddpm",
                 diffusion_steps=5, sampling_steps=5, predict_noise=True,
                 ema_rate=0.9999, actor_learning_rate=0.0003,
                 actor_hidden_dim=256, actor_n_blocks=3, actor_dropout=0.1,
                 critic_hidden_dim=256, critic_learning_rate=0.0003,
                 gradient_steps=2000000, batch_size=256, log_interval=1000,
                 save_interval=100000, ckpt="latest", num_envs=50,
                 num_episodes=3, num_candidates=256, temperature=0.5,
                 use_ema=True)
write("idql", "antmaze",
      dict(pipeline_name="idql_d4rl_antmaze", iql_tau=0.9, **idql_base),
      {t: dict(weight_temperature=5.0) for t in ANTMAZE_TASKS})
write("idql", "kitchen",
      dict(pipeline_name="idql_d4rl_kitchen", iql_tau=0.7, **idql_base),
      {t: dict(weight_temperature=1.0) for t in KITCHEN_TASKS})

# ------------------------------------------------------------------ synther
syn_base = dict(mode="train_diffusion", seed=0, solver="ddpm",
                predict_noise=True, diffusion_steps=128,
                diffusion_learning_rate=0.0003, ema_rate=0.999,
                diffusion_gradient_steps=200000, td3bc_gradient_steps=1000000,
                num_transitions=5000000, batch_size=256, log_interval=1000,
                save_interval=100000, num_envs=50, num_episodes=3)
write("synther", "antmaze", dict(pipeline_name="synther_d4rl_antmaze", **syn_base),
      {t: {} for t in ANTMAZE_TASKS})
write("synther", "kitchen", dict(pipeline_name="synther_d4rl_kitchen", **syn_base),
      {t: {} for t in KITCHEN_TASKS})

# ------------------------------------------------------------------ veteran
vet_base = dict(mode="train", seed=0, guidance_type="MCSS",
                planner_net="transformer", pipeline_type="separate",
                planner_solver="ddim", planner_emb_dim=128, planner_d_model=256,
                planner_sampling_steps=20, planner_predict_noise=True,
                planner_next_obs_loss_weight=1, planner_ema_rate=0.9999,
                use_weighted_regression=False, weight_factor=0.01,
                policy_solver="ddpm", policy_hidden_dim=256,
                policy_diffusion_steps=10, policy_sampling_steps=10,
                policy_learning_rate=0.0003, critic_learning_rate=0.0003,
                use_diffusion_invdyn=1, invdyn_gradient_steps=200000,
                policy_diffusion_gradient_steps=1000000,
                planner_diffusion_gradient_steps=1000000, batch_size=128,
                log_interval=1000, save_interval=100000, num_envs=50,
                num_episodes=20, planner_num_candidates=50,
                policy_temperature=0.5, policy_use_ema=True,
                planner_use_ema=True)


def vet_tasks(names, horizon, stride, mpl):
    return {n: dict(max_path_length=m, planner_horizon=horizon, stride=stride,
                    planner_temperature=1.0, planner_target_return=1.0,
                    planner_w_cfg=1.0)
            for n, m in zip(names, mpl)}


write("veteran", "antmaze",
      dict(pipeline_name="veteran_d4rl_antmaze", planner_depth=8, unet_dim=64,
           reward_tune="iql", continous_reward_at_done=True, discount=1.0,
           **vet_base),
      vet_tasks(ANTMAZE_TASKS, 40, 25, [1000] * 4))
write("veteran", "kitchen",
      dict(dict(vet_base, planner_num_candidates=150),
           pipeline_name="veteran_d4rl_kitchen", planner_depth=2, unet_dim=32,
           discount=0.997),
      vet_tasks(KITCHEN_TASKS, 32, 4, [280, 280]))
write("veteran", "maze2d",
      dict(pipeline_name="veteran_d4rl_maze2d", planner_depth=2, unet_dim=32,
           reward_tune="iql", continous_reward_at_done=True, discount=1.0,
           **vet_base),
      vet_tasks(MAZE2D_TASKS, 32, 15, [300, 600, 800]))

print("done")
