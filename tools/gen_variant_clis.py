"""One-off generator for the d4rl benchmark-variant CLI entry points.

Run from repo root: python tools/gen_variant_clis.py
Each emitted file is a standalone CLI mirroring the reference's
pipelines/<algo>_d4rl_<bench>.py behavior on the TPU-native stack.
"""

from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
OUT = ROOT / "pipelines"

HEAD = '''"""{title} on D4RL-{Bench} — CLI entry (reference pipelines/{fname}).

Usage:
    python pipelines/{fname} mode=train task={default_task}
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

{imports}
from cleandiffuser_tpu.pipelines.data_loading import (
    load_d4rl_dataset,
    load_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/{algo}/{bench}"


def pipeline(args):
    set_seed(args.seed)
    save_path = Path(f"results/{{args.pipeline_name}}/{{args.task.env_name}}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

{body}
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "{bench}", parse_cli(sys.argv[1:])))
'''

BENCH = {
    "antmaze": dict(Bench="Antmaze", default_task="antmaze-medium-play-v2",
                    reward_mode="antmaze",
                    seq_ds="D4RLAntmazeDataset",
                    seq_args="horizon=args.task.horizon,\n        "
                             "noreaching_penalty=args.noreaching_penalty, discount=args.discount",
                    td_ds="D4RLAntmazeTDDataset", td_args=""),
    "kitchen": dict(Bench="Kitchen", default_task="kitchen-mixed-v0",
                    reward_mode="kitchen",
                    seq_ds="D4RLKitchenDataset",
                    seq_args="horizon=args.task.horizon, discount=args.discount",
                    td_ds="D4RLKitchenTDDataset", td_args=""),
}


def emit(algo, bench, title, imports, body, fname=None):
    fname = fname or f"{algo}_d4rl_{bench}.py"
    b = BENCH.get(bench, dict(Bench=bench.capitalize(), default_task=""))
    src = HEAD.format(title=title, Bench=b["Bench"], fname=fname,
                      default_task=b["default_task"], imports=imports,
                      algo=algo, bench=bench, body=body)
    (OUT / fname).write_text(src)
    print("wrote", fname)


# ---------------------------------------------------------------- diffuser
for bench, b in BENCH.items():
    imports = (f"from cleandiffuser_tpu.dataset import {b['seq_ds']}\n"
               "from cleandiffuser_tpu.pipelines import DiffuserPipeline")
    body = f'''    dataset = {b['seq_ds']}(
        load_d4rl_dataset(args.task.env_name), {b['seq_args']},
    )
    pipe = DiffuserPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim, horizon=args.task.horizon,
        model_dim=args.model_dim, dim_mult=tuple(args.task.dim_mult),
        diffusion_steps=args.diffusion_steps, sampling_steps=args.sampling_steps,
        solver=args.solver, predict_noise=args.predict_noise,
        action_loss_weight=args.action_loss_weight, ema_rate=args.ema_rate,
        diffusion_gradient_steps=args.diffusion_gradient_steps,
        classifier_gradient_steps=args.classifier_gradient_steps,
        w_cg=args.task.w_cg, temperature=args.temperature, rng=args.seed,
    )

    if args.mode == "train":
        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.diffusion_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{{tag}}")), logger, args.seed,
        )
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{{args.ckpt}}"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, num_candidates=args.num_candidates)[0],
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="{b['reward_mode']}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
    emit("diffuser", bench, "Diffuser", imports, body)

# ------------------------------------------------------------ adaptdiffuser
for bench, b in BENCH.items():
    imports = (f"from cleandiffuser_tpu.dataset import {b['seq_ds']}\n"
               "from cleandiffuser_tpu.pipelines import AdaptDiffuserPipeline")
    body = f'''    dataset = {b['seq_ds']}(
        load_d4rl_dataset(args.task.env_name), {b['seq_args']},
    )
    pipe = AdaptDiffuserPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim, horizon=args.task.horizon,
        model_dim=args.model_dim, dim_mult=tuple(args.task.dim_mult),
        diffusion_steps=args.diffusion_steps, sampling_steps=args.sampling_steps,
        solver=args.solver, predict_noise=args.predict_noise,
        action_loss_weight=args.action_loss_weight, ema_rate=args.ema_rate,
        diffusion_gradient_steps=args.diffusion_gradient_steps,
        classifier_gradient_steps=args.classifier_gradient_steps,
        w_cg=args.task.w_cg, temperature=args.temperature, rng=args.seed,
    )

    if args.mode == "train":
        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.diffusion_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{{tag}}")), logger, args.seed,
        )
    elif args.mode == "finetune":
        # self-evolving stage: generate plans, keep those whose classifier
        # value clears args.task.metric_value, fine-tune on the kept set
        # (reference adaptdiffuser_d4rl_{bench}.py mode=finetune).
        pipe.load(str(save_path / f"ckpt_{{args.ft_ckpt}}"))
        buffer, target = [], 50_000
        rng = jax.random.PRNGKey(args.seed)
        while sum(t.shape[0] for t in buffer) < target:
            rng, k = jax.random.split(rng)
            batch = dataset.sample_batch(k, 2000)
            start_obs = np.asarray(batch["obs"]["state"][:, 0])
            traj, _ = pipe.generate_and_filter(start_obs, args.task.metric_value)
            if traj.shape[0]:
                buffer.append(traj)
            kept = sum(t.shape[0] for t in buffer)
            print(f"selected {{kept}}/{{target}} synthetic trajectories")
        buffer = np.concatenate(buffer)[:target]
        rng_np = np.random.default_rng(args.seed)
        for step in range(200_000):
            idx = rng_np.integers(0, target, 32)
            log = pipe.finetune_step(buffer[idx])
            if (step + 1) % args.log_interval == 0:
                print({{"gradient_steps": step + 1, **log}})
            if (step + 1) % args.save_interval == 0:
                pipe.save(str(save_path / "finetuned_ckpt_latest"))
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{{args.ckpt}}"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, num_candidates=args.num_candidates)[0],
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="{b['reward_mode']}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
    emit("adaptdiffuser", bench, "AdaptDiffuser", imports, body)

# ---------------------------------------------------------------------- dd
for bench, b in BENCH.items():
    val_shift = "1.0" if bench == "antmaze" else "0.0"
    imports = (f"from cleandiffuser_tpu.dataset import {b['seq_ds']}\n"
               "from cleandiffuser_tpu.pipelines import DDPipeline\n"
               "from cleandiffuser_tpu.utils import DD_RETURN_SCALE")
    body = f'''    dataset = {b['seq_ds']}(
        load_d4rl_dataset(args.task.env_name), {b['seq_args']},
    )
    pipe = DDPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim, horizon=args.task.horizon,
        emb_dim=args.emb_dim, d_model=args.d_model, n_heads=args.n_heads,
        depth=args.depth, label_dropout=args.label_dropout,
        predict_noise=args.predict_noise,
        next_obs_loss_weight=args.next_obs_loss_weight,
        return_scale=DD_RETURN_SCALE.get(args.task.env_name, 100.0),
        val_shift={val_shift},
        ema_rate=args.ema_rate,
        diffusion_gradient_steps=args.diffusion_gradient_steps,
        invdyn_gradient_steps=args.invdyn_gradient_steps,
        solver=args.solver, sampling_steps=args.sampling_steps,
        w_cfg=args.task.w_cfg, target_return=args.task.target_return,
        temperature=args.temperature, rng=args.seed,
    )

    if args.mode == "train":
        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.diffusion_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{{tag}}")), logger, args.seed,
        )
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{{args.diffusion_ckpt}}"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs)[0], args.task.env_name,
            dataset.get_normalizer(), args.num_envs, args.num_episodes,
            args.seed, logger=logger, reward_mode="{b['reward_mode']}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
    emit("dd", bench, "Decision Diffuser", imports, body)

# ----------------------------------------------------------------- dql/edp
for algo, Pipe in (("dql", "DQLPipeline"), ("edp", "EDPPipeline")):
    for bench, b in BENCH.items():
        maxq = "10" if bench == "antmaze" else "0"
        imports = (f"from cleandiffuser_tpu.dataset import {b['td_ds']}\n"
                   f"from cleandiffuser_tpu.pipelines import {Pipe}")
        extra = "" if algo == "edp" else "\n        predict_noise=args.predict_noise,"
        body = f'''    dataset = {b['td_ds']}(load_d4rl_qlearning_dataset(args.task.env_name))
    pipe = {Pipe}(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        diffusion_steps=args.diffusion_steps, sampling_steps=args.sampling_steps,
        solver=args.solver, hidden_dim=args.hidden_dim,
        actor_lr=args.actor_learning_rate, critic_lr=args.critic_learning_rate,
        gradient_steps=args.gradient_steps, discount=args.discount,
        eta=args.task.eta, ema_rate=args.ema_rate,
        ema_update_interval=args.ema_update_interval,{extra}
        max_q_backup={maxq}, rng=args.seed,
    )

    if args.mode == "train":
        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{{tag}}.pkl")), logger, args.seed,
        )
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{{args.ckpt}}.pkl"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(
                nobs, num_candidates=args.num_candidates,
                weight_temperature=args.task.weight_temperature,
                use_ema=args.use_ema, temperature=args.temperature,
            ),
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="{b['reward_mode']}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
        emit(algo, bench, algo.upper(), imports, body)

# -------------------------------------------------------------------- idql
for bench, b in BENCH.items():
    imports = (f"from cleandiffuser_tpu.dataset import {b['td_ds']}\n"
               "from cleandiffuser_tpu.pipelines import IDQLPipeline")
    body = f'''    dataset = {b['td_ds']}(load_d4rl_qlearning_dataset(args.task.env_name))
    pipe = IDQLPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        diffusion_steps=args.diffusion_steps, sampling_steps=args.sampling_steps,
        solver=args.solver, actor_hidden_dim=args.actor_hidden_dim,
        actor_n_blocks=args.actor_n_blocks, actor_dropout=args.actor_dropout,
        critic_hidden_dim=args.critic_hidden_dim,
        actor_lr=args.actor_learning_rate, critic_lr=args.critic_learning_rate,
        gradient_steps=args.gradient_steps, discount=args.discount,
        iql_tau=args.iql_tau, ema_rate=args.ema_rate,
        predict_noise=args.predict_noise, rng=args.seed,
    )

    if args.mode == "train":
        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{{tag}}.pkl")), logger, args.seed,
        )
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{{args.ckpt}}.pkl"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(
                nobs, num_candidates=args.num_candidates,
                weight_temperature=args.task.weight_temperature,
                temperature=args.temperature, use_ema=args.use_ema,
            ),
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="{b['reward_mode']}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
    emit("idql", bench, "IDQL", imports, body)

# ------------------------------------------------------------------ synther
for bench, b in BENCH.items():
    # real antmaze rewards get the iql tune inside D4RLAntmazeTDDataset;
    # synthetic ones are generated in the tuned space already, so stay raw
    # (reference synther_d4rl_antmaze.py keeps extra_rewards untouched).
    extra_rew = "extra[:, o + a : o + a + 1]"
    imports = (f"from cleandiffuser_tpu.dataset import {b['td_ds']}\n"
               "from cleandiffuser_tpu.pipelines import SynthERPipeline\n"
               "from cleandiffuser_tpu.pipelines.synther import TD3BC")
    body = f'''    raw = load_d4rl_qlearning_dataset(args.task.env_name)
    dataset = {b['td_ds']}(raw)
    synther = SynthERPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        diffusion_steps=args.diffusion_steps, lr=args.diffusion_learning_rate,
        gradient_steps=args.diffusion_gradient_steps, ema_rate=args.ema_rate,
        rng=args.seed,
    )
    extra_path = save_path / "extra_transitions.npy"

    if args.mode == "train_diffusion":
        train_loop(
            lambda k: synther.train_step(dataset.sample_batch(k, args.batch_size)),
            args.diffusion_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: synther.diffusion.save(str(save_path / f"diff_ckpt_{{tag}}")),
            logger, args.seed,
        )
    elif args.mode == "transition_generation":
        synther.diffusion.load(str(save_path / "diff_ckpt_latest"))
        extra = synther.generate_transitions(args.num_transitions)
        np.save(extra_path, extra)
    elif args.mode == "train_td3bc":
        extra = np.load(extra_path)
        mixed = {b['td_ds']}(raw)
        o, a = mixed.o_dim, mixed.a_dim
        mixed.obs = np.concatenate([mixed.obs, extra[:, :o]], 0)
        mixed.act = np.concatenate([mixed.act, extra[:, o:o + a].clip(-1, 1)], 0)
        mixed.rew = np.concatenate([mixed.rew, {extra_rew}], 0)
        mixed.next_obs = np.concatenate(
            [mixed.next_obs, extra[:, o + a + 1 : 2 * o + a + 1]], 0)
        mixed.tml = np.concatenate(
            [mixed.tml, (extra[:, -1:] > 0.5).astype(np.float32)], 0)
        mixed.size = mixed.obs.shape[0]
        from cleandiffuser_tpu.dataset.base import DeviceTDSampler
        mixed._sampler = DeviceTDSampler(
            {{"obs": mixed.obs, "next_obs": mixed.next_obs, "act": mixed.act,
              "rew": mixed.rew, "tml": mixed.tml}})
        agent = TD3BC(obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
                      gradient_steps=args.td3bc_gradient_steps, rng=args.seed)
        train_loop(
            lambda k: agent.update(mixed.sample_batch(k, args.batch_size)),
            args.td3bc_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: None, logger, args.seed,
        )
        import pickle
        with open(save_path / "td3bc.pkl", "wb") as f:
            pickle.dump(jax.tree_util.tree_map(np.asarray, agent.state), f)
    elif args.mode == "inference":
        import pickle
        agent = TD3BC(obs_dim=dataset.o_dim, act_dim=dataset.a_dim, rng=args.seed)
        with open(save_path / "td3bc.pkl", "rb") as f:
            import jax.numpy as jnp
            agent.state = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
        d4rl_eval_loop(
            lambda nobs: agent.act(nobs), args.task.env_name,
            dataset.get_normalizer(), args.num_envs, args.num_episodes,
            args.seed, logger=logger, reward_mode="{b['reward_mode']}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
    emit("synther", bench, "SynthER", imports, body)

# ------------------------------------------------------------------ veteran
VET_DS = {
    "antmaze": ("DV_D4RLAntmazeSeqDataset",
                "discount=args.discount, center_mapping=(args.guidance_type != \"cfg\"),\n"
                "        reward_tune=args.reward_tune,\n"
                "        continous_reward_at_done=args.continous_reward_at_done,\n"
                "        stride=args.task.stride", "antmaze"),
    "kitchen": ("DV_D4RLKitchenSeqDataset",
                "discount=args.discount, center_mapping=(args.guidance_type != \"cfg\"),\n"
                "        stride=args.task.stride", "kitchen"),
    "maze2d": ("DV_D4RLMaze2DSeqDataset",
               "discount=args.discount, center_mapping=(args.guidance_type != \"cfg\"),\n"
               "        reward_tune=args.reward_tune,\n"
               "        continous_reward_at_done=args.continous_reward_at_done,\n"
               "        stride=args.task.stride", "maze2d"),
}
for bench, (ds, ds_args, rmode) in VET_DS.items():
    td_line = {
        "antmaze": "D4RLAntmazeTDDataset(load_d4rl_qlearning_dataset(args.task.env_name))",
        "kitchen": "D4RLKitchenTDDataset(load_d4rl_qlearning_dataset(args.task.env_name))",
        "maze2d": "D4RLMaze2DTDDataset(load_d4rl_qlearning_dataset(args.task.env_name))",
    }[bench]
    td_cls = td_line.split("(")[0]
    imports = (f"from cleandiffuser_tpu.dataset import {ds}, {td_cls}\n"
               "from cleandiffuser_tpu.pipelines import VeteranPipeline")
    BENCH.setdefault("maze2d", dict(Bench="Maze2d", default_task="maze2d-umaze-v1"))
    body = f'''    dataset = {ds}(
        load_d4rl_dataset(args.task.env_name), horizon=args.task.planner_horizon,
        {ds_args},
    )
    pipe = VeteranPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        planner_horizon=args.task.planner_horizon,
        guidance_type=args.guidance_type, pipeline_type=args.pipeline_type,
        planner_net=args.planner_net,
        use_diffusion_invdyn=args.use_diffusion_invdyn,
        use_weighted_regression=args.use_weighted_regression,
        weight_factor=args.weight_factor, planner_emb_dim=args.planner_emb_dim,
        planner_d_model=args.planner_d_model, planner_depth=args.planner_depth,
        unet_dim=args.unet_dim,
        next_obs_loss_weight=args.planner_next_obs_loss_weight,
        policy_hidden_dim=args.policy_hidden_dim,
        policy_diffusion_steps=args.policy_diffusion_steps,
        discount=args.discount, gradient_steps=args.planner_diffusion_gradient_steps,
        critic_lr=args.critic_learning_rate, planner_solver=args.planner_solver,
        planner_sampling_steps=args.planner_sampling_steps,
        policy_solver=args.policy_solver,
        policy_sampling_steps=args.policy_sampling_steps,
        w_cfg=args.task.planner_w_cfg, target_return=args.task.planner_target_return,
        temperature=args.task.planner_temperature, rng=args.seed,
    )

    if args.mode == "train":
        def step(k):
            k1, k2 = jax.random.split(k)
            return pipe.train_step(
                dataset.sample_batch(k1, args.batch_size),
                dataset.sample_batch(k2, args.batch_size),
            )

        train_loop(step, args.planner_diffusion_gradient_steps, args.log_interval,
                   args.save_interval,
                   lambda tag: pipe.planner.save(str(save_path / f"planner_{{tag}}")),
                   logger, args.seed)
    elif args.mode == "train_expected_value":
        td = {td_line}
        train_loop(
            lambda k: pipe.train_expected_value_step(td.sample_batch(k, 256)),
            1_000_000, args.log_interval, args.save_interval,
            lambda tag: None, logger, args.seed,
        )
    elif args.mode == "inference":
        pipe.planner.load(str(save_path / "planner_latest"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, num_candidates=args.planner_num_candidates)[0],
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="{rmode}",
        )
    else:
        raise ValueError(f"Invalid mode: {{args.mode}}")'''
    emit("veteran", bench, "Diffusion Veteran", imports, body)

print("done")
