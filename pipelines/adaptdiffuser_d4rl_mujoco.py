"""AdaptDiffuser on D4RL-MuJoCo — CLI entry (reference pipelines/adaptdiffuser_d4rl_mujoco.py).

Modes: train -> finetune (self-evolving) -> inference.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset
from cleandiffuser_tpu.pipelines import AdaptDiffuserPipeline
from cleandiffuser_tpu.pipelines.data_loading import load_d4rl_dataset
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, planner_window_fn, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/adaptdiffuser/mujoco"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    dataset = D4RLMuJoCoDataset(
        load_d4rl_dataset(args.task.env_name), horizon=args.task.horizon,
        terminal_penalty=args.terminal_penalty, discount=args.discount,
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

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train":
        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.diffusion_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{tag}")), logger, args.seed,
            window_fn=planner_window_fn(pipe, dataset, args, mesh),
        )
    elif args.mode == "finetune":
        pipe.load(str(save_path / f"ckpt_{args.ft_ckpt}"))
        # self-evolving buffer target / gradient budget are overridable
        # (`ft_target=... ft_gradient_steps=...`) so smoke runs and the
        # score suite can bound the loop; defaults match the reference
        target = int(args.get("ft_target", 50_000))
        ft_steps = int(args.get("ft_gradient_steps", 200_000))
        max_rounds = int(args.get("ft_max_rounds", 500))
        buffer, rounds = [], 0
        rng = jax.random.PRNGKey(args.seed)
        while sum(t.shape[0] for t in buffer) < target and rounds < max_rounds:
            rng, k = jax.random.split(rng)
            batch = dataset.sample_batch(k, 2000)
            start_obs = np.asarray(batch["obs"]["state"][:, 0])
            traj, _ = pipe.generate_and_filter(start_obs, args.task.metric_value)
            if traj.shape[0]:
                buffer.append(traj)
            rounds += 1
            kept = sum(t.shape[0] for t in buffer)
            print(f"selected {kept}/{target} synthetic trajectories",
                  flush=True)
        if not buffer:
            raise RuntimeError(
                "finetune: the reward filter accepted zero trajectories in "
                f"{rounds} rounds — metric_value {args.task.metric_value} "
                "is above what the trained planner generates")
        buffer = np.concatenate(buffer)[:target]
        rng_np = np.random.default_rng(args.seed)
        for step in range(ft_steps):
            idx = rng_np.integers(0, min(target, buffer.shape[0]), 32)
            log = pipe.finetune_step(buffer[idx])
            if (step + 1) % args.log_interval == 0:
                print({"gradient_steps": step + 1, **log})
            if (step + 1) % args.save_interval == 0:
                # name matches the inference loader's ckpt_<tag> scheme:
                # mode=inference ckpt=finetuned_latest picks this up
                pipe.save(str(save_path / "ckpt_finetuned_latest"))
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{args.ckpt}"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, num_candidates=args.num_candidates)[0],
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "mujoco", parse_cli(sys.argv[1:])))
