"""AdaptDiffuser on D4RL-Kitchen — CLI entry (reference pipelines/adaptdiffuser_d4rl_kitchen.py).

Usage:
    python pipelines/adaptdiffuser_d4rl_kitchen.py mode=train task=kitchen-mixed-v0
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLKitchenDataset
from cleandiffuser_tpu.pipelines import AdaptDiffuserPipeline
from cleandiffuser_tpu.pipelines.data_loading import (
    load_d4rl_dataset,
    load_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, planner_window_fn, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/adaptdiffuser/kitchen"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    dataset = D4RLKitchenDataset(
        load_d4rl_dataset(args.task.env_name), horizon=args.task.horizon, discount=args.discount,
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
        # self-evolving stage: generate plans, keep those whose classifier
        # value clears args.task.metric_value, fine-tune on the kept set
        # (reference adaptdiffuser_d4rl_kitchen.py mode=finetune).
        pipe.load(str(save_path / f"ckpt_{args.ft_ckpt}"))
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
            print(f"selected {kept}/{target} synthetic trajectories")
        buffer = np.concatenate(buffer)[:target]
        rng_np = np.random.default_rng(args.seed)
        for step in range(200_000):
            idx = rng_np.integers(0, target, 32)
            log = pipe.finetune_step(buffer[idx])
            if (step + 1) % args.log_interval == 0:
                print({"gradient_steps": step + 1, **log})
            if (step + 1) % args.save_interval == 0:
                pipe.save(str(save_path / "finetuned_ckpt_latest"))
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{args.ckpt}"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, num_candidates=args.num_candidates)[0],
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="kitchen",
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "kitchen", parse_cli(sys.argv[1:])))
