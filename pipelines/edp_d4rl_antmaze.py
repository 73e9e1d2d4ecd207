"""EDP on D4RL-Antmaze — CLI entry (reference pipelines/edp_d4rl_antmaze.py).

Usage:
    python pipelines/edp_d4rl_antmaze.py mode=train task=antmaze-medium-play-v2
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLAntmazeTDDataset
from cleandiffuser_tpu.pipelines import EDPPipeline
from cleandiffuser_tpu.pipelines.data_loading import (
    load_d4rl_dataset,
    load_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, rl_window_fn, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/edp/antmaze"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    dataset = D4RLAntmazeTDDataset(load_d4rl_qlearning_dataset(args.task.env_name))
    pipe = EDPPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        diffusion_steps=args.diffusion_steps, sampling_steps=args.sampling_steps,
        solver=args.solver, hidden_dim=args.hidden_dim,
        actor_lr=args.actor_learning_rate, critic_lr=args.critic_learning_rate,
        gradient_steps=args.gradient_steps, discount=args.discount,
        eta=args.task.eta, ema_rate=args.ema_rate,
        ema_update_interval=args.ema_update_interval,
        max_q_backup=10, rng=args.seed,
    )

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train":
        def resume_fn():
            ckpt = save_path / "ckpt_latest.pkl"
            if args.get("resume", False) and ckpt.exists():
                pipe.load(str(ckpt))
                return pipe.trained_steps
            return 0

        train_loop(
            lambda k: pipe.train_step(dataset.sample_batch(k, args.batch_size)),
            args.gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{tag}.pkl")), logger, args.seed,
            resume_fn=resume_fn,
            window_fn=rl_window_fn(pipe, dataset, args, mesh),
        )
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{args.ckpt}.pkl"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(
                nobs, num_candidates=args.num_candidates,
                weight_temperature=args.task.weight_temperature,
                use_ema=args.use_ema, temperature=args.temperature,
            ),
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="antmaze",
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "antmaze", parse_cli(sys.argv[1:])))
