"""Decision Diffuser on D4RL-MuJoCo — CLI entry (reference pipelines/dd_d4rl_mujoco.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset
from cleandiffuser_tpu.pipelines import DDPipeline
from cleandiffuser_tpu.pipelines.data_loading import load_d4rl_dataset
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, planner_window_fn, train_loop
from cleandiffuser_tpu.utils import DD_RETURN_SCALE
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dd/mujoco"


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
    pipe = DDPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim, horizon=args.task.horizon,
        emb_dim=args.emb_dim, d_model=args.d_model, n_heads=args.n_heads,
        depth=args.depth, label_dropout=args.label_dropout,
        predict_noise=args.predict_noise,
        next_obs_loss_weight=args.next_obs_loss_weight,
        return_scale=DD_RETURN_SCALE.get(args.task.env_name, 1000.0),
        ema_rate=args.ema_rate,
        diffusion_gradient_steps=args.diffusion_gradient_steps,
        invdyn_gradient_steps=args.invdyn_gradient_steps,
        solver=args.solver, sampling_steps=args.sampling_steps,
        w_cfg=args.task.w_cfg, target_return=args.task.target_return,
        temperature=args.temperature, rng=args.seed,
        use_pallas_block=bool(getattr(args, "use_pallas_block", False)),
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
    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{args.diffusion_ckpt}"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs)[0], args.task.env_name,
            dataset.get_normalizer(), args.num_envs, args.num_episodes,
            args.seed, logger=logger,
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "mujoco", parse_cli(sys.argv[1:])))
