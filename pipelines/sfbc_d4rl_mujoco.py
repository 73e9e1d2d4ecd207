"""SfBC on D4RL-MuJoCo — CLI entry (reference pipelines/sfbc_d4rl_mujoco.py).

Modes: bc_training -> critic_training (in-sample planning iterations)
-> inference.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset
from cleandiffuser_tpu.pipelines import SfBCPipeline
from cleandiffuser_tpu.pipelines.data_loading import load_d4rl_dataset
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.normalizers import GaussianNormalizer
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/sfbc/mujoco"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    dataset = D4RLMuJoCoDataset(
        load_d4rl_dataset(args.task.env_name), horizon=32, discount=args.discount
    )
    val_normalizer = GaussianNormalizer(dataset.seq_val)
    pipe = SfBCPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim, hidden_dim=args.hidden_dim,
        actor_lr=args.actor_learning_rate, critic_lr=args.critic_learning_rate,
        ema_rate=args.ema_rate, predict_noise=args.predict_noise,
        discount=args.discount, monte_carlo_samples=args.monte_carlo_samples,
        weight_temperature=args.weight_temperature, rng=args.seed,
    )

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "bc_training":
        window_fn = None
        if ((mesh is None or args.batch_size % mesh.shape.get("dp", 1) == 0)
                and args.save_interval % args.log_interval == 0
                and args.bc_gradient_steps % args.log_interval == 0):
            window_fn = pipe.make_bc_train_scan(dataset, args.batch_size,
                                                args.log_interval)
        train_loop(
            lambda k: pipe.bc_train_step(dataset.sample_batch(k, args.batch_size)),
            args.bc_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / f"ckpt_{tag}")), logger, args.seed,
            window_fn=window_fn,
        )

    elif args.mode == "critic_training":
        pipe.load(str(save_path / f"ckpt_{args.eval_actor_ckpt}"))
        seq_val = dataset.seq_val
        rng = np.random.default_rng(args.seed)
        for it in range(args.q_training_iters):
            if it > 0:
                seq_val, val_normalizer = pipe.monte_carlo_reevaluate(
                    dataset.seq_obs, dataset.seq_rew, seq_val,
                    dataset.tml_and_not_timeout, val_normalizer,
                    sampling_steps=args.eval_actor_sampling_steps,
                )
                pipe.reset_critic()
            normed_val = val_normalizer.normalize(seq_val)
            for step in range(args.critic_gradient_steps):
                p = rng.integers(0, dataset.seq_obs.shape[0], 64)
                t = rng.integers(0, dataset.seq_obs.shape[1], 64)
                log = pipe.critic_train_step(
                    dataset.seq_obs[p, t], dataset.seq_act[p, t], normed_val[p, t]
                )
                if (step + 1) % args.log_interval == 0:
                    print({"iter": it, "gradient_steps": step + 1, **log})
        pipe.save(str(save_path / "ckpt_critic"))

    elif args.mode == "inference":
        pipe.load(str(save_path / f"ckpt_{args.ckpt}"))
        try:
            pipe.load(str(save_path / "ckpt_critic"))
        except FileNotFoundError:
            pass
        d4rl_eval_loop(
            lambda nobs: pipe.act(
                nobs, num_candidates=args.num_candidates,
                top_k_average=args.top_k_average, sampling_steps=args.sampling_steps,
                temperature=args.temperature,
            ),
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "mujoco", parse_cli(sys.argv[1:])))
