"""SynthER on D4RL-Kitchen — CLI entry (reference pipelines/synther_d4rl_kitchen.py).

Usage:
    python pipelines/synther_d4rl_kitchen.py mode=train task=kitchen-mixed-v0
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLKitchenTDDataset
from cleandiffuser_tpu.pipelines import SynthERPipeline
from cleandiffuser_tpu.pipelines.synther import TD3BC
from cleandiffuser_tpu.pipelines.data_loading import (
    load_d4rl_dataset,
    load_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, planner_window_fn, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/synther/kitchen"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    raw = load_d4rl_qlearning_dataset(args.task.env_name)
    dataset = D4RLKitchenTDDataset(raw)
    synther = SynthERPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        diffusion_steps=args.diffusion_steps, lr=args.diffusion_learning_rate,
        gradient_steps=args.diffusion_gradient_steps, ema_rate=args.ema_rate,
        rng=args.seed,
    )
    extra_path = save_path / "extra_transitions.npy"

    if mesh is not None:
        place_pipeline(synther, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train_diffusion":
        train_loop(
            lambda k: synther.train_step(dataset.sample_batch(k, args.batch_size)),
            args.diffusion_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: synther.diffusion.save(str(save_path / f"diff_ckpt_{tag}")),
            logger, args.seed,
            window_fn=planner_window_fn(synther, dataset, args, mesh),
        )
    elif args.mode == "transition_generation":
        synther.diffusion.load(str(save_path / "diff_ckpt_latest"))
        extra = synther.generate_transitions(args.num_transitions)
        np.save(extra_path, extra)
    elif args.mode == "train_td3bc":
        extra = np.load(extra_path)
        mixed = D4RLKitchenTDDataset(raw)
        o, a = mixed.o_dim, mixed.a_dim
        mixed.obs = np.concatenate([mixed.obs, extra[:, :o]], 0)
        mixed.act = np.concatenate([mixed.act, extra[:, o:o + a].clip(-1, 1)], 0)
        mixed.rew = np.concatenate([mixed.rew, extra[:, o + a : o + a + 1]], 0)
        mixed.next_obs = np.concatenate(
            [mixed.next_obs, extra[:, o + a + 1 : 2 * o + a + 1]], 0)
        mixed.tml = np.concatenate(
            [mixed.tml, (extra[:, -1:] > 0.5).astype(np.float32)], 0)
        mixed.size = mixed.obs.shape[0]
        from cleandiffuser_tpu.dataset.base import DeviceTDSampler
        mixed._sampler = DeviceTDSampler(
            {"obs": mixed.obs, "next_obs": mixed.next_obs, "act": mixed.act,
              "rew": mixed.rew, "tml": mixed.tml})
        agent = TD3BC(obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
                      gradient_steps=args.td3bc_gradient_steps, rng=args.seed)
        if mesh is not None:
            place_pipeline(agent, mesh)
            mixed.place_on_mesh(mesh)
        train_loop(
            lambda k: agent.update(mixed.sample_batch(k, args.batch_size)),
            args.td3bc_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: None, logger, args.seed,
            window_fn=planner_window_fn(agent, mixed, args, mesh,
                                        steps_key="td3bc_gradient_steps"),
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
            args.seed, logger=logger, reward_mode="kitchen",
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "kitchen", parse_cli(sys.argv[1:])))
