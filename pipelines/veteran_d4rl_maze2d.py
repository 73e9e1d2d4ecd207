"""Diffusion Veteran on D4RL-Maze2d — CLI entry (reference pipelines/veteran_d4rl_maze2d.py).

Usage:
    python pipelines/veteran_d4rl_maze2d.py mode=train task=maze2d-umaze-v1
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import DV_D4RLMaze2DSeqDataset, D4RLMaze2DTDDataset
from cleandiffuser_tpu.pipelines import VeteranPipeline
from cleandiffuser_tpu.pipelines.data_loading import (
    load_d4rl_dataset,
    load_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop, planner_window_fn, train_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/veteran/maze2d"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    dataset = DV_D4RLMaze2DSeqDataset(
        load_d4rl_dataset(args.task.env_name), horizon=args.task.planner_horizon,
        discount=args.discount, center_mapping=(args.guidance_type != "cfg"),
        reward_tune=args.reward_tune,
        continous_reward_at_done=args.continous_reward_at_done,
        stride=args.task.stride,
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
        rebase_policy=args.get("rebase_policy", False),
        mcss_selector="critic",  # maze2d ranks by DVHorizonCritic (ref :373-375)
        # goal_inpaint=true (extension): pin the plan's final xy to the eval
        # goal (Diffuser's maze2d protocol) — the reference's MCSS ranking is
        # goal-agnostic on maze2d's roaming-goal data (PARITY.md caveat)
        goal_inpaint=args.get("goal_inpaint", False),
        # gi_pin_idx=k pins the goal at plan index k (default H-1): d4rl's
        # maze2d score counts time-to-first-reach, so pinning the goal
        # (H-1)*stride env steps out makes plans dawdle; earlier pins demand
        # a time-optimal traverse
        gi_pin_idx=args.get("gi_pin_idx", None),
        w_cfg=args.task.planner_w_cfg, target_return=args.task.planner_target_return,
        temperature=args.task.planner_temperature, rng=args.seed,
    )

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train":
        def step(k):
            k1, k2 = jax.random.split(k)
            return pipe.train_step(
                dataset.sample_batch(k1, args.batch_size),
                dataset.sample_batch(k2, args.batch_size),
            )

        train_loop(step, args.planner_diffusion_gradient_steps, args.log_interval,
                   args.save_interval,
                   lambda tag: pipe.save(str(save_path / f"veteran_{tag}.pkl")),
                   logger, args.seed,
                   window_fn=planner_window_fn(pipe, dataset, args, mesh,
                           steps_key="planner_diffusion_gradient_steps"))
    elif args.mode == "train_expected_value":
        if (save_path / "veteran_latest.pkl").exists():
            pipe.load(str(save_path / "veteran_latest.pkl"))
        td = D4RLMaze2DTDDataset(load_d4rl_qlearning_dataset(args.task.env_name))
        if mesh is not None:
            td.place_on_mesh(mesh)
        ev_window = None
        if ((mesh is None or 256 % mesh.shape.get("dp", 1) == 0)
                and args.save_interval % args.log_interval == 0
                and 1_000_000 % args.log_interval == 0):
            ev_window = pipe.make_ev_train_scan(td, 256, args.log_interval)
        train_loop(
            lambda k: pipe.train_expected_value_step(td.sample_batch(k, 256)),
            1_000_000, args.log_interval, args.save_interval,
            lambda tag: pipe.save(str(save_path / "veteran_latest.pkl")),
            logger, args.seed,
            window_fn=ev_window,
        )
    elif args.mode == "inference":
        ckpt = save_path / f"veteran_{args.get('ckpt', 'latest')}.pkl"
        if ckpt.exists():
            pipe.load(str(ckpt))
        else:
            pipe.planner.load(str(save_path / "planner_latest"))
        if args.get("goal_inpaint", False):
            act_fn = lambda nobs, goal_normed: pipe.act(  # noqa: E731
                nobs, num_candidates=args.planner_num_candidates,
                goal_normed=goal_normed)[0]
        else:
            act_fn = lambda nobs: pipe.act(  # noqa: E731
                nobs, num_candidates=args.planner_num_candidates)[0]
        d4rl_eval_loop(
            act_fn,
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed,
            max_steps=args.task.max_path_length, logger=logger,
            reward_mode="maze2d",
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "maze2d", parse_cli(sys.argv[1:])))
