"""DiffuserLite on D4RL-Antmaze — CLI entry (reference pipelines/diffuserlite_d4rl_antmaze.py).

Modes: iql_training -> training -> [prepare_dataset -> reflow] -> inference
(test_model=R1|R2). Sparse-reward variant: hierarchy levels condition on
IQL-bootstrapped progress values; inference scores K candidate coarse plans
with IQL V and uses position-dependent target returns.
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.dataset import D4RLAntmazeTDDataset, MultiHorizonD4RLAntmazeDataset
from cleandiffuser_tpu.pipelines import DiffuserLitePipeline, compute_temporal_horizons
from cleandiffuser_tpu.pipelines.data_loading import (
    load_d4rl_dataset,
    load_d4rl_qlearning_dataset,
)
from cleandiffuser_tpu.pipelines.diffuserlite_value import (
    IQLValueMultiHorizonDataset,
    antmaze_level_values,
    build_candidate_plan_fn,
    prepare_value_reflow_pairs,
    train_iql,
    value_train_step,
)
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.iql import IQL
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/diffuserlite/antmaze"

W_CFGS = [1.0, 0.0, 0.0]  # only level 0 is guided (reference :74)


def antmaze_target_return(env_name: str, raw_obs: np.ndarray) -> np.ndarray:
    """Position-dependent CFG target (reference :379-394)."""
    tgt = np.ones(raw_obs.shape[0], dtype=np.float32)
    x, y = raw_obs[:, 0], raw_obs[:, 1]
    if "medium-play" in env_name:
        tgt[:] = 0.2
        tgt[y > 18.0] = 0.8
    elif "medium-diverse" in env_name:
        tgt[:] = 0.2
        tgt[x > 10.0] = 0.3
        tgt[y > 15.0] = 0.8
    elif "large-play" in env_name:
        tgt[:] = 0.6
        tgt[np.logical_and(x >= 13.0, y < 28.0)] = 0.25
        tgt[x < 13.0] = 0.1
    elif "large-diverse" in env_name:
        tgt[:] = 0.6
        tgt[np.logical_and(x >= 13.0, y < 28.0)] = 0.3
        tgt[x < 13.0] = 0.25
    return tgt[:, None]


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    planning_horizons = list(args.task.planning_horizons)
    temporal_horizons = compute_temporal_horizons(planning_horizons)
    n_levels = len(planning_horizons)

    base = MultiHorizonD4RLAntmazeDataset(
        load_d4rl_dataset(args.task.env_name), horizons=temporal_horizons,
        noreaching_penalty=args.noreaching_penalty, discount=args.discount,
    )
    pipe = DiffuserLitePipeline(
        obs_dim=base.o_dim, act_dim=base.a_dim,
        planning_horizons=planning_horizons, emb_dim=args.emb_dim,
        d_model=args.d_model, n_heads=args.n_heads, depth=args.depth,
        next_obs_loss_weight=args.next_obs_loss_weight, return_scale=1.0,
        ema_rate=args.ema_rate,
        diffusion_gradient_steps=args.diffusion_gradient_steps,
        temperature=args.temperature, rng=args.seed,
    )
    iql = IQL(base.o_dim, base.a_dim, hidden_dim=512, discount=args.discount,
              tau=0.7, rng=args.seed + 7)
    iql_ckpt = save_path / "iql_ckpt_latest.pkl"

    if mesh is not None:
        place_pipeline(pipe, mesh)
        place_pipeline(iql, mesh)

    def val_fn(batch, level):
        return antmaze_level_values(batch, level, args.discount)

    def batches(dataset, k):
        return [dataset.sample_batch(k, args.batch_size, horizon_idx=i)
                for i in range(n_levels)]

    if args.mode == "iql_training":
        td = D4RLAntmazeTDDataset(load_d4rl_qlearning_dataset(args.task.env_name))
        if mesh is not None:
            td.place_on_mesh(mesh)
        train_iql(iql, td, args.iql_gradient_steps, 256, args.log_interval,
                  args.save_interval, lambda: iql.save(str(iql_ckpt)), args.seed)
        iql.save(str(iql_ckpt))

    elif args.mode == "training":
        iql.load(str(iql_ckpt))
        dataset = IQLValueMultiHorizonDataset(base, iql)
        if mesh is not None:
            dataset.place_on_mesh(mesh)
        rng = jax.random.PRNGKey(args.seed)
        for step in range(args.diffusion_gradient_steps):
            rng, k = jax.random.split(rng)
            log = value_train_step(pipe, batches(dataset, k), val_fn,
                                   step < args.invdyn_gradient_steps)
            if (step + 1) % args.log_interval == 0:
                log["gradient_steps"] = step + 1
                print(log)
                logger.log(log, "train")
            if (step + 1) % args.save_interval == 0:
                pipe.save(str(save_path / f"ckpt_{step + 1}"))
                pipe.save(str(save_path / "ckpt_latest"))

    elif args.mode == "prepare_dataset":
        iql.load(str(iql_ckpt))
        pipe.load(str(save_path / f"ckpt_{args.reflow_backbone_ckpt}"))
        dataset = IQLValueMultiHorizonDataset(base, iql)
        if mesh is not None:
            dataset.place_on_mesh(mesh)
        rng = jax.random.PRNGKey(args.seed)
        all_pairs = []
        n_batches = max(args.cond_dataset_size // args.dataset_prepare_batch_size, 1)
        for b in range(n_batches):
            rng, k = jax.random.split(rng)
            all_pairs.append(prepare_value_reflow_pairs(
                pipe, batches(dataset, k),
                val_fn, sampling_steps=args.dataset_prepare_sampling_steps))
            print(f"reflow pairs: {b + 1}/{n_batches}")
        merged = [
            {key: np.concatenate([p[i][key] for p in all_pairs])
             for key in all_pairs[0][i]}
            for i in range(n_levels)
        ]
        with open(save_path / "reflow_pairs.pkl", "wb") as f:
            pickle.dump(merged, f)

    elif args.mode == "reflow":
        pipe.load(str(save_path / f"ckpt_{args.reflow_backbone_ckpt}"))
        with open(save_path / "reflow_pairs.pkl", "rb") as f:
            merged = pickle.load(f)
        rng = np.random.default_rng(args.seed)
        N = merged[0]["x0"].shape[0]
        for step in range(args.reflow_gradient_steps):
            idx = rng.integers(0, N, args.batch_size)
            pairs = [{k_: v[idx] for k_, v in m.items()} for m in merged]
            log = pipe.reflow_step(pairs)
            if (step + 1) % args.log_interval == 0:
                log["gradient_steps"] = step + 1
                print(log)
                logger.log(log, "reflow")
            if (step + 1) % args.save_interval == 0:
                pipe.save(str(save_path / f"reflow_ckpt_{step + 1}"))
                pipe.save(str(save_path / "reflow_ckpt_latest"))

    elif args.mode == "inference":
        iql.load(str(iql_ckpt))
        prefix = "reflow_ckpt" if args.test_model == "R2" else "ckpt"
        pipe.load(str(save_path / f"{prefix}_{args.diffusion_ckpt}"))
        steps = 2 if args.test_model == "R2" else 5
        plan_fn = build_candidate_plan_fn(
            pipe, iql, args.num_envs, args.num_candidates, steps, W_CFGS,
            select_t=1,
        )
        normalizer = base.get_normalizer()
        rng_holder = [jax.random.PRNGKey(args.seed + 99)]

        def act_fn(nobs):
            raw = normalizer.unnormalize(nobs)
            tgt = jnp.asarray(antmaze_target_return(args.task.env_name, raw))
            rng_holder[0], k = jax.random.split(rng_holder[0])
            params_list = [d.state.ema_params for d in pipe.diffusions]
            return plan_fn(params_list, iql.state.v_params, pipe.invdyn.params,
                           k, jnp.asarray(nobs), tgt)

        d4rl_eval_loop(
            act_fn, args.task.env_name, normalizer,
            args.num_envs, args.num_episodes, args.seed, logger=logger,
            reward_mode="antmaze",
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "antmaze", parse_cli(sys.argv[1:])))
