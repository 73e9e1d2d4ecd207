"""DiffuserLite on D4RL-MuJoCo — CLI entry (reference pipelines/diffuserlite_d4rl_mujoco.py).

Modes: training -> prepare_dataset -> reflow -> inference (test_model=R1|R2).
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import MultiHorizonD4RLMuJoCoDataset
from cleandiffuser_tpu.pipelines import DiffuserLitePipeline, compute_temporal_horizons
from cleandiffuser_tpu.pipelines.data_loading import load_d4rl_dataset
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop
from cleandiffuser_tpu.utils import DD_RETURN_SCALE
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/diffuserlite/mujoco"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    planning_horizons = list(args.task.planning_horizons)
    temporal_horizons = compute_temporal_horizons(planning_horizons)
    n_levels = len(planning_horizons)
    scale = DD_RETURN_SCALE.get(args.task.env_name, 1000.0)

    dataset = MultiHorizonD4RLMuJoCoDataset(
        load_d4rl_dataset(args.task.env_name), horizons=temporal_horizons,
        terminal_penalty=args.terminal_penalty, discount=args.discount,
    )
    pipe = DiffuserLitePipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim,
        planning_horizons=planning_horizons, emb_dim=args.emb_dim,
        d_model=args.d_model, n_heads=args.n_heads, depth=args.depth,
        next_obs_loss_weight=args.next_obs_loss_weight, return_scale=scale,
        ema_rate=args.ema_rate,
        diffusion_gradient_steps=args.diffusion_gradient_steps,
        w_cfg=args.task.w_cfg_R2 if args.test_model == "R2" else args.task.w_cfg_R1,
        target_return=(args.task.target_return_R2 if args.test_model == "R2"
                       else args.task.target_return_R1),
        temperature=args.temperature, rng=args.seed,
    )

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    def batches(k):
        return [dataset.sample_batch(k, args.batch_size, horizon_idx=i)
                for i in range(n_levels)]

    if args.mode == "training":
        rng = jax.random.PRNGKey(args.seed)
        window = None
        if (mesh is None and args.save_interval % args.log_interval == 0
                and args.diffusion_gradient_steps % args.log_interval == 0
                and args.invdyn_gradient_steps % args.log_interval == 0):
            # one XLA program per log window (all levels + invdyn budget
            # gated on the device step counter)
            window = pipe.make_train_scan(dataset, args.batch_size,
                                          args.log_interval,
                                          args.invdyn_gradient_steps)
        import time
        t0 = time.time()
        step = 0
        while step < args.diffusion_gradient_steps:
            rng, k = jax.random.split(rng)
            if window is not None:
                log = {k2: float(v) for k2, v in window(k).items()}
                step += args.log_interval
            else:
                log = pipe.train_step(batches(k), step < args.invdyn_gradient_steps)
                step += 1
                if step % args.log_interval != 0:
                    continue
                log = {k2: float(v) for k2, v in log.items()}
            log["gradient_steps"] = step
            now = time.time()
            log["steps_per_sec"] = round(args.log_interval / max(now - t0, 1e-9), 2)
            t0 = now
            print(log)
            logger.log(log, "train")
            if step % args.save_interval == 0:
                pipe.save(str(save_path / f"ckpt_{step}"))
                pipe.save(str(save_path / "ckpt_latest"))

    elif args.mode == "prepare_dataset":
        pipe.load(str(save_path / f"ckpt_{args.reflow_backbone_ckpt}"))
        rng = jax.random.PRNGKey(args.seed)
        all_pairs = []
        n_batches = max(args.cond_dataset_size // args.dataset_prepare_batch_size, 1)
        for b in range(n_batches):
            rng, k = jax.random.split(rng)
            pairs = pipe.prepare_reflow_pairs(
                batches(k), sampling_steps=args.dataset_prepare_sampling_steps)
            all_pairs.append(pairs)
            print(f"reflow pairs: step {b + 1}/{n_batches}", flush=True)
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
        prefix = "reflow_ckpt" if args.test_model == "R2" else "ckpt"
        pipe.load(str(save_path / f"{prefix}_{args.diffusion_ckpt}"))
        steps = 1 if args.test_model == "R2" else 3
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, sample_steps=steps)[0],
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "mujoco", parse_cli(sys.argv[1:])))
