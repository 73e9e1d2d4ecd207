"""QGPO on D4RL-MuJoCo — CLI entry (reference pipelines/qgpo_d4rl_mujoco.py).

Modes: bc_training -> supported_action_collecting -> q_training
-> cep_training -> inference.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoTDDataset
from cleandiffuser_tpu.pipelines import QGPOPipeline
from cleandiffuser_tpu.pipelines.data_loading import load_d4rl_qlearning_dataset
from cleandiffuser_tpu.pipelines.runner import d4rl_eval_loop
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/qgpo/mujoco"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.env_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    dataset = D4RLMuJoCoTDDataset(load_d4rl_qlearning_dataset(args.task.env_name), True)
    pipe = QGPOPipeline(
        obs_dim=dataset.o_dim, act_dim=dataset.a_dim, K=args.K,
        betaQ=args.betaQ, beta=args.beta, ema_rate=args.ema_rate, rng=args.seed,
    )
    sup_path = save_path / "supported_act.npy"

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "bc_training":
        from cleandiffuser_tpu.pipelines.runner import train_loop

        window_fn = None
        if (mesh is None and args.save_interval % args.log_interval == 0
                and args.bc_gradient_steps % args.log_interval == 0):
            window_fn = pipe.make_bc_train_scan(dataset, 256, args.log_interval)
        train_loop(
            lambda k: pipe.bc_train_step(dataset.sample_batch(k, 256)),
            args.bc_gradient_steps, args.log_interval, args.save_interval,
            lambda tag: pipe.actor.save(str(save_path / "diffusion_ckpt_latest")),
            logger, args.seed, window_fn=window_fn,
        )

    elif args.mode == "supported_action_collecting":
        pipe.actor.load(str(save_path / "diffusion_ckpt_latest"))
        sup = pipe.collect_supported_actions(dataset.next_obs)
        np.save(sup_path, sup)

    elif args.mode in ("q_training", "cep_training"):
        pipe.actor.load(str(save_path / "diffusion_ckpt_latest"))
        sup = np.load(sup_path)
        rng = jax.random.PRNGKey(args.seed)
        steps = args.q_gradient_steps if args.mode == "q_training" else args.cep_gradient_steps
        import pickle
        q_path = save_path / "q_state.pkl"
        if args.mode == "cep_training" and q_path.exists():
            with open(q_path, "rb") as f:
                pipe.q_params = pickle.load(f)
        # fused windows: the per-step HOST batch assembly (numpy fancy
        # indexing + (B,K,act) support H2D each step) moves on device
        if mesh is None and steps % args.log_interval == 0:
            mk = (pipe.make_q_train_scan if args.mode == "q_training"
                  else pipe.make_cep_train_scan)
            window = mk(dataset, sup, 256, args.log_interval)
            import time
            t0 = time.time()
            for w in range(steps // args.log_interval):
                rng, k = jax.random.split(rng)
                log = window(k)
                out = {k2: float(v) for k2, v in log.items()}
                out["gradient_steps"] = (w + 1) * args.log_interval
                now = time.time()
                out["steps_per_sec"] = round(args.log_interval / max(now - t0, 1e-9), 2)
                t0 = now
                print(out)
                logger.log(out, args.mode)
        else:
            for step in range(steps):
                rng, k = jax.random.split(rng)
                idx = np.asarray(jax.random.randint(k, (256,), 0, dataset.size))
                batch = {
                    "obs": {"state": dataset.obs[idx]},
                    "next_obs": {"state": dataset.next_obs[idx]},
                    "act": dataset.act[idx], "rew": dataset.rew[idx],
                    "tml": dataset.tml[idx], "supported_act": sup[idx],
                }
                log = pipe.q_train_step(batch) if args.mode == "q_training" else pipe.cep_train_step(batch)
                if (step + 1) % args.log_interval == 0:
                    print({"gradient_steps": step + 1, **log})
                    logger.log({"gradient_steps": step + 1, **log}, args.mode)
        if args.mode == "q_training":
            with open(q_path, "wb") as f:
                pickle.dump(jax.tree_util.tree_map(np.asarray, pipe.q_params), f)
        else:
            pipe.classifier.save(str(save_path / "clf_ckpt_latest"))

    elif args.mode == "inference":
        pipe.actor.load(str(save_path / "diffusion_ckpt_latest"))
        pipe.classifier.load(str(save_path / "clf_ckpt_latest"))
        d4rl_eval_loop(
            lambda nobs: pipe.act(nobs, w_cg=args.task.w_cg,
                                  sampling_steps=args.sampling_steps),
            args.task.env_name, dataset.get_normalizer(),
            args.num_envs, args.num_episodes, args.seed, logger=logger,
        )
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "mujoco", parse_cli(sys.argv[1:])))
