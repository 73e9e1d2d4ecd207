"""Diffusion Policy on PushT — CLI entry (reference pipelines/dp_pusht.py).

Usage:
    python pipelines/dp_pusht.py mode=train nn=chi_unet
    python pipelines/dp_pusht.py mode=inference

Data: a diffusion_policy-format .npz/zarr at `dataset_path`; if missing,
scripted demos from the pure-JAX PushT env are generated on the fly.
Evaluation runs fully on-device against PushTEnvJax.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from cleandiffuser_tpu.dataset import PushTKeypointDataset, PushTStateDataset
from cleandiffuser_tpu.pipelines.data_loading import resolve_pusht_demos
from cleandiffuser_tpu.env.pusht_jax import PushTEnvJax, PushTKeypointEnvJax
from cleandiffuser_tpu.pipelines import DPPipeline
from cleandiffuser_tpu.utils.config import resolve_config_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dp/pusht/chi_unet"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    source = resolve_pusht_demos(args)

    # env_name selects the observation variant (reference configs
    # dp/pusht/*/pusht{,_keypoint}.yaml: pusht-v0 | pusht-keypoints-v0)
    keypoints = "keypoint" in args.env_name
    dataset_cls = PushTKeypointDataset if keypoints else PushTStateDataset
    dataset = dataset_cls(
        source, horizon=args.horizon,
        pad_before=args.obs_steps - 1, pad_after=args.action_steps - 1,
    )
    pipe = DPPipeline(
        obs_dim=args.obs_dim, action_dim=args.action_dim, horizon=args.horizon,
        obs_steps=args.obs_steps, action_steps=args.action_steps,
        nn=args.nn, diffusion=args.diffusion, sample_steps=args.sample_steps,
        lr=args.lr, gradient_steps=args.gradient_steps, ema_rate=args.ema_rate,
        rng=args.seed,
    )
    env = PushTKeypointEnvJax() if keypoints else PushTEnvJax()

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train":
        rng = jax.random.PRNGKey(args.seed)
        # fused windows run on the mesh too (dp-sharded in-scan gathers)
        mesh_ok = mesh is None or args.batch_size % mesh.shape.get("dp", 1) == 0
        fused = (mesh_ok and args.save_freq % args.log_freq == 0
                 and args.eval_freq % args.log_freq == 0
                 and args.gradient_steps % args.log_freq == 0)
        if fused:
            # one XLA program per log window: gather+update x log_freq
            train_window = pipe.make_train_scan(dataset, args.batch_size,
                                                args.log_freq)
        import time
        t_window = time.time()
        step = 0
        while step < args.gradient_steps:
            prev_step = step
            if fused:
                rng, k = jax.random.split(rng)
                log = train_window(k)
                step += args.log_freq
                avg_loss = float(log["loss"])
            else:
                losses = []
                window = min(args.log_freq, args.gradient_steps - step)
                for _ in range(window):
                    rng, k = jax.random.split(rng)
                    log = pipe.train_step(dataset.sample_batch(k, args.batch_size))
                    losses.append(log["loss"])
                step += window
                avg_loss = float(sum(losses)) / len(losses)
            now = time.time()
            m = {"step": step, "avg_diffusion_loss": avg_loss,
                 "steps_per_sec": round(args.log_freq / max(now - t_window, 1e-9), 1)}
            t_window = now
            print(m)
            logger.log(m, "train")
            # crossing check: step advances in whole windows, so a plain
            # `step % freq == 0` silently skips freqs that aren't multiples
            # of the window size (e.g. eval_freq=2500, log_freq=1000)
            if step // args.save_freq > prev_step // args.save_freq:
                pipe.save(str(save_path / f"ckpt_{step}"))
                pipe.save(str(save_path / "ckpt_latest"))
            if step // args.eval_freq > prev_step // args.eval_freq:
                mean_rew, mean_success = pipe.evaluate_on_device(
                    env, dataset.normalizer, num_envs=args.num_envs,
                    max_episode_steps=args.max_episode_steps,
                )
                m = {"step": step, "mean_reward": mean_rew, "mean_success": mean_success}
                print(m)
                logger.log(m, "inference")
                t_window = time.time()

    elif args.mode == "inference":
        # ckpt=<step|latest> selects among the save_freq checkpoints
        pipe.load(str(save_path / f"ckpt_{getattr(args, 'ckpt', 'latest')}"))
        mean_rew, mean_success = pipe.evaluate_on_device(
            env, dataset.normalizer, num_envs=args.num_envs,
            max_episode_steps=args.max_episode_steps,
        )
        print({"mean_reward": mean_rew, "mean_success": mean_success})
        logger.log({"mean_reward": mean_rew, "mean_success": mean_success}, "inference")
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(resolve_config_cli(CONFIG_DIR, "pusht", sys.argv[1:], nn_key="nn"))
