"""DiffusionBC on PushT (image obs) — CLI entry (reference pipelines/dbc_pusht_image.py).

Pearce BC policy conditioned on a MultiImageObsCondition over To image
frames, one action per control step, optional diffusion-x sampling; eval on
the pure-JAX PushT image env.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import PushTImageDataset
from cleandiffuser_tpu.pipelines.data_loading import resolve_pusht_demos
from cleandiffuser_tpu.env.pusht_jax import PushTImageEnvJax
from cleandiffuser_tpu.pipelines.dbc_image import DBCImagePipeline
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dbc/pusht_image"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    source = resolve_pusht_demos(args, with_images=True)
    dataset = PushTImageDataset(
        source, horizon=args.horizon, pad_before=args.obs_steps - 1, pad_after=0,
    )
    pipe = DBCImagePipeline(
        shape_meta=args.shape_meta.to_dict(), action_dim=args.action_dim,
        obs_steps=args.obs_steps, nn=args.nn, diffusion=args.diffusion,
        sample_steps=args.sample_steps,
        diffusion_x_sampling_steps=(args.extra_sample_steps if args.diffusion_x else 0),
        crop_shape=tuple(args.crop_shape), lr=args.lr,
        gradient_steps=args.gradient_steps, rng=args.seed,
    )

    eval_env = PushTImageEnvJax(render_size=96)

    def evaluate():
        # fully on-device per-step visuomotor rollout (render + encode +
        # denoise + sim step in one jitted scan)
        mean_reward, mean_success = pipe.evaluate_on_device(
            eval_env, dataset.normalizer, num_envs=args.num_envs,
            max_episode_steps=args.max_episode_steps)
        return {"mean_reward": mean_reward, "mean_success": mean_success}

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train":
        rng = jax.random.PRNGKey(args.seed)
        fused = (hasattr(pipe, "make_train_scan")
                 and (mesh is None or args.batch_size % mesh.shape.get("dp", 1) == 0)
                 and args.save_freq % args.log_freq == 0
                 and args.eval_freq % args.log_freq == 0
                 and args.gradient_steps % args.log_freq == 0)
        if fused:
            # one XLA program per log window: gather+update x log_freq
            train_window = pipe.make_train_scan(dataset, args.batch_size,
                                                args.log_freq)
        import time
        t_window = time.time()
        step = 0
        losses = []
        while step < args.gradient_steps:
            prev_step = step
            if fused:
                rng, k = jax.random.split(rng)
                log = train_window(k)
                step += args.log_freq
                avg_loss = float(log["loss"])
            else:
                window = min(args.log_freq, args.gradient_steps - step)
                for _ in range(window):
                    rng, k = jax.random.split(rng)
                    log = pipe.train_step(dataset.sample_batch(k, args.batch_size))
                    losses.append(log["loss"])
                step += window
                avg_loss = float(sum(losses)) / len(losses)
                losses = []
            now = time.time()
            m = {"step": step, "avg_loss": avg_loss,
                 "steps_per_sec": round(args.log_freq / max(now - t_window, 1e-9), 1)}
            t_window = now
            print(m)
            logger.log(m, "train")
            # crossing checks: step advances in whole windows
            if step // args.save_freq > prev_step // args.save_freq:
                pipe.save(str(save_path / "ckpt_latest"))
            if step // args.eval_freq > prev_step // args.eval_freq:
                m = {"step": step, **evaluate()}
                print(m)
                logger.log(m, "inference")
    elif args.mode == "inference":
        pipe.load(str(save_path / "ckpt_latest"))
        m = evaluate()
        print(m)
        logger.log(m, "inference")
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "pusht_image", parse_cli(sys.argv[1:])))
