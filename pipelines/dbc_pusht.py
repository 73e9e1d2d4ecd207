"""DiffusionBC on PushT — CLI entry (reference pipelines/dbc_pusht.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import PushTKeypointDataset, PushTStateDataset
from cleandiffuser_tpu.pipelines.data_loading import resolve_pusht_demos
from cleandiffuser_tpu.env.pusht_jax import PushTEnvJax, PushTKeypointEnvJax
from cleandiffuser_tpu.pipelines import DBCPipeline
from cleandiffuser_tpu.utils.config import resolve_config_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dbc/pusht/pearce_mlp"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    source = resolve_pusht_demos(args)
    # env_name selects the observation variant (pusht-v0 | pusht-keypoints-v0)
    keypoints = "keypoint" in args.env_name
    dataset_cls = PushTKeypointDataset if keypoints else PushTStateDataset
    Ta = int(getattr(args, "action_steps", 1))
    dataset = dataset_cls(
        source, horizon=args.obs_steps - 1 + max(Ta, 2),
        pad_before=args.obs_steps - 1, pad_after=max(Ta - 2, 0),
    )
    pipe = DBCPipeline(
        obs_dim=args.obs_dim, action_dim=args.action_dim, obs_steps=args.obs_steps,
        action_steps=int(getattr(args, "action_steps", 1)),
        nn=args.nn, diffusion=args.diffusion, emb_dim=args.emb_dim,
        sample_steps=args.sample_steps,
        # accept both our key and the reference's diffusion_x/extra_sample_steps
        diffusion_x_sampling_steps=(
            int(getattr(args, "extra_sample_steps", 0))
            if bool(getattr(args, "diffusion_x", False))
            else int(getattr(args, "diffusion_x_sampling_steps", 0))
        ),
        lr=args.lr, gradient_steps=args.gradient_steps, ema_rate=args.ema_rate,
        rng=args.seed,
    )

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    eval_env = PushTKeypointEnvJax() if keypoints else PushTEnvJax()

    def evaluate():
        # fully on-device per-step rollout (normalize + denoise + sim step
        # in one jitted scan)
        mean_reward, mean_success = pipe.evaluate_on_device(
            eval_env, dataset.normalizer, num_envs=args.num_envs,
            max_episode_steps=args.max_episode_steps)
        return {"mean_reward": mean_reward, "mean_success": mean_success}

    if args.mode == "train":
        rng = jax.random.PRNGKey(args.seed)
        eval_freq = int(getattr(args, "eval_freq", 0) or 0)
        # fused windows run on the mesh too (dp-sharded in-scan gathers)
        mesh_ok = mesh is None or args.batch_size % mesh.shape.get("dp", 1) == 0
        fused = (mesh_ok and args.save_freq % args.log_freq == 0
                 and args.gradient_steps % args.log_freq == 0
                 and (eval_freq % args.log_freq == 0))
        if fused:
            # one XLA program per log window: gather+update in a lax.scan
            train_window = pipe.make_train_scan(dataset, args.batch_size,
                                                args.log_freq)
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
            m = {"step": step, "avg_loss": avg_loss}
            print(m)
            logger.log(m, "train")
            if step // args.save_freq > prev_step // args.save_freq:
                pipe.save(str(save_path / "ckpt_latest"))
            if eval_freq and step // eval_freq > prev_step // eval_freq:
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
    pipeline(resolve_config_cli(CONFIG_DIR, "pusht", sys.argv[1:], nn_key="nn"))
