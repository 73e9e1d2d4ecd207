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

    if args.mode == "train":
        rng = jax.random.PRNGKey(args.seed)
        losses = []
        for step in range(args.gradient_steps):
            rng, k = jax.random.split(rng)
            log = pipe.train_step(dataset.sample_batch(k, args.batch_size))
            losses.append(log["loss"])
            if (step + 1) % args.log_freq == 0:
                m = {"step": step + 1, "avg_loss": float(sum(losses)) / len(losses)}
                print(m)
                logger.log(m, "train")
                losses = []
            if (step + 1) % args.save_freq == 0:
                pipe.save(str(save_path / "ckpt_latest"))
    elif args.mode == "inference":
        pipe.load(str(save_path / "ckpt_latest"))
        env = PushTKeypointEnvJax() if keypoints else PushTEnvJax()
        rng = jax.random.PRNGKey(args.seed)
        state, obs = env.reset(rng, args.num_envs)
        obs_win = np.repeat(np.asarray(obs)[:, None], args.obs_steps, 1)
        norm_o = dataset.normalizer["obs"]["state"]
        norm_a = dataset.normalizer["action"]
        total_rew = np.zeros(args.num_envs)
        success = np.zeros(args.num_envs)
        import jax.numpy as jnp
        for t in range(args.max_episode_steps):
            nobs = norm_o.normalize(obs_win)
            act = np.asarray(pipe.act(nobs))
            act = norm_a.unnormalize(act)
            state, obs, rew, done = env.step(state, jnp.asarray(act))
            obs_np = np.asarray(obs)
            obs_win = np.concatenate([obs_win[:, 1:], obs_np[:, None]], 1)
            total_rew += np.asarray(rew)
            success = np.maximum(success, np.asarray(rew))
        m = {"mean_reward": float(total_rew.mean()), "mean_success": float(success.mean())}
        print(m)
        logger.log(m, "inference")
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(resolve_config_cli(CONFIG_DIR, "pusht", sys.argv[1:], nn_key="nn"))
