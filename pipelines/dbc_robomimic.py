"""DiffusionBC on Robomimic (low-dim) — CLI entry (reference pipelines/dbc_robomimic.py).

Pearce BC policy, one action per control step; robomimic hdf5 demos (falls
back to synthetic demos for hermetic runs); optional abs_action rotation_6d
transform undone before env.step (reference dbc_robomimic.py:195-260).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import RobomimicDataset
from cleandiffuser_tpu.dataset.fake import fake_robomimic_buffer
from cleandiffuser_tpu.pipelines import DBCPipeline
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dbc/robomimic"


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/{args.task.task_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    source = args.task.dataset_path
    if not Path(args.task.dataset_path).exists():
        print(f"[data] no robomimic hdf5 at {args.task.dataset_path}; synthetic demos")
        source = fake_robomimic_buffer(args.task.obs_dim, args.task.action_dim)
    dataset = RobomimicDataset(
        source, horizon=args.horizon, pad_before=args.obs_steps - 1,
        pad_after=0, abs_action=args.abs_action,
    )
    act_dim = dataset.replay_buffer["action"].shape[-1]
    obs_dim = dataset.replay_buffer["obs"].shape[-1]
    pipe = DBCPipeline(
        obs_dim=obs_dim, action_dim=act_dim, obs_steps=args.obs_steps,
        action_steps=int(getattr(args, "action_steps", 1)),
        nn=args.nn, diffusion=args.diffusion, sample_steps=args.sample_steps,
        diffusion_x_sampling_steps=(args.extra_sample_steps if args.diffusion_x else 0),
        lr=args.lr, gradient_steps=args.gradient_steps, ema_rate=args.ema_rate,
        rng=args.seed,
    )

    if mesh is not None:
        place_pipeline(pipe, mesh)
        dataset.place_on_mesh(mesh)

    if args.mode == "train":
        rng = jax.random.PRNGKey(args.seed)
        fused = (hasattr(pipe, "make_train_scan")
                 and (mesh is None or args.batch_size % mesh.shape.get("dp", 1) == 0)
                 and args.save_freq % args.log_freq == 0
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
            if step // args.save_freq > prev_step // args.save_freq:
                pipe.save(str(save_path / "ckpt_latest"))
    elif args.mode == "inference":
        pipe.load(str(save_path / "ckpt_latest"))
        from cleandiffuser_tpu.env.robomimic import (
            RobomimicLowdimWrapper,
            create_robomimic_env,
        )
        import h5py, json

        with h5py.File(args.task.dataset_path) as f:
            env_meta = json.loads(f["data"].attrs["env_args"])
        env = RobomimicLowdimWrapper(create_robomimic_env(env_meta))
        norm_o = dataset.normalizer["obs"]["state"]
        norm_a = dataset.normalizer["action"]
        rewards = []
        for ep in range(args.eval_episodes):
            obs_hist = []
            obs = env.reset()
            total, t = 0.0, 0
            while t < args.task.max_episode_steps:
                obs_hist.append(obs)
                window = np.stack(
                    ([obs_hist[0]] * (args.obs_steps - len(obs_hist)) + obs_hist)
                    [-args.obs_steps:]
                )
                nobs = norm_o.normalize(window[None].astype(np.float32))
                act = np.asarray(pipe.act(nobs))[0]
                act = norm_a.unnormalize(act)
                if args.abs_action:
                    act = dataset.undo_transform_action(act[None])[0]
                obs, rew, done, _ = env.step(act)
                total += rew
                t += 1
                if done:
                    break
            rewards.append(total)
            print(f"episode {ep}: reward {total}")
        m = {"mean_reward": float(np.mean(rewards))}
        print(m)
        logger.log(m, "inference")
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "robomimic", parse_cli(sys.argv[1:])))
