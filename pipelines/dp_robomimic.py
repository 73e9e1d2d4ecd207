"""Diffusion Policy on robomimic — CLI entry (reference pipelines/dp_robomimic.py).

Data: robomimic low-dim hdf5 at `dataset_path`. Live eval requires
robomimic/robosuite (gated, see cleandiffuser_tpu/env/robomimic.py);
training and offline action prediction run without them. `abs_action`
routes actions through the rotation_6d transform and undoes it before
env.step (reference dp_robomimic.py:127-128).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import RobomimicDataset
from cleandiffuser_tpu.dataset.fake import fake_robomimic_buffer
from cleandiffuser_tpu.pipelines import DPPipeline
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dp/robomimic"


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
        source, horizon=args.horizon,
        pad_before=args.obs_steps - 1, pad_after=args.action_steps - 1,
        abs_action=args.abs_action,
    )
    act_dim = dataset.replay_buffer["action"].shape[-1]
    obs_dim = dataset.replay_buffer["obs"].shape[-1]
    pipe = DPPipeline(
        obs_dim=obs_dim, action_dim=act_dim, horizon=args.horizon,
        obs_steps=args.obs_steps, action_steps=args.action_steps, nn=args.nn,
        diffusion=args.diffusion, sample_steps=args.sample_steps, lr=args.lr,
        gradient_steps=args.gradient_steps, ema_rate=args.ema_rate, rng=args.seed,
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
            obs, _ = env.reset()
            obs_win = np.repeat(obs[None], args.obs_steps, 0)
            total = 0.0
            for t in range(0, args.task.max_episode_steps, args.action_steps):
                nobs = norm_o.normalize(obs_win[None].astype(np.float32))
                chunk = norm_a.unnormalize(np.asarray(pipe.act_chunk(nobs))[0])
                if args.abs_action:
                    chunk = dataset.undo_transform_action(chunk)
                done = False
                for a in chunk:
                    obs, rew, done, trunc, _ = env.step(a)
                    obs_win = np.concatenate([obs_win[1:], obs[None]], 0)
                    total += rew
                    if done:
                        break
                if done:
                    break
            rewards.append(total)
            print(f"episode {ep}: reward={total}")
        logger.log({"mean_reward": float(np.mean(rewards))}, "inference")
    else:
        raise ValueError(f"Invalid mode: {args.mode}")
    logger.finish()


if __name__ == "__main__":
    pipeline(load_config(CONFIG_DIR, "robomimic", parse_cli(sys.argv[1:])))
