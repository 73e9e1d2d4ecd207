"""Diffusion Policy on Franka Kitchen — CLI entry (reference pipelines/dp_kitchen.py).

Data: relay-policy-learning .npy archive dir at `dataset_dir` (synthetic
fallback). Eval: gymnasium_robotics FrankaKitchen via MultiStepWrapper.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import ReplayBuffer
from cleandiffuser_tpu.dataset.kitchen import KitchenDataset, KitchenMjlDataset
from cleandiffuser_tpu.env import MultiStepWrapper, make_kitchen_env
from cleandiffuser_tpu.pipelines import DPPipeline
from cleandiffuser_tpu.utils.config import load_config, parse_cli
from cleandiffuser_tpu.utils.logger import Logger
from cleandiffuser_tpu.utils.tensors import set_seed
from cleandiffuser_tpu.parallel import place_pipeline, setup_mesh

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs/dp/kitchen"


def _load_or_fake(dataset_dir, obs_dim, act_dim):
    p = Path(dataset_dir)
    if (p / "observations_seq.npy").exists():
        return p
    print(f"[data] no kitchen archive at {p}; using synthetic demos")
    rb = ReplayBuffer.create_empty_numpy()
    for _ in range(8):
        T = 200
        rb.add_episode({
            "state": np.random.randn(T, obs_dim).astype(np.float32),
            "action": np.random.uniform(-1, 1, (T, act_dim)).astype(np.float32),
        })
    return rb


def pipeline(args):
    mesh = setup_mesh(args)  # multi-chip: must precede first device use
    set_seed(args.seed)
    save_path = Path(f"results/{args.pipeline_name}/")
    save_path.mkdir(parents=True, exist_ok=True)
    logger = Logger(save_path, args.to_dict())

    # abs_action selects the raw-.mjl (absolute ctrl) demos, matching
    # reference dp_kitchen.py:138-141
    if args.abs_action and any(Path(args.dataset_dir).glob("*/*.mjl")):
        dataset = KitchenMjlDataset(
            args.dataset_dir, horizon=args.horizon,
            pad_before=args.obs_steps - 1, pad_after=args.action_steps - 1,
            abs_action=True,
        )
    else:
        dataset = KitchenDataset(
            _load_or_fake(args.dataset_dir, args.obs_dim, args.action_dim),
            horizon=args.horizon, pad_before=args.obs_steps - 1,
            pad_after=args.action_steps - 1, abs_action=args.abs_action,
        )
    pipe = DPPipeline(
        obs_dim=args.obs_dim, action_dim=args.action_dim, horizon=args.horizon,
        obs_steps=args.obs_steps, action_steps=args.action_steps, nn=args.nn,
        diffusion=args.diffusion, sample_steps=args.sample_steps, lr=args.lr,
        gradient_steps=args.gradient_steps, ema_rate=args.ema_rate, rng=args.seed,
    )

    def evaluate():
        norm_o = dataset.normalizer["obs"]["state"]
        norm_a = dataset.normalizer["action"]
        rewards, steps = [], []
        for ep in range(args.eval_episodes):
            env = MultiStepWrapper(
                make_kitchen_env(list(args.kitchen_tasks)),
                n_obs_steps=args.obs_steps, n_action_steps=args.action_steps,
                max_episode_steps=args.max_episode_steps,
            )
            obs, _ = env.reset(seed=args.seed + ep)
            total, t = 0.0, 0
            while t < args.max_episode_steps:
                nobs = norm_o.normalize(obs[None].astype(np.float32))
                chunk = np.asarray(pipe.act_chunk(nobs))[0]
                chunk = norm_a.unnormalize(chunk)
                obs, rew, done, trunc, _ = env.step(chunk)
                total += rew
                t += args.action_steps
                if done:
                    break
            env.close()
            rewards.append(total)
            steps.append(t)
        return {"mean_reward": float(np.mean(rewards)), "mean_steps": float(np.mean(steps))}

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
    pipeline(load_config(CONFIG_DIR, "kitchen", parse_cli(sys.argv[1:])))
