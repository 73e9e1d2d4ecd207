"""Tutorial 1: a minimal Diffusion Behavior Cloning implementation.

(reference tutorials/1_a_minimal_DBC_implementation.py — kitchen BC)
Build a ChiUNet action-chunk diffusion policy on Kitchen-format data and
train it with the fused TPU update. Runs hermetically on synthetic data.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cleandiffuser_tpu.dataset import ReplayBuffer
from cleandiffuser_tpu.dataset.kitchen import KitchenDataset
from cleandiffuser_tpu.pipelines import DPPipeline

# --- synthetic kitchen-format demos (replace with the real npy archive) ---
rb = ReplayBuffer.create_empty_numpy()
for _ in range(4):
    T = 120
    rb.add_episode({
        "state": np.random.randn(T, 60).astype(np.float32),
        "action": np.random.uniform(-1, 1, (T, 9)).astype(np.float32),
    })
dataset = KitchenDataset(rb, horizon=16, pad_before=1, pad_after=7)

pipe = DPPipeline(obs_dim=60, action_dim=9, horizon=16, obs_steps=2,
                  action_steps=8, nn="chi_unet", diffusion="ddpm",
                  sample_steps=5, gradient_steps=1000)

rng = jax.random.PRNGKey(0)
for step in range(50):
    rng, k = jax.random.split(rng)
    log = pipe.train_step(dataset.sample_batch(k, 32))
    if step % 10 == 0:
        print(f"step {step}: loss={log['loss']:.4f}")

chunk = pipe.act_chunk(np.asarray(dataset.sample_batch(rng, 2)["obs"]["state"]))
print("sampled action chunk:", chunk.shape)
