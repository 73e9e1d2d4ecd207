"""Tutorial 2: classifier-free guidance.

(reference tutorials/2_classifier-free_guidance.py)
Train a return-conditioned planner with condition dropout, then sweep the
guidance weight w_cfg at sampling time. The CFG doubled-batch forward runs
inside the fused sampling scan.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset, fake_d4rl_dataset
from cleandiffuser_tpu.diffusion import ContinuousDiffusionSDE
from cleandiffuser_tpu.nn_condition import MLPCondition
from cleandiffuser_tpu.nn_diffusion import DiT1d

dataset = D4RLMuJoCoDataset(fake_d4rl_dataset(n_steps=3000, ep_len=200),
                            horizon=8, max_path_length=200)

agent = ContinuousDiffusionSDE(
    DiT1d(in_dim=dataset.o_dim, emb_dim=64, d_model=128, n_heads=4, depth=2),
    MLPCondition(in_dim=1, out_dim=64, hidden_dims=(64,), dropout=0.25),
    predict_noise=False,
)

rng = jax.random.PRNGKey(0)
for step in range(50):
    rng, k = jax.random.split(rng)
    batch = dataset.sample_batch(k, 32)
    log = agent.update(batch["obs"]["state"], batch["val"] / 100.0)
    if step % 10 == 0:
        print(f"step {step}: loss={log['loss']:.4f}")

prior = jnp.zeros((4, 8, dataset.o_dim))
for w in (0.0, 1.0, 1.5):
    traj, _ = agent.sample(prior, sample_steps=5,
                           condition_cfg=jnp.ones((4, 1)) * 0.9, w_cfg=w)
    print(f"w_cfg={w}: traj std={float(traj.std()):.3f}")
