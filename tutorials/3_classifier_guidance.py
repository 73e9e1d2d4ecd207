"""Tutorial 3: classifier guidance.

(reference tutorials/3_classifier_guidance.py)
Train a trajectory-return classifier alongside the planner; at sampling
time its input-gradient (jax.grad inside the scan) steers generation.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from cleandiffuser_tpu.classifier import CumRewClassifier
from cleandiffuser_tpu.dataset import D4RLMuJoCoDataset, fake_d4rl_dataset
from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE
from cleandiffuser_tpu.nn_classifier import HalfJannerUNet1d
from cleandiffuser_tpu.nn_diffusion import JannerUNet1d

dataset = D4RLMuJoCoDataset(fake_d4rl_dataset(n_steps=3000, ep_len=200),
                            horizon=8, max_path_length=200)
in_dim = dataset.o_dim + dataset.a_dim

classifier = CumRewClassifier(
    HalfJannerUNet1d(horizon=8, in_dim=in_dim, out_dim=1, model_dim=16, emb_dim=16))
agent = DiscreteDiffusionSDE(
    JannerUNet1d(in_dim=in_dim, model_dim=16, emb_dim=16),
    classifier=classifier, diffusion_steps=8,
)

rng = jax.random.PRNGKey(0)
for step in range(30):
    rng, k = jax.random.split(rng)
    batch = dataset.sample_batch(k, 16)
    x = jnp.concatenate([batch["obs"]["state"], batch["act"]], -1)
    log = agent.update(x)
    xt, t, _ = agent.add_noise(k, x)
    log_cls = classifier.update(xt, t, batch["val"])
    if step % 10 == 0:
        print(f"step {step}: diffusion={log['loss']:.4f} classifier={log_cls['loss']:.4f}")

traj, info = agent.sample(jnp.zeros((4, 8, in_dim)), sample_steps=5, w_cg=0.1)
print("guided sample:", traj.shape, "log_p:", info["log_p"][:, 0])
