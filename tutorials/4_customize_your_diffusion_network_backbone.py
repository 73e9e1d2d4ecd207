"""Tutorial 4: customize your diffusion network backbone.

(reference tutorials/4_customize_your_diffusion_network_backbone.py)
A backbone is any flax module with signature (x, t, emb, train) -> pred.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE
from cleandiffuser_tpu.nn_diffusion.base import BaseNNDiffusion, timestep_embedding_module


class MyBackbone(BaseNNDiffusion):
    """A custom GLU-MLP denoiser."""

    x_dim: int
    emb_dim: int = 32

    @nn.compact
    def __call__(self, x, t, emb=None, train: bool = False):
        te = timestep_embedding_module(self.emb_dim, "positional")(t)
        if emb is not None:
            te = te + emb
        h = jnp.concatenate([x, te], -1)
        a = nn.Dense(128)(h)
        b = nn.Dense(128)(h)
        h = a * nn.sigmoid(b)          # GLU
        return nn.Dense(self.x_dim)(h)


agent = DiscreteDiffusionSDE(MyBackbone(x_dim=4), diffusion_steps=16)
x0 = np.random.randn(64, 4).astype(np.float32)
for step in range(30):
    log = agent.update(x0)
print("final loss:", log["loss"])
out, _ = agent.sample(jnp.zeros((8, 4)), solver="ddim", sample_steps=8)
print("samples:", out.shape)
