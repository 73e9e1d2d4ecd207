"""MLP classifier heads (flax.linen).

TPU-native re-implementation of reference cleandiffuser/nn_classifier/
(base_nn_classifier.py:9, mlp.py:10,25). Contract:
`__call__(x, t, y=None) -> (b, out_dim)` where t is (b,).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn_diffusion.base import timestep_embedding_module
from ..utils.blocks import Mlp

__all__ = ["BaseNNClassifier", "MLPNNClassifier", "QGPONNClassifier"]


class BaseNNClassifier(nn.Module):
    """(x, t, y) -> logp(y|x,t)+C scalar head base."""

    def __call__(self, x, t, y=None):
        raise NotImplementedError


class MLPNNClassifier(BaseNNClassifier):
    x_dim: int
    out_dim: int
    emb_dim: int
    hidden_dims: Sequence[int] = (256,)
    activation: Callable = nn.relu
    out_activation: Optional[Callable] = None
    timestep_emb_type: str = "positional"

    @nn.compact
    def __call__(self, x, t, y=None):
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type)(t)
        h = jnp.concatenate([x, te], axis=-1)
        return Mlp(self.hidden_dims, self.out_dim, self.activation, self.out_activation)(h)


class QGPONNClassifier(BaseNNClassifier):
    """Energy net f_phi for QGPO; output squashed with tanh(out/10)*10
    (reference nn_classifier/mlp.py:57)."""

    obs_dim: int
    act_dim: int
    emb_dim: int
    hidden_dims: Sequence[int] = (256, 256)
    timestep_emb_type: str = "positional"

    @nn.compact
    def __call__(self, x, t, y=None):
        te = timestep_embedding_module(self.emb_dim, self.timestep_emb_type)(t)
        y_e = nn.Dense(self.emb_dim)(y)
        x_e = nn.Dense(self.emb_dim)(x)
        h = jnp.concatenate([y_e, x_e, te], axis=-1)
        out = Mlp(self.hidden_dims, 1, nn.silu)(h)
        return jnp.tanh(out / 10.0) * 10.0
