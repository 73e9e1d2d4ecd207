"""Shape tests for image condition encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.nn_condition import (
    EarlyConvViTMultiViewImageCondition,
    MultiImageObsCondition,
    ResNet18ImageCondition,
    ResNet18MultiViewImageCondition,
)

RNG = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def test_resnet18_image_condition():
    mod = ResNet18ImageCondition(image_sz=64, in_channel=3, emb_dim=64)
    x = jnp.ones((2, 3, 64, 64))
    params = mod.init(RNG, x)
    out = mod.apply(params, x)
    assert out.shape == (2, 64)
    # sequence variant
    x5 = jnp.ones((2, 4, 3, 64, 64))
    out5 = mod.apply(params, x5)
    assert out5.shape == (2, 4, 64)


def test_resnet18_multiview():
    mod = ResNet18MultiViewImageCondition(image_sz=64, in_channel=3, emb_dim=32, n_views=2)
    x = jnp.ones((2, 2, 3, 64, 64))
    params = mod.init(RNG, x)
    out = mod.apply(params, x)
    assert out.shape == (2, 2, 32)


def test_early_conv_vit():
    mod = EarlyConvViTMultiViewImageCondition(
        image_sz=(64, 64), in_channels=(3, 3), lowdim_sz=9, To=2,
        d_model=64, nhead=4, num_layers=1,
    )
    cond = {
        "image": jnp.ones((2, 2, 2, 3, 64, 64)),
        "lowdim": jnp.ones((2, 2, 9)),
    }
    params = mod.init(RNG, cond)
    out = mod.apply(params, cond)
    assert out.shape == (2, 64)


def test_multi_image_obs_condition():
    shape_meta = {
        "obs": {
            "image": {"shape": [3, 96, 96], "type": "rgb"},
            "agent_pos": {"shape": [2], "type": "low_dim"},
        }
    }
    mod = MultiImageObsCondition(shape_meta=shape_meta, emb_dim=64, crop_shape=(76, 76))
    cond = {"image": jnp.ones((2, 3, 96, 96)), "agent_pos": jnp.ones((2, 2))}
    params = mod.init(RNG, cond)
    out = mod.apply(params, cond)
    assert out.shape == (2, 64)
    # train-mode random crop requires dropout rng
    out_t = mod.apply(params, cond, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert out_t.shape == (2, 64)


def test_multi_image_obs_condition_seq():
    shape_meta = {
        "obs": {
            "image": {"shape": [3, 96, 96], "type": "rgb"},
            "agent_pos": {"shape": [2], "type": "low_dim"},
        }
    }
    mod = MultiImageObsCondition(
        shape_meta=shape_meta, emb_dim=32, crop_shape=None, use_seq=True,
        keep_horizon_dims=True,
    )
    cond = {"image": jnp.ones((2, 2, 3, 96, 96)), "agent_pos": jnp.ones((2, 2, 2))}
    params = mod.init(RNG, cond)
    out = mod.apply(params, cond)
    assert out.shape == (2, 2, 32)
