"""bf16 sampling path: every engine family samples with the network forward
in bfloat16 (MXU-native) while solver math stays f32, within tolerance of the
full-f32 program, and the `bf16_sampling=true` config key reaches engines
through the setup_mesh chokepoint (parallel/integrate.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.diffusion import (
    ContinuousConsistencyModel,
    ContinuousEDM,
    ContinuousRectifiedFlow,
    DiscreteDiffusionSDE,
)
from cleandiffuser_tpu.diffusion.basic import DiffusionModel
from cleandiffuser_tpu.nn_condition import MLPCondition
from cleandiffuser_tpu.nn_diffusion import DQLMlp

OBS, ACT, B = 5, 3, 8


def _engine(cls, **kw):
    eng = cls(
        DQLMlp(obs_dim=OBS, act_dim=ACT, emb_dim=16),
        MLPCondition(in_dim=OBS, out_dim=16, hidden_dims=(16,)),
        rng=0,
        **kw,
    )
    prior = jnp.zeros((B, ACT))
    cond = jnp.asarray(np.random.RandomState(0).randn(B, OBS), jnp.float32)
    eng.init(prior, cond)
    return eng, prior, cond


def _sample(eng, prior, cond, **kw):
    fn = eng.build_sample_fn(**kw)
    x, _ = fn(eng.state.ema_params, None, jax.random.PRNGKey(3), prior,
              condition_cfg=cond, w_cfg=1.0)
    return np.asarray(x)


@pytest.mark.parametrize(
    "cls,kw,skw",
    [
        (DiscreteDiffusionSDE, dict(diffusion_steps=5),
         dict(solver="ddpm", sample_steps=5, cfg_mode="cond", final_logp=False)),
        (ContinuousEDM, {},
         dict(solver="heun", sample_steps=4, cfg_mode="cond", final_logp=False)),
        (ContinuousRectifiedFlow, {},
         dict(sample_steps=4, cfg_mode="cond")),
        (ContinuousConsistencyModel, {},
         dict(sample_steps=2, cfg_mode="cond")),
    ],
    ids=["ddpm", "edm", "rf", "cm"],
)
def test_bf16_close_to_f32(cls, kw, skw):
    eng, prior, cond = _engine(cls, **kw)
    x32 = _sample(eng, prior, cond, **skw)
    eng.bf16_sampling = True
    eng._fn_cache.clear()
    x16 = _sample(eng, prior, cond, **skw)
    assert x16.dtype == np.float32  # solver math + output stay f32
    # same rng path; only the net forward precision differs — compare
    # relative to the sample scale (untrained nets can emit O(100) values)
    scale = max(np.max(np.abs(x32)), 1.0)
    assert np.max(np.abs(x16 - x32)) / scale < 0.02, (
        np.max(np.abs(x16 - x32)), scale)
    assert np.mean(np.abs(x16 - x32)) / scale < 0.005


def test_config_key_reaches_engines_via_setup_mesh():
    from cleandiffuser_tpu.parallel import setup_mesh

    assert DiffusionModel.bf16_sampling is False
    try:
        mesh = setup_mesh({"n_devices": 1, "bf16_sampling": True})
        assert mesh is None  # single chip: flag applies, no mesh
        eng, prior, cond = _engine(DiscreteDiffusionSDE, diffusion_steps=5)
        assert eng.bf16_sampling is True
        x = _sample(eng, prior, cond, solver="ddpm", sample_steps=5,
                    cfg_mode="cond", final_logp=False)
        assert np.isfinite(x).all()
    finally:
        DiffusionModel.bf16_sampling = False


@pytest.mark.parametrize("cls", [DiscreteDiffusionSDE, ContinuousEDM,
                                 ContinuousRectifiedFlow])
def test_bf16_training_loss_tracks_f32(cls):
    """bf16_training: net fwd/bwd in bf16, loss/opt/EMA f32 — the update
    runs, grads stay f32, and the loss is within bf16 tolerance of f32."""
    kw = {"diffusion_steps": 5} if cls is DiscreteDiffusionSDE else {}
    eng, prior, cond = _engine(cls, **kw)
    x0 = jnp.asarray(np.random.RandomState(1).randn(B, ACT), jnp.float32)
    sub = jax.random.PRNGKey(7)

    loss32 = float(eng.loss_fn(eng.state.params, sub, x0, cond))
    try:
        DiffusionModel.bf16_training = True
        loss16 = float(eng.loss_fn(eng.state.params, sub, x0, cond))
        # same seed, same noise draw; only the net forward precision differs
        assert np.isfinite(loss16)
        assert abs(loss16 - loss32) / max(abs(loss32), 1e-3) < 0.05, (
            loss16, loss32)
        log = eng.update(x0, cond)
        assert np.isfinite(float(log["loss"]))
        # master weights stayed f32
        leaf = jax.tree_util.tree_leaves(eng.state.params)[0]
        assert leaf.dtype == jnp.float32
    finally:
        DiffusionModel.bf16_training = False


def test_bf16_training_config_key_via_setup_mesh():
    from cleandiffuser_tpu.parallel import setup_mesh

    assert DiffusionModel.bf16_training is False
    try:
        mesh = setup_mesh({"n_devices": 1, "bf16_training": True})
        assert mesh is None
        eng, prior, cond = _engine(DiscreteDiffusionSDE, diffusion_steps=5)
        assert eng.bf16_training is True
    finally:
        DiffusionModel.bf16_training = False
