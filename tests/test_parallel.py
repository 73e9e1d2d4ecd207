"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.diffusion import DiscreteDiffusionSDE
from cleandiffuser_tpu.nn_condition import IdentityCondition
from cleandiffuser_tpu.nn_diffusion import DiT1d, DQLMlp
from cleandiffuser_tpu.parallel import DataParallelEngine, make_mesh


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8


def test_dp_engine_update_and_sample():
    mesh = make_mesh(8)
    engine = DiscreteDiffusionSDE(
        DQLMlp(obs_dim=7, act_dim=3, emb_dim=16),
        IdentityCondition(dropout=0.0),
        diffusion_steps=8,
    )
    x0 = np.random.randn(16, 3).astype(np.float32)
    cond = np.random.randn(16, 7).astype(np.float32)
    engine.init(x0, cond)
    dp = DataParallelEngine(engine, mesh).place()
    for _ in range(2):
        log = dp.update(x0, cond)
        assert np.isfinite(log["loss"])
    # params stay replicated and usable for plain sampling
    out, _ = engine.sample(jnp.zeros((8, 3)), solver="ddim", sample_steps=3,
                           condition_cfg=jnp.asarray(cond[:8]), w_cfg=1.0)
    assert out.shape == (8, 3)


def test_dp_matches_single_device():
    """DP gradients over 8 shards must equal single-device gradients."""
    x0 = np.random.randn(16, 3).astype(np.float32)
    cond = np.random.randn(16, 7).astype(np.float32)

    def build():
        return DiscreteDiffusionSDE(
            DQLMlp(obs_dim=7, act_dim=3, emb_dim=16),
            IdentityCondition(dropout=0.0),
            diffusion_steps=8,
            rng=42,
        )

    e1 = build()
    e1.init(x0, cond)
    log1 = e1.update(x0, cond)

    e2 = build()
    e2.init(x0, cond)
    dp = DataParallelEngine(e2, make_mesh(8)).place()
    log2 = dp.update(x0, cond)

    np.testing.assert_allclose(log1["loss"], log2["loss"], rtol=1e-4)
    a = jax.tree_util.tree_leaves(e1.state.params)[0]
    b = jax.tree_util.tree_leaves(e2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_dit():
    mesh = make_mesh(8, axis_names=("dp", "fsdp"), shape=(2, 4))
    engine = DiscreteDiffusionSDE(
        DiT1d(in_dim=6, emb_dim=32, d_model=64, n_heads=4, depth=2),
        IdentityCondition(dropout=0.0),
        diffusion_steps=8,
    )
    x0 = np.random.randn(8, 16, 6).astype(np.float32)
    engine.init(x0)
    dp = DataParallelEngine(engine, mesh, fsdp_axis="fsdp").place()
    log = dp.update(x0)
    assert np.isfinite(log["loss"])


def test_sharded_sampling():
    """Batch-sharded candidate sampling over the 8-device mesh produces the
    same result as single-device execution (same rng)."""
    from cleandiffuser_tpu.parallel import shard_sample_fn

    engine = DiscreteDiffusionSDE(
        DQLMlp(obs_dim=7, act_dim=3, emb_dim=16),
        IdentityCondition(dropout=0.0),
        diffusion_steps=8,
        rng=7,
    )
    cond = np.random.randn(16, 7).astype(np.float32)
    engine.init(jnp.zeros((16, 3)), cond)
    sample_fn = engine.build_sample_fn(
        solver="ddim", sample_steps=4, cfg_mode="cond", final_logp=False
    )
    rng = jax.random.PRNGKey(0)
    prior = jnp.zeros((16, 3))
    out_single, _ = jax.jit(sample_fn)(
        engine.state.ema_params, None, rng, prior, condition_cfg=jnp.asarray(cond), w_cfg=1.0
    )
    mesh = make_mesh(8)
    sharded = shard_sample_fn(sample_fn, mesh)
    out_sharded, _ = sharded(
        engine.state.ema_params, None, rng, prior, condition_cfg=jnp.asarray(cond), w_cfg=1.0
    )
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_sharded), atol=5e-4
    )
