"""Checkpoints are portable across the DiT `use_pallas_block` flag.

The flag is a compute-path choice (XLA DiTBlock vs fused Pallas kernel), but
the two parameterize differently (nested flax submodules vs the kernel's
flat weight list). load_state converts between the layouts with exact
reshapes — a checkpoint trained one way must load and produce IDENTICAL
outputs the other way (this broke the round-4 DD knob sweeps when the DD
configs flipped the flag on over checkpoints trained with it off).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleandiffuser_tpu.nn_diffusion import DiT1d
from cleandiffuser_tpu.nn_diffusion.dit import convert_checkpoint_blocks
from cleandiffuser_tpu.utils.train_state import (
    TrainState,
    load_state,
    make_optimizer,
    save_state,
)


def _models():
    kw = dict(in_dim=10, emb_dim=32, d_model=64, n_heads=4, depth=2)
    return DiT1d(**kw), DiT1d(**kw, use_pallas_block=True)


def _randomized(params, seed=0):
    """adaLN weights are zero-init (blocks are identity at init), which
    would mask any q/k/v mapping error — replace every leaf with noise."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    leaves = [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.2)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _inputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 8, 10)).astype(np.float32))
    t = jnp.asarray([0, 3, 7], jnp.int32)
    emb = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    return x, t, emb


@pytest.mark.parametrize("direction", ["nested_to_flat", "flat_to_nested"])
def test_convert_blocks_exact(direction):
    m_nested, m_flat = _models()
    x, t, emb = _inputs()
    src, dst = (m_nested, m_flat) if direction == "nested_to_flat" else (m_flat, m_nested)

    p_src = _randomized(src.init(jax.random.PRNGKey(0), x, t, emb))
    p_tmpl = dst.init(jax.random.PRNGKey(1), x, t, emb)
    p_conv = convert_checkpoint_blocks(p_src, p_tmpl)

    # converted tree has the destination structure
    assert (jax.tree_util.tree_structure(p_conv)
            == jax.tree_util.tree_structure(p_tmpl))
    out_src = src.apply(p_src, x, t, emb)
    out_dst = dst.apply(jax.tree_util.tree_map(jnp.asarray, p_conv), x, t, emb)
    np.testing.assert_allclose(np.asarray(out_dst), np.asarray(out_src),
                               atol=1e-5, rtol=1e-5)


def test_load_state_converts_layout(tmp_path):
    """save with use_pallas_block=False, load into a True-model TrainState
    (and the params/EMA/Adam-moment trees all restore)."""
    m_nested, m_flat = _models()
    x, t, emb = _inputs()
    tx = make_optimizer(lr=1e-3)

    p = _randomized(m_nested.init(jax.random.PRNGKey(0), x, t, emb))
    st = TrainState.create(p, tx, jax.random.PRNGKey(2))
    path = str(tmp_path / "ckpt.pkl")
    save_state(st, path)

    like = TrainState.create(
        m_flat.init(jax.random.PRNGKey(1), x, t, emb), tx, jax.random.PRNGKey(3))
    restored = load_state(path, like=like)

    assert (jax.tree_util.tree_structure(restored.params)
            == jax.tree_util.tree_structure(like.params))
    out_a = m_nested.apply(p, x, t, emb)
    out_b = m_flat.apply(restored.params, x, t, emb)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               atol=1e-5, rtol=1e-5)
    # EMA was created as a copy of params — must convert identically
    out_e = m_flat.apply(restored.ema_params, x, t, emb)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_a),
                               atol=1e-5, rtol=1e-5)


def test_load_state_mismatch_still_raises(tmp_path):
    """A genuinely incompatible checkpoint still fails loudly."""
    m_nested, _ = _models()
    other = DiT1d(in_dim=10, emb_dim=32, d_model=64, n_heads=4, depth=3)
    x, t, emb = _inputs()
    tx = make_optimizer(lr=1e-3)
    st = TrainState.create(
        m_nested.init(jax.random.PRNGKey(0), x, t, emb), tx, jax.random.PRNGKey(2))
    path = str(tmp_path / "ckpt.pkl")
    save_state(st, path)
    like = TrainState.create(
        other.init(jax.random.PRNGKey(1), x, t, emb), tx, jax.random.PRNGKey(3))
    with pytest.raises((ValueError, KeyError)):
        load_state(path, like=like)
