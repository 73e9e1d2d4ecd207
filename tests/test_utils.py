"""Tests for embeddings, normalizers, blocks, train-state harness."""

import jax
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.utils import (
    DQLCritic,
    FourierEmbedding,
    GaussianNormalizer,
    IQL,
    MinMaxNormalizer,
    Mlp,
    PositionalEmbedding,
    SinusoidalEmbedding,
    TrainState,
    TwinQ,
    V,
    at_least_ndim,
    count_parameters,
    ema_update,
    make_optimizer,
)
from cleandiffuser_tpu.utils.normalizers import CDFNormalizer, DatasetMinMaxNormalizer


def test_at_least_ndim():
    x = jnp.ones((4,))
    assert at_least_ndim(x, 3).shape == (4, 1, 1)
    assert at_least_ndim(x, 3, pad=1).shape == (1, 1, 4)
    assert at_least_ndim(3.0, 5) == 3.0


def test_positional_embedding_matches_formula():
    dim = 16
    emb = PositionalEmbedding(dim=dim)
    x = jnp.array([0.0, 1.0, 5.0, 999.0])
    out = emb.apply({}, x)
    assert out.shape == (4, dim)
    freqs = np.arange(dim // 2) / (dim // 2)
    freqs = (1 / 10000) ** freqs
    ang = np.asarray(x)[:, None] * freqs
    exp = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), exp, atol=2e-3)


def test_sinusoidal_embedding_matches_formula():
    dim = 32
    emb = SinusoidalEmbedding(dim=dim)
    x = jnp.array([0.0, 3.0, 10.0])
    out = emb.apply({}, x)
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(np.log(10000) / (half - 1)))
    ang = np.asarray(x)[:, None] * freqs
    exp = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), exp, atol=2e-3)


def test_fourier_embedding_shapes():
    emb = FourierEmbedding(dim=32)
    params = emb.init(jax.random.PRNGKey(0), jnp.zeros((4,)))
    out = emb.apply(params, jnp.ones((4,)))
    assert out.shape == (4, 32)


def test_gaussian_normalizer_roundtrip():
    X = np.random.randn(1000, 3, 10) * 5 + 2
    norm = GaussianNormalizer(X, 1)
    x = np.random.randn(7, 3, 10)
    np.testing.assert_allclose(norm.unnormalize(norm.normalize(x)), x, atol=1e-4)
    nx = norm.normalize(X)
    np.testing.assert_allclose(nx.mean((0,)), 0.0, atol=1e-4)
    np.testing.assert_allclose(nx.std((0,)), 1.0, atol=1e-4)


def test_minmax_normalizer_roundtrip():
    X = np.random.rand(500, 6) * 3 - 1
    norm = MinMaxNormalizer(X)
    nx = norm.normalize(X)
    assert nx.min() >= -1 - 1e-6 and nx.max() <= 1 + 1e-6
    np.testing.assert_allclose(norm.unnormalize(nx), X, atol=1e-5)


def test_minmax_constant_dim_is_zero():
    X = np.random.rand(100, 3)
    X[:, 1] = 2.5
    norm = MinMaxNormalizer(X)
    nx = norm.normalize(X)
    np.testing.assert_allclose(nx[:, 1], 0.0)


def test_dataset_minmax_roundtrip():
    X = np.random.rand(100, 4, 5)
    norm = DatasetMinMaxNormalizer(X)
    np.testing.assert_allclose(norm.unnormalize(norm.normalize(X)), X, atol=1e-5)


def test_cdf_normalizer_roundtrip():
    X = np.random.randn(2000, 3).astype(np.float32)
    norm = CDFNormalizer(X)
    nx = norm.normalize(X)
    assert nx.min() >= -1 - 1e-5 and nx.max() <= 1 + 1e-5
    np.testing.assert_allclose(norm.unnormalize(nx), X, atol=1e-2)


def test_mlp_shapes():
    mlp = Mlp(hidden_dims=(32, 32), out_dim=5)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 7)))
    out = mlp.apply(params, jnp.ones((2, 7)))
    assert out.shape == (2, 5)


def test_dql_critic():
    critic = DQLCritic(hidden_dim=64)
    obs, act = jnp.ones((3, 17)), jnp.ones((3, 6))
    params = critic.init(jax.random.PRNGKey(0), obs, act)
    q1, q2 = critic.apply(params, obs, act)
    assert q1.shape == (3, 1) and q2.shape == (3, 1)
    qmin = critic.apply(params, obs, act, method=DQLCritic.q_min)
    np.testing.assert_allclose(np.asarray(qmin), np.minimum(q1, q2), atol=1e-6)


def test_twinq_v():
    q = TwinQ(hidden_dim=32)
    v = V(hidden_dim=32)
    obs, act = jnp.ones((4, 11)), jnp.ones((4, 3))
    qp = q.init(jax.random.PRNGKey(0), obs, act)
    vp = v.init(jax.random.PRNGKey(1), obs)
    assert q.apply(qp, obs, act).shape == (4, 1)
    assert v.apply(vp, obs).shape == (4, 1)


def test_train_state_and_ema():
    mlp = Mlp(hidden_dims=(16,), out_dim=2)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    tx = make_optimizer(lr=1e-3, grad_clip_norm=1.0)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    assert count_parameters(state.params) == count_parameters(state.ema_params)

    new_params = jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    ema = ema_update(new_params, state.ema_params, 0.9)
    leaf = jax.tree_util.tree_leaves(ema)[0]
    old_leaf = jax.tree_util.tree_leaves(state.ema_params)[0]
    new_leaf = jax.tree_util.tree_leaves(new_params)[0]
    np.testing.assert_allclose(
        np.asarray(leaf), 0.9 * np.asarray(old_leaf) + 0.1 * np.asarray(new_leaf), atol=1e-6
    )


def test_iql_update_runs():
    iql = IQL(obs_dim=5, act_dim=2, hidden_dim=32)
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((8, 5)).astype(np.float32)
    act = rng.standard_normal((8, 2)).astype(np.float32)
    rew = rng.standard_normal((8, 1)).astype(np.float32)
    obs_next = rng.standard_normal((8, 5)).astype(np.float32)
    done = np.zeros((8, 1), np.float32)
    lv = iql.update_V(obs, act)
    lq = iql.update_Q(obs, act, rew, obs_next, done)
    assert np.isfinite(lv) and np.isfinite(lq)
    assert iql.v(obs).shape == (8, 1)
    assert iql.q(obs, act).shape == (8, 1)


def test_orbax_checkpoint_roundtrip(tmp_path):
    mlp = Mlp(hidden_dims=(8,), out_dim=2)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    from cleandiffuser_tpu.utils.train_state import load_state_orbax, save_state

    p = str(tmp_path / "orbax_ckpt")
    save_state(state, p, backend="orbax")
    restored = load_state_orbax(p, state)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_profiling_utils(tmp_path):
    from cleandiffuser_tpu.utils.profiling import Throughput, annotate, trace

    meter = Throughput()
    r = meter.update(100)
    assert r > 0
    with annotate("test-region"):
        pass
    with trace(str(tmp_path / "prof")):
        jnp.ones(8).sum().block_until_ready()
