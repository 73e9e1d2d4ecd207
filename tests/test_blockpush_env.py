"""Tests for the pure-JAX BlockPush env family + demo oracle + dataset."""

import jax
import jax.numpy as jnp
import numpy as np


def test_multimodal_obs_contract():
    from cleandiffuser_tpu.env import BlockPushMultimodalEnvJax

    env = BlockPushMultimodalEnvJax()
    state, obs = env.reset(jax.random.PRNGKey(0), 3)
    assert obs.shape == (3, 16)
    state, obs, rew, done = env.step(state, jnp.zeros((3, 2)))
    assert obs.shape == (3, 16) and rew.shape == (3,) and done.shape == (3,)
    assert np.all(np.asarray(rew) == 0.0)


def test_single_block_variant_parks_second():
    from cleandiffuser_tpu.env import BlockPushEnvJax

    env = BlockPushEnvJax()
    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    assert np.all(np.asarray(state.blocks)[:, 1] == 10.0)
    assert obs.shape == (2, 16)


def test_push_moves_block():
    from cleandiffuser_tpu.env import BlockPushMultimodalEnvJax

    env = BlockPushMultimodalEnvJax()
    state, _ = env.reset(jax.random.PRNGKey(0), 1)
    # teleport the effector next to block0 and push into it
    b0 = state.blocks[:, 0]
    state = state._replace(effector=b0 - jnp.array([[0.04, 0.0]]))
    before = np.asarray(b0).copy()
    for _ in range(8):
        state, _, _, _ = env.step(state, jnp.array([[0.025, 0.0]]))
    after = np.asarray(state.blocks[:, 0])
    assert after[0, 0] > before[0, 0] + 0.005  # block pushed along +x


def test_oracle_demos_feed_dataset():
    from cleandiffuser_tpu.dataset import BlockPushDataset
    from cleandiffuser_tpu.env import generate_blockpush_demos

    rb = generate_blockpush_demos(n_episodes=2, max_steps=80, seed=0)
    assert rb["obs"].shape[-1] == 16 and rb["action"].shape[-1] == 2
    ds = BlockPushDataset(rb, horizon=4, pad_before=1, pad_after=3)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 4)
    assert batch["obs"]["state"].shape == (4, 4, 16)
    assert np.all(np.abs(np.asarray(batch["action"])) <= 1.0 + 1e-6)
