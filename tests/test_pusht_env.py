"""Tests for the pure-JAX PushT environment."""

import jax
import jax.numpy as jnp
import numpy as np

from cleandiffuser_tpu.env.pusht_jax import (
    GOAL_POSE,
    PushTEnvJax,
    PushTKeypointEnvJax,
    PushTState,
)


def test_reset_and_obs():
    env = PushTEnvJax()
    state, obs = env.reset(jax.random.PRNGKey(0), 4)
    assert obs.shape == (4, 5)
    o = np.asarray(obs)
    assert np.all(o[:, 0] >= 50) and np.all(o[:, 0] < 450)
    assert np.all(o[:, 2] >= 100) and np.all(o[:, 2] < 400)
    assert np.all(o[:, 4] >= 0) and np.all(o[:, 4] <= 2 * np.pi)


def test_step_moves_agent_toward_action():
    env = PushTEnvJax()
    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    target = state.agent_pos + jnp.array([40.0, 0.0])
    d0 = np.asarray(jnp.linalg.norm(target - state.agent_pos, axis=-1))
    state2, obs2, rew, done = env.step(state, target)
    d1 = np.asarray(jnp.linalg.norm(target - state2.agent_pos, axis=-1))
    assert np.all(d1 < d0)
    assert rew.shape == (2,) and done.shape == (2,)
    assert np.all(np.isfinite(np.asarray(obs2)))


def test_coverage_perfect_at_goal():
    env = PushTEnvJax()
    state = PushTState(
        agent_pos=jnp.array([[450.0, 450.0]]),
        agent_vel=jnp.zeros((1, 2)),
        block_pos=jnp.asarray(GOAL_POSE[None, :2]),
        block_angle=jnp.asarray(GOAL_POSE[None, 2]),
    )
    cov = np.asarray(env.coverage(state))
    assert cov[0] > 0.999
    # far away -> no coverage
    state_far = state._replace(block_pos=jnp.array([[60.0, 60.0]]))
    assert np.asarray(env.coverage(state_far))[0] < 0.05


def test_pushing_moves_block():
    """Driving the agent through the block must move the block."""
    env = PushTEnvJax()
    state = PushTState(
        agent_pos=jnp.array([[256.0, 420.0]]),
        agent_vel=jnp.zeros((1, 2)),
        block_pos=jnp.array([[256.0, 300.0]]),
        block_angle=jnp.zeros((1,)),
    )
    b0 = np.asarray(state.block_pos).copy()
    for _ in range(30):
        state, obs, rew, done = env.step(state, jnp.array([[256.0, 200.0]]))
    moved = np.linalg.norm(np.asarray(state.block_pos) - b0)
    assert moved > 5.0, f"block barely moved: {moved}"


def test_keypoint_env():
    env = PushTKeypointEnvJax()
    state, obs = env.reset(jax.random.PRNGKey(0), 3)
    assert obs.shape == (3, 20)


def test_render():
    env = PushTEnvJax()
    state, _ = env.reset(jax.random.PRNGKey(0), 1)
    single = jax.tree_util.tree_map(lambda x: x[0], state)
    img = env.render_state(single, 96)
    assert img.shape == (96, 96, 3)
    assert img.dtype == jnp.uint8
    arr = np.asarray(img)
    # contains the goal green and block gray colors
    assert (arr == np.array([144, 238, 144])).all(-1).any()
    assert (arr == np.array([119, 136, 153])).all(-1).any()


def test_vmapped_rollout_scan():
    """Whole rollout compiles into one scan over batched envs."""
    env = PushTEnvJax()

    def rollout(rng):
        state, obs = env.reset(rng, 8)

        def body(carry, _):
            state, rng = carry
            rng, k = jax.random.split(rng)
            action = jax.random.uniform(k, (8, 2), minval=100.0, maxval=400.0)
            state, obs, rew, done = env.step(state, action)
            return (state, rng), rew

        (_, _), rews = jax.lax.scan(body, (state, rng), None, length=10)
        return rews

    rews = jax.jit(rollout)(jax.random.PRNGKey(0))
    assert rews.shape == (10, 8)
    assert np.all(np.isfinite(np.asarray(rews)))


def test_image_env():
    from cleandiffuser_tpu.env.pusht_jax import PushTImageEnvJax

    env = PushTImageEnvJax(render_size=64)
    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    assert obs["image"].shape == (2, 3, 64, 64)
    assert obs["agent_pos"].shape == (2, 2)
    assert float(obs["image"].max()) <= 1.0
    state2, obs2, rew, done = env.step(state, state.agent_pos + 10.0)
    assert obs2["image"].shape == (2, 3, 64, 64)
