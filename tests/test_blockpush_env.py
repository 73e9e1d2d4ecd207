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


def test_multimodal_oracle_covers_four_modes():
    """Assignment x order multimodality: across seeds, both push orders and
    both assignments appear (reference multimodal_push_oracle semantics)."""
    from cleandiffuser_tpu.env import generate_blockpush_demos
    from cleandiffuser_tpu.env.block_pushing_jax import TARGET_R

    rb = generate_blockpush_demos(n_episodes=12, max_steps=200, seed=3)
    first_pushed, assigns = set(), set()
    for ep in range(rb.n_episodes):
        obs = rb.get_episode(ep)["obs"]
        b0, b1 = obs[:, 0:2], obs[:, 3:5]
        t0, t1 = obs[0, 10:12], obs[0, 13:15]
        # which block moved first
        m0 = np.linalg.norm(b0 - b0[0], axis=-1) > 0.01
        m1 = np.linalg.norm(b1 - b1[0], axis=-1) > 0.01
        if m0.any() and m1.any():
            first_pushed.add(0 if m0.argmax() < m1.argmax() else 1)
        # final assignment of block0
        d00 = np.linalg.norm(b0[-1] - t0)
        d01 = np.linalg.norm(b0[-1] - t1)
        if min(d00, d01) < TARGET_R:
            assigns.add(0 if d00 < d01 else 1)
    assert first_pushed == {0, 1}, f"push orders seen: {first_pushed}"
    assert assigns == {0, 1}, f"assignments seen: {assigns}"


def test_reach_oracle_reaches_without_touching():
    from cleandiffuser_tpu.env import generate_blockpush_reach_demos
    from cleandiffuser_tpu.env.block_pushing_jax import TARGET_R

    rb = generate_blockpush_reach_demos(n_episodes=4, max_steps=120, seed=0)
    for ep in range(rb.n_episodes):
        obs = rb.get_episode(ep)["obs"]
        eff = obs[:, 8:10]
        t0, t1 = obs[0, 10:12], obs[0, 13:15]
        d = min(np.linalg.norm(eff[-1] - t0), np.linalg.norm(eff[-1] - t1))
        assert d < TARGET_R, f"episode {ep} never reached a target ({d:.3f})"
        # blocks untouched
        for sl in (slice(0, 2), slice(3, 5)):
            assert np.linalg.norm(obs[-1, sl] - obs[0, sl]) < 1e-5


def test_discontinuous_oracle_switches_midway_and_succeeds():
    from cleandiffuser_tpu.env import generate_blockpush_discontinuous_demos
    from cleandiffuser_tpu.env.block_pushing_jax import TARGET_R

    rb = generate_blockpush_discontinuous_demos(
        n_episodes=6, max_steps=260, seed=1)
    n_success = n_switch = 0
    for ep in range(rb.n_episodes):
        obs = rb.get_episode(ep)["obs"]
        b = [obs[:, 0:2], obs[:, 3:5]]
        t = [obs[0, 10:12], obs[0, 13:15]]
        # success: both blocks in distinct targets at the end
        d = np.array([[np.linalg.norm(b[i][-1] - t[j]) for j in (0, 1)]
                      for i in (0, 1)])
        hit = d < TARGET_R
        if (hit[0, 0] and hit[1, 1]) or (hit[0, 1] and hit[1, 0]):
            n_success += 1
        # discontinuity: some block moves, pauses >15 steps, then moves again
        for bi in (0, 1):
            sp = np.linalg.norm(np.diff(b[bi], axis=0), axis=-1) > 1e-4
            if sp.any():
                first, last = sp.argmax(), len(sp) - 1 - sp[::-1].argmax()
                inner = sp[first:last]
                if (~inner).sum() > 15:
                    n_switch += 1
                    break
    assert n_success >= 4, f"only {n_success}/6 succeeded"
    assert n_switch >= 4, f"only {n_switch}/6 showed the mid-task switch"
