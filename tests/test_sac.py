"""SAC data-generation engine (utils/sac.py + make_locomotion_dataset).

The locomotion snapshot generator re-creates d4rl's SAC-based dataset
recipe; these tests pin the pieces that guard data correctness: replay
masking under gymnasium's NEXT_STEP autoreset, ring export ordering,
qlearning boundary dropping, and that the fused update window actually
learns (TD loss falls, Q rises toward the known value of a constant-
reward MDP).
"""

import numpy as np
import pytest

from cleandiffuser_tpu.utils.sac import SAC, ReplayRing


def test_replay_ring_wrap_and_export():
    ring = ReplayRing(10, 2, 1)
    for i in range(14):
        ring.add_batch(np.full((1, 2), i, np.float32),
                       np.zeros((1, 1), np.float32),
                       np.array([i], np.float32),
                       np.full((1, 2), i + 1, np.float32),
                       np.zeros((1,), np.float32))
    assert ring.size == 10 and ring.ptr == 4
    data = ring.export()
    # chronological: oldest surviving entry (4) first
    np.testing.assert_allclose(data["rewards"], np.arange(4, 14))
    assert data["timeouts"].sum() == 0


def test_update_window_learns_constant_reward_mdp():
    """One-state MDP with reward 1 and gamma 0.9: Q* = 10. After a few
    hundred fused updates the critic must move decisively toward it."""
    sac = SAC(obs_dim=2, act_dim=1, gamma=0.9, rng=0)
    rng = np.random.default_rng(0)

    def batch_stack(k, b):
        return {
            "obs": rng.normal(0, 0.1, (k, b, 2)).astype(np.float32),
            "act": rng.uniform(-1, 1, (k, b, 1)).astype(np.float32),
            "rew": np.ones((k, b), np.float32),
            "next_obs": rng.normal(0, 0.1, (k, b, 2)).astype(np.float32),
            "term": np.zeros((k, b), np.float32),
        }

    first = sac.update_window(batch_stack(8, 64))
    for _ in range(60):
        log = sac.update_window(batch_stack(8, 64))
    assert float(log["q_mean"]) > 3.0, log  # moving toward 10
    assert np.isfinite(float(log["critic_loss"]))
    assert float(log["q_mean"]) > float(first["q_mean"])


def test_act_shapes_and_determinism():
    sac = SAC(obs_dim=3, act_dim=2, rng=1)
    obs = np.zeros((5, 3), np.float32)
    a1 = sac.act(obs, deterministic=True)
    a2 = sac.act(obs, deterministic=True)
    np.testing.assert_allclose(a1, a2)
    assert a1.shape == (5, 2) and np.all(np.abs(a1) <= 1.0)
    s1 = sac.act(obs)
    s2 = sac.act(obs)
    assert not np.allclose(s1, s2)  # stochastic path actually samples


def test_qlearning_view_drops_episode_boundaries():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from make_locomotion_dataset import to_qlearning

    n = 10
    data = {
        "observations": np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        "actions": np.zeros((n, 1), np.float32),
        "rewards": np.arange(n, dtype=np.float32),
        "terminals": np.zeros((n,), np.float32),
        "timeouts": np.zeros((n,), np.float32),
    }
    data["terminals"][4] = 1.0  # rows 5.. belong to a new episode
    data["timeouts"][7] = 1.0
    q = to_qlearning(data)
    # terminal row 4 kept (bootstrap masked by terminal=1); timeout row 7
    # dropped (successor is a reset); last row always dropped
    assert q["observations"].shape[0] == n - 2
    assert 4.0 in q["rewards"] and q["terminals"].sum() == 1
    assert 7.0 not in q["rewards"]
    np.testing.assert_allclose(q["next_observations"][:4],
                               data["observations"][1:5])


def test_device_collector_masked_ring_and_export():
    """The fused collector must (a) write only mask=1 rows, compacted, at
    a compile-once fixed row width; (b) export a per-env time-ordered
    sequence view with boundary timeouts; (c) export a transition view
    whose next_observations are the STORED successors (row i+1 in the
    interleaved ring is a different env's step)."""
    from cleandiffuser_tpu.utils.sac import DeviceCollector, NumpyActor

    n, O, A = 4, 3, 2
    sac = SAC(O, A, rng=0)
    col = DeviceCollector(sac, capacity=32, n_envs=n, batch_size=8,
                          updates_per_iter=2)
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((n, O)).astype(np.float32)
    new, written = None, []
    for it in range(6):
        act, log = col.step(obs, new, update=it >= 2)
        assert act.shape == (n, A) and np.all(np.abs(act) <= 1.0)
        nobs = rng.standard_normal((n, O)).astype(np.float32)
        mask = np.ones((n,), np.float32)
        mask[it % n] = 0.0  # one autoreset row per iteration
        new = {"obs": obs, "act": act,
               "rew": np.full((n,), float(it), np.float32),
               "next_obs": nobs, "term": np.zeros((n,), np.float32),
               "done": np.zeros((n,), np.float32),
               "env": np.arange(n, dtype=np.int32), "mask": mask}
        for i in range(n):
            if mask[i]:
                written.append((i, float(it), obs[i].copy(), nobs[i].copy()))
        obs = nobs
    # last `new` not yet flushed into the ring
    assert col.size == len(written) - (n - 1)
    ex = col.export()
    q = ex.pop("qlearning")
    kept = written[:col.size]
    # transition view preserves stored successors in chronological order
    for row, (env_i, rew, o, no) in enumerate(kept):
        np.testing.assert_allclose(q["observations"][row], o, atol=1e-6)
        np.testing.assert_allclose(q["next_observations"][row], no, atol=1e-6)
        assert q["rewards"][row] == rew
    # sequence view: env-major, time-ordered within env, boundary timeouts
    envs_of = np.array([w[0] for w in kept])
    rews_of = np.array([w[1] for w in kept])
    by_env = np.argsort(envs_of, kind="stable")
    np.testing.assert_allclose(ex["rewards"], rews_of[by_env])
    n_segments = len(np.unique(envs_of))
    assert ex["timeouts"].sum() == n_segments  # one truncation per env tail
    assert np.isfinite(float(log["critic_loss"]))
    # NumpyActor matches the jax deterministic policy
    np.testing.assert_allclose(
        NumpyActor(sac.snapshot_actor())(obs),
        sac.act(obs, deterministic=True), atol=1e-5)


def test_sac_checkpoint_roundtrip(tmp_path):
    sac = SAC(obs_dim=2, act_dim=1, rng=0)
    obs = np.ones((3, 2), np.float32)
    ref = sac.act(obs, deterministic=True)
    p = str(tmp_path / "sac.pkl")
    sac.save(p)
    sac2 = SAC(obs_dim=2, act_dim=1, rng=9)
    sac2.load(p)
    np.testing.assert_allclose(sac2.act(obs, deterministic=True), ref,
                               atol=1e-6)
