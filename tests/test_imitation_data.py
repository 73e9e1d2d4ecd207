"""Tests for ReplayBuffer, SequenceSampler, RotationTransformer, PushT datasets."""

import jax
import numpy as np

from cleandiffuser_tpu.dataset import (
    PushTKeypointDataset,
    PushTStateDataset,
    ReplayBuffer,
    RotationTransformer,
    SequenceSampler,
    create_indices,
    generate_pusht_demos,
)


def test_replay_buffer():
    rb = ReplayBuffer.create_empty_numpy()
    rb.add_episode({"state": np.ones((10, 5)), "action": np.zeros((10, 2))})
    rb.add_episode({"state": np.ones((7, 5)) * 2, "action": np.ones((7, 2))})
    assert rb.n_episodes == 2
    assert rb.n_steps == 17
    ep = rb.get_episode(1)
    assert ep["state"].shape == (7, 5)
    np.testing.assert_array_equal(rb.episode_ends, [10, 17])


def test_replay_buffer_npz_roundtrip(tmp_path):
    rb = ReplayBuffer.create_empty_numpy()
    rb.add_episode({"state": np.random.rand(5, 3).astype(np.float32)})
    p = str(tmp_path / "buf.npz")
    rb.save_npz(p)
    rb2 = ReplayBuffer.load_npz(p)
    np.testing.assert_allclose(rb2["state"], rb["state"])


def test_create_indices_padding():
    ends = np.array([10])
    idx = create_indices(ends, sequence_length=6, pad_before=2, pad_after=3)
    # min_start=-2, max_start=10-6+3=7 -> 10 windows
    assert len(idx) == 10
    # first window: starts before episode, needs front padding
    b_start, b_end, s_start, s_end = idx[0]
    assert b_start == 0 and s_start == 2
    # last window: overruns episode end, needs back padding
    b_start, b_end, s_start, s_end = idx[-1]
    assert b_end == 10 and s_end == 6 - 3


def test_sequence_sampler_replication_padding():
    rb = ReplayBuffer.create_empty_numpy()
    rb.add_episode({"x": np.arange(8, dtype=np.float32)[:, None]})
    sampler = SequenceSampler(rb, sequence_length=4, pad_before=2, pad_after=2)
    first = sampler.sample_sequence(0)["x"][:, 0]
    np.testing.assert_array_equal(first, [0, 0, 0, 1])  # edge replication
    last = sampler.sample_sequence(len(sampler) - 1)["x"][:, 0]
    np.testing.assert_array_equal(last, [6, 7, 7, 7])


def test_rotation_transformer_roundtrips():
    rng = np.random.default_rng(0)
    aa = rng.standard_normal((32, 3)) * 0.8
    for to_rep in ["rotation_6d", "quaternion", "matrix"]:
        rt = RotationTransformer("axis_angle", to_rep)
        back = rt.inverse(rt.forward(aa))
        # axis-angle is unique up to 2pi wrap; compare via matrices
        from cleandiffuser_tpu.dataset.dataset_utils import axis_angle_to_matrix

        np.testing.assert_allclose(
            axis_angle_to_matrix(back), axis_angle_to_matrix(aa), atol=1e-5
        )


def test_rotation_6d_orthonormal():
    rng = np.random.default_rng(1)
    d6 = rng.standard_normal((16, 6))
    rt = RotationTransformer("rotation_6d", "matrix")
    R = rt.forward(d6)
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_pusht_datasets_from_demos():
    rb = generate_pusht_demos(n_episodes=3, max_steps=30)
    assert rb.n_episodes == 3
    ds = PushTStateDataset(rb, horizon=10, pad_before=1, pad_after=7)
    assert len(ds) > 0
    item = ds[0]
    assert item["obs"]["state"].shape == (10, 5)
    assert item["action"].shape == (10, 2)
    assert np.abs(item["action"]).max() <= 1.0 + 1e-6
    batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
    assert batch["obs"]["state"].shape == (16, 10, 5)
    assert batch["action"].shape == (16, 10, 2)

    kds = PushTKeypointDataset(rb, horizon=10, pad_before=1, pad_after=7)
    item = kds[0]
    assert item["obs"]["state"].shape == (10, 20)
    batch = kds.sample_batch(jax.random.PRNGKey(0), 8)
    assert batch["obs"]["state"].shape == (8, 10, 20)


def test_native_indexing_matches_numpy():
    from cleandiffuser_tpu._native import (
        NATIVE_AVAILABLE,
        native_create_indices,
        native_window_rows,
    )

    if not NATIVE_AVAILABLE:
        import pytest

        pytest.skip("native library not built")
    ends = np.array([10, 25, 25, 40])  # includes an empty episode
    for seq, pb, pa in [(6, 2, 3), (4, 0, 0), (8, 7, 7)]:
        ref = create_indices(ends, seq, pb, pa)
        nat = native_create_indices(ends, seq, pb, pa)
        np.testing.assert_array_equal(ref, nat)
        # window rows replicate edges exactly like SequenceSampler padding
        rows = native_window_rows(ref, seq)
        for (b0, b1, s0, s1), row in zip(ref, rows):
            assert row[0] == b0 if s0 == 0 else row[0] == b0
            np.testing.assert_array_equal(row[s0:s1], np.arange(b0, b1))
            assert np.all(row[:s0] == b0)
            assert np.all(row[s1:] == b1 - 1)
