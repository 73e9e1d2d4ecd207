"""Tests for env wrappers, maze2d / kitchen / robomimic / blockpush datasets."""

import h5py
import jax
import numpy as np

from cleandiffuser_tpu.dataset import (
    BlockPushDataset,
    D4RLMaze2DTDDataset,
    DV_D4RLMaze2DSeqDataset,
    KitchenDataset,
    KitchenDatasetV2,
    ReplayBuffer,
    RobomimicDataset,
)
from cleandiffuser_tpu.env import MultiStepWrapper


def _fake_maze2d(n=2000):
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((n, 4)).astype(np.float32)
    act = rng.standard_normal((n, 2)).astype(np.float32)
    rew = np.zeros((n,), np.float32)
    rew[rng.choice(n, 20, replace=False)] = 1.0
    return {"observations": obs, "actions": act, "rewards": rew,
            "timeouts": np.zeros((n,), bool)}


def test_maze2d_seq_dataset():
    ds = DV_D4RLMaze2DSeqDataset(_fake_maze2d(), horizon=4, max_path_length=100, stride=2)
    assert len(ds) > 0
    item = ds[0]
    assert item["obs"]["state"].shape == (4, 4)
    batch = ds.sample_batch(jax.random.PRNGKey(0), 8)
    assert batch["obs"]["state"].shape == (8, 4, 4)
    # learn_policy variant recenters xy
    ds2 = DV_D4RLMaze2DSeqDataset(_fake_maze2d(), horizon=4, max_path_length=100,
                                  learn_policy=True)
    item = ds2[0]
    np.testing.assert_allclose(item["obs"]["state"][0, :2], 0.0, atol=1e-6)


def test_maze2d_td_dataset():
    ds = D4RLMaze2DTDDataset(_fake_maze2d(), reward_tune="iql")
    batch = ds.sample_batch(jax.random.PRNGKey(0), 16)
    assert batch["obs"]["state"].shape == (16, 4)
    assert np.all(np.asarray(batch["rew"]) <= 0.0)


def test_kitchen_dataset(tmp_path):
    # fake relay-policy-learning archive
    n_eps, max_len = 3, 50
    obs = np.random.randn(n_eps, max_len, 60).astype(np.float32)
    act = np.random.randn(n_eps, max_len, 9).astype(np.float32)
    masks = np.zeros((n_eps, max_len))
    for i, l in enumerate([50, 30, 40]):
        masks[i, :l] = 1
    np.save(tmp_path / "observations_seq.npy", obs)
    np.save(tmp_path / "actions_seq.npy", act)
    np.save(tmp_path / "existence_mask.npy", masks)

    for cls in (KitchenDataset, KitchenDatasetV2):
        ds = cls(tmp_path, horizon=8, pad_before=1, pad_after=7)
        assert len(ds) > 0
        item = ds[0]
        assert item["obs"]["state"].shape == (8, 60)
        assert item["action"].shape == (8, 9)
        batch = ds.sample_batch(jax.random.PRNGKey(0), 4)
        assert batch["obs"]["state"].shape == (4, 8, 60)


def test_robomimic_dataset(tmp_path):
    # fake robomimic hdf5
    path = str(tmp_path / "demo.hdf5")
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for i in range(2):
            demo = data.create_group(f"demo_{i}")
            T = 30 + i * 5
            og = demo.create_group("obs")
            og.create_dataset("object", data=np.random.randn(T, 10).astype(np.float32))
            og.create_dataset("robot0_eef_pos", data=np.random.randn(T, 3).astype(np.float32))
            og.create_dataset("robot0_eef_quat", data=np.random.randn(T, 4).astype(np.float32))
            og.create_dataset("robot0_gripper_qpos", data=np.random.randn(T, 2).astype(np.float32))
            demo.create_dataset("actions", data=np.random.randn(T, 7).astype(np.float32))

    ds = RobomimicDataset(path, horizon=8, pad_before=1, pad_after=7, abs_action=True)
    assert len(ds) > 0
    item = ds[0]
    assert item["obs"]["state"].shape == (8, 19)
    assert item["action"].shape == (8, 10)  # pos3 + rot6d + gripper1
    # undo transform maps back to 7 dims
    undone = ds.undo_transform_action(item["action"])
    assert undone.shape == (8, 7)


def test_block_push_dataset():
    rb = ReplayBuffer.create_empty_numpy()
    rb.add_episode({"obs": np.random.randn(40, 16).astype(np.float32),
                    "action": np.random.randn(40, 2).astype(np.float32)})
    ds = BlockPushDataset(rb, horizon=5, pad_before=1, pad_after=3)
    assert ds[0]["obs"]["state"].shape == (5, 16)


def test_multistep_wrapper():
    import gymnasium as gym

    env = MultiStepWrapper(
        gym.make("HalfCheetah-v5"), n_obs_steps=2, n_action_steps=4,
        max_episode_steps=20,
    )
    obs, info = env.reset(seed=0)
    assert obs.shape == (2, 17)
    chunk = np.zeros((4, 6))
    obs, rew, done, trunc, info = env.step(chunk)
    assert obs.shape == (2, 17)
    assert isinstance(rew, float)
