"""Format-exact ingestion fixtures: prove the real-artifact paths work.

The reference's users arrive with `pusht_cchi_v7_replay.zarr` (reference
dataset/pusht_dataset.py:24-42) and robomimic demo hdf5s (reference
dataset/robomimic_dataset.py:20). Neither artifact exists in this image,
so these tests write byte-level-faithful miniatures — a zarr-v2 DIRECTORY
store with zlib-compressed chunks and the cchi key layout, and an hdf5
with robomimic's data/demo_i/{obs/*,actions} tree — then drive the actual
ingestion code (ReplayBuffer.copy_from_path, tools/convert_pusht_zarr.py,
RobomimicDataset) over them. Dropping a real file must work with zero
code change.
"""

import json
import sys
import zlib
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.dataset.replay_buffer import ReplayBuffer  # noqa: E402


# ---------------------------------------------------------------------------
# zarr-v2 directory store writer (fixture side — hand-rolled on purpose so
# the READER is tested against the FORMAT, not against itself)
# ---------------------------------------------------------------------------
def _write_zarr_array(path: Path, arr: np.ndarray, chunks, compress=True):
    path.mkdir(parents=True, exist_ok=True)
    comp = {"id": "zlib", "level": 5} if compress else None
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": comp,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    (path / ".zarray").write_text(json.dumps(meta))
    grid = [range((s + c - 1) // c) for s, c in zip(arr.shape, chunks)]
    import itertools

    for idx in itertools.product(*grid):
        sl = tuple(slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks))
        block = arr[sl]
        # zarr pads edge chunks to the full chunk shape
        if block.shape != tuple(chunks):
            pad = np.zeros(chunks, arr.dtype)
            pad[tuple(slice(0, s) for s in block.shape)] = block
            block = pad
        raw = np.ascontiguousarray(block).tobytes()
        if compress:
            raw = zlib.compress(raw, 5)
        (path / ".".join(map(str, idx))).write_bytes(raw)


def _make_cchi_zarr(root: Path, n_steps=50, n_eps=3, seed=0):
    """Miniature of the pusht_cchi_v7_replay.zarr layout:
    data/{state,action,keypoint} + meta/episode_ends."""
    rng = np.random.default_rng(seed)
    (root / "data").mkdir(parents=True)
    (root / "meta").mkdir()
    (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (root / "data" / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    (root / "meta" / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    state = rng.uniform(0, 512, (n_steps, 5)).astype(np.float32)
    action = rng.uniform(0, 512, (n_steps, 2)).astype(np.float32)
    keypoint = rng.uniform(0, 512, (n_steps, 9, 2)).astype(np.float32)
    ends = np.array([20, 35, n_steps], np.int64)[:n_eps]
    _write_zarr_array(root / "data" / "state", state, (16, 5))
    _write_zarr_array(root / "data" / "action", action, (16, 2))
    _write_zarr_array(root / "data" / "keypoint", keypoint, (16, 9, 2))
    # uncompressed 1-D array exercises the compressor=null branch
    _write_zarr_array(root / "meta" / "episode_ends", ends, (2,),
                      compress=False)
    return {"state": state, "action": action, "keypoint": keypoint,
            "episode_ends": ends}


def test_replay_buffer_reads_zarr_v2_directory_store(tmp_path):
    ref = _make_cchi_zarr(tmp_path / "mini.zarr")
    rb = ReplayBuffer.copy_from_path(str(tmp_path / "mini.zarr"))
    assert sorted(rb.data.keys()) == ["action", "keypoint", "state"]
    np.testing.assert_array_equal(rb["state"], ref["state"])
    np.testing.assert_array_equal(rb["keypoint"], ref["keypoint"])
    np.testing.assert_array_equal(rb.episode_ends, ref["episode_ends"])
    assert rb.n_episodes == 3


def test_convert_pusht_zarr_roundtrip(tmp_path):
    from tools.convert_pusht_zarr import convert

    ref = _make_cchi_zarr(tmp_path / "mini.zarr", seed=1)
    npz = tmp_path / "mini.npz"
    convert(str(tmp_path / "mini.zarr"), str(npz),
            keys=["state", "action", "keypoint"])
    rb = ReplayBuffer.load_npz(str(npz))
    np.testing.assert_array_equal(rb["action"], ref["action"])
    np.testing.assert_array_equal(rb.episode_ends, ref["episode_ends"])


def test_pusht_dataset_trains_off_zarr_path_directly(tmp_path):
    """The dp/dbc CLI contract: dataset_path=<store>.zarr just works."""
    from cleandiffuser_tpu.dataset.pusht import PushTStateDataset

    _make_cchi_zarr(tmp_path / "mini.zarr", seed=2)
    ds = PushTStateDataset(str(tmp_path / "mini.zarr"), horizon=8,
                           pad_before=1, pad_after=7)
    item = ds[0]
    assert item["obs"]["state"].shape == (8, 5)
    assert item["action"].shape == (8, 2)
    assert len(ds) > 0


def test_zarr_blosc_store_raises_actionable_error(tmp_path):
    root = tmp_path / "blosc.zarr"
    ref = _make_cchi_zarr(root, seed=3)
    del ref
    meta_p = root / "data" / "state" / ".zarray"
    meta = json.loads(meta_p.read_text())
    meta["compressor"] = {"id": "blosc", "cname": "lz4", "clevel": 5,
                          "shuffle": 1}
    meta_p.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="blosc.*zarr"):
        ReplayBuffer.copy_from_path(str(root), keys=["state"])


# ---------------------------------------------------------------------------
# robomimic hdf5 (data/demo_i/{obs/<key>,actions} + num_samples attrs —
# reference robomimic_dataset.py:20 expects exactly this tree)
# ---------------------------------------------------------------------------
def _make_robomimic_hdf5(path: Path, n_demos=3, seed=0):
    import h5py

    rng = np.random.default_rng(seed)
    lens = [17, 23, 11][:n_demos]
    demos = []
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Lift", "type": 1,
             "env_kwargs": {"control_freq": 20}})
        data.attrs["total"] = int(np.sum(lens))
        for i, T in enumerate(lens):
            d = data.create_group(f"demo_{i}")
            d.attrs["num_samples"] = T
            obs = d.create_group("obs")
            obs.create_dataset("object", data=rng.normal(size=(T, 10))
                               .astype(np.float64))
            obs.create_dataset("robot0_eef_pos", data=rng.normal(size=(T, 3)))
            quat = rng.normal(size=(T, 4))
            quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
            obs.create_dataset("robot0_eef_quat", data=quat)
            obs.create_dataset("robot0_gripper_qpos",
                               data=rng.normal(size=(T, 2)))
            # axis-angle rotations within a valid magnitude band
            aa = rng.uniform(-1, 1, (T, 3))
            act = np.concatenate(
                [rng.uniform(-1, 1, (T, 3)), aa, rng.uniform(-1, 1, (T, 1))],
                -1)
            d.create_dataset("actions", data=act.astype(np.float64))
            d.create_dataset("rewards", data=np.zeros(T))
            d.create_dataset("dones", data=np.zeros(T, np.int64))
            demos.append(dict(T=T, actions=act))
        mask = f.create_group("mask")
        mask.create_dataset("train", data=np.array(
            [f"demo_{i}".encode() for i in range(n_demos)]))
    return demos


def test_robomimic_dataset_reads_real_hdf5_layout(tmp_path):
    h5py = pytest.importorskip("h5py")
    del h5py
    from cleandiffuser_tpu.dataset.robomimic import RobomimicDataset

    path = tmp_path / "low_dim.hdf5"
    demos = _make_robomimic_hdf5(path)
    ds = RobomimicDataset(str(path), horizon=4, pad_before=1, pad_after=3)
    assert ds.replay_buffer.n_episodes == 3
    # obs = concat(object 10, eef_pos 3, eef_quat 4, gripper 2) = 19 dims
    assert ds.replay_buffer["obs"].shape == (sum(d["T"] for d in demos), 19)
    item = ds[0]
    assert item["obs"]["state"].shape == (4, 19)
    assert item["action"].shape == (4, 7)


def test_robomimic_abs_action_roundtrip_from_hdf5(tmp_path):
    pytest.importorskip("h5py")
    from cleandiffuser_tpu.dataset.robomimic import RobomimicDataset

    path = tmp_path / "low_dim_abs.hdf5"
    demos = _make_robomimic_hdf5(path, seed=4)
    ds = RobomimicDataset(str(path), horizon=2, abs_action=True)
    # abs_action lifts axis-angle (7) to rotation_6d (10); undoing the
    # transform must reproduce the file's raw actions
    assert ds.replay_buffer["action"].shape[-1] == 10
    raw = np.concatenate([d["actions"] for d in demos], 0)
    undone = ds.undo_transform_action(ds.replay_buffer["action"][:])
    np.testing.assert_allclose(undone, raw, atol=1e-5)
