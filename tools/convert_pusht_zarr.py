"""Convert the reference PushT zarr (`pusht_cchi_v7_replay.zarr`) to .npz.

Run where zarr is installed (it is not, in the TPU environment); the
output drops into any dp/dbc pusht CLI via `dataset_path=<file>.npz` and
the run trains on the real human-expert demos instead of the MPC expert —
zero code change (cleandiffuser_tpu/pipelines/data_loading.py
resolve_pusht_demos resolution order).

The .npz schema mirrors ReplayBuffer.save_npz: one array per data key
(state, action, keypoint, img) plus `episode_ends`.

Usage:
    python tools/convert_pusht_zarr.py dev/pusht/pusht_cchi_v7_replay.zarr \
        dev/pusht/pusht_cchi_v7_replay.npz [--keys state action keypoint]
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("zarr_path")
    p.add_argument("npz_path")
    p.add_argument("--keys", nargs="*", default=None,
                   help="data keys to export (default: all)")
    args = p.parse_args()

    import zarr

    root = zarr.open(args.zarr_path, "r")
    keys = args.keys or list(root["data"].keys())
    out = {k: np.asarray(root["data"][k]) for k in keys}
    out["episode_ends"] = np.asarray(root["meta"]["episode_ends"])
    np.savez_compressed(args.npz_path, **out)
    n_eps = len(out["episode_ends"])
    n_steps = int(out["episode_ends"][-1]) if n_eps else 0
    print(f"wrote {args.npz_path}: {n_eps} episodes, {n_steps} steps, keys={keys}")


if __name__ == "__main__":
    main()
