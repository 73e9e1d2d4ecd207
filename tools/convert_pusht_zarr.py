"""Convert the reference PushT zarr (`pusht_cchi_v7_replay.zarr`) to .npz.

The output drops into any dp/dbc pusht CLI via `dataset_path=<file>.npz`
and the run trains on the real human-expert demos instead of the MPC
expert — zero code change (cleandiffuser_tpu/pipelines/data_loading.py
resolve_pusht_demos resolution order). Note the CLIs also accept the
`.zarr` path DIRECTLY (ReplayBuffer.copy_from_path) when the store is
uncompressed/zlib or the zarr package is installed; this converter exists
for blosc-compressed stores (run it where zarr+numcodecs are installed)
and to shrink-wrap a store into one file.

Reads through the zarr package when installed, else the built-in
pure-numpy zarr-v2 directory reader (cleandiffuser_tpu.dataset.zarr_compat).

The .npz schema mirrors ReplayBuffer.save_npz: one array per data key
(state, action, keypoint, img) plus `episode_ends`.

Usage:
    python tools/convert_pusht_zarr.py dev/pusht/pusht_cchi_v7_replay.zarr \
        dev/pusht/pusht_cchi_v7_replay.npz [--keys state action keypoint]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.dataset.zarr_compat import open_zarr  # noqa: E402


def convert(zarr_path, npz_path, keys=None):
    root = open_zarr(zarr_path)
    keys = keys or list(root["data"].keys())
    out = {k: np.asarray(root["data"][k]) for k in keys}
    out["episode_ends"] = np.asarray(root["meta"]["episode_ends"])
    np.savez_compressed(npz_path, **out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("zarr_path")
    p.add_argument("npz_path")
    p.add_argument("--keys", nargs="*", default=None,
                   help="data keys to export (default: all)")
    args = p.parse_args()

    out = convert(args.zarr_path, args.npz_path, args.keys)
    n_eps = len(out["episode_ends"])
    n_steps = int(out["episode_ends"][-1]) if n_eps else 0
    keys = [k for k in out if k != "episode_ends"]
    print(f"wrote {args.npz_path}: {n_eps} episodes, {n_steps} steps, "
          f"keys={keys}")


if __name__ == "__main__":
    main()
