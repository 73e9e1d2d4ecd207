"""Merge PushT demo .npz archives (ReplayBuffer flat layout) into one.

Usage: python tools/merge_pusht_npz.py out.npz in1.npz in2.npz [...]

Each input holds flat per-step arrays (state/action/keypoint/img/...) plus
`episode_ends`; outputs the concatenation with episode_ends offset. Used to
scale the on-device MPC expert demo sets (generation is batched per seed;
merging beats one long generation run because demo batches parallelize
across invocations).
"""

import sys

import numpy as np


def merge(paths):
    datas = [dict(np.load(p, allow_pickle=True)) for p in paths]
    keys = set(datas[0].keys())
    for d in datas[1:]:
        assert set(d.keys()) == keys, (set(d.keys()), keys)
    out = {}
    offsets = np.cumsum(
        [0] + [int(d["episode_ends"][-1]) for d in datas])[:-1]
    out["episode_ends"] = np.concatenate(
        [d["episode_ends"] + off for d, off in zip(datas, offsets)])
    for k in keys - {"episode_ends"}:
        out[k] = np.concatenate([d[k] for d in datas], axis=0)
    return out


def main():
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    assert len(in_paths) >= 2, "need >= 2 inputs"
    out = merge(in_paths)
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path}: {len(out['episode_ends'])} episodes / "
          f"{int(out['episode_ends'][-1])} steps")


if __name__ == "__main__":
    main()
