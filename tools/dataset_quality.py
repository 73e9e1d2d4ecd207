"""Measure regenerated-dataset behavior quality vs the d4rl originals.

VERDICT r3 item 3a: the "v5-dynamics caveat" on below-band rows was doing
unquantified work. This quantifies it offline — no simulation: per
dataset, the mean d4rl-normalized episode return of the BEHAVIOR data
(full episodes only), compared against the published v2 dataset averages
(d4rl infos / paper table). The difference is the data-quality bias a
policy trained here inherits relative to the published bands.

Published averages: d4rl's own datasets, normalized with the same
(random, expert) ranges used by get_normalized_score (pipelines/
data_loading.py D4RL_SCORE_RANGES = gym d4rl infos.py values).

Usage: python tools/dataset_quality.py [--json]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cleandiffuser_tpu.pipelines.data_loading import (  # noqa: E402
    DATA_DIR,
    D4RL_SCORE_RANGES,
)

# d4rl v2 dataset behavior averages (normalized returns of the data
# itself; d4rl paper table 2 / infos.py REF scores recomputed by the
# community — used as the comparison anchor, not as a score claim)
D4RL_DATASET_AVG = {
    "halfcheetah-medium-v2": 0.405,
    "hopper-medium-v2": 0.446,
    "walker2d-medium-v2": 0.620,
    "halfcheetah-medium-replay-v2": 0.276,
    "hopper-medium-replay-v2": 0.150,
    "walker2d-medium-replay-v2": 0.148,
    "halfcheetah-medium-expert-v2": 0.648,
    "hopper-medium-expert-v2": 0.645,
    "walker2d-medium-expert-v2": 0.820,
}


def episode_returns(d):
    rew, to, tm = d["rewards"], d["timeouts"], d["terminals"]
    ends = np.nonzero((to + tm) > 0)[0]
    rets, p = [], 0
    for e in ends:
        rets.append(float(rew[p:e + 1].sum()))
        p = e + 1
    return np.asarray(rets)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows = {}
    for name, ref_avg in D4RL_DATASET_AVG.items():
        path = DATA_DIR / f"{name}.npz"
        if not path.exists():
            continue
        d = np.load(path)
        lo, hi = D4RL_SCORE_RANGES[name.split("-")[0]]
        norm = (episode_returns(d) - lo) / (hi - lo)
        rows[name] = dict(ours=round(float(norm.mean()), 3),
                          episodes=int(norm.shape[0]),
                          d4rl=ref_avg,
                          bias=round(float(norm.mean()) - ref_avg, 3))
    if args.json:
        print(json.dumps(rows, indent=1))
    else:
        for k, v in rows.items():
            print(f"{k:36s} ours {v['ours']:.3f} (n={v['episodes']}) "
                  f"vs d4rl {v['d4rl']:.3f}  bias {v['bias']:+.3f}")


if __name__ == "__main__":
    main()
