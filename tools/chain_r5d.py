"""Round-5d chain: value-reordered replacement for chain_r5c stages 3-7.

Mid-round discovery: the walker2d datasets on disk were regenerated at
07:11-07:24, BEFORE the stochastic-gate + full-curve-ring commit (8409c07,
07:59) — chain_r5b's "already 0.62-gated" assumption was wrong (the old
log line even reads "gate 0.6", the pre-fix uniform gate). Their measured
bias is unchanged (walker2d-medium -0.152, -mr -0.076, tools/
dataset_quality.py), so chain_r5c's stage 4 would have re-scored rows on
old-recipe data. This chain instead regenerates walker2d medium+replay
with the calibrated medium pick (make_locomotion_dataset.py --medium-only,
20-episode stochastic calibration) and retrains the walker2d rows on it.

Value order, with per-stage commits (rows that land are durable even if a
tunnel outage eats a later stage):
  1. bench.py on-chip -> BENCH_full.json + compact headline (VERDICT r4 #6)
  2. hc-medium seed re-scores (the two remaining +-0.000 triplet rows, #3)
  3. walker2d --medium-only calibrated regen, then dql/idql walker2d-medium
     + dql walker2d-medreplay retrains (#2a + the third triplet row); the
     r4 dql_walker2d_medium_2m row is kept (scored post-seed-fix, in band)
  4. halfcheetah --replay-only regen (full-curve ring) + dql_hc_medreplay
  5. veteran_maze2d_large_gi_pin15 (inference-only)

Usage: nohup python -u tools/chain_r5d.py > logs/chain_r5d.log 2>&1 &
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

from chain_r5b import (  # noqa: E402
    board,
    clear_ckpts,
    commit_stage,
    drop_rows,
    gen_dataset,
    log,
    suite,
    wait_ready,
)


def main():
    log("start (value-reordered tail after the walker2d data discovery)")
    b = board()

    # --- 1. bench on-chip: BENCH_full.json + compact headline ---
    wait_ready()
    if not (ROOT / "BENCH_full.json").exists():
        with open(ROOT / "logs" / "bench_r5.log", "w") as f:
            r = subprocess.run([sys.executable, "-u", "bench.py"], cwd=ROOT,
                               stdout=f, stderr=subprocess.STDOUT)
        log(f"bench.py -> rc={r.returncode}")
        if r.returncode == 0:
            subprocess.run(["git", "add", "BENCH_full.json",
                            "logs/bench_r5.log"], cwd=ROOT)
            subprocess.run(["git", "commit", "-q", "-m",
                            "Mid-round bench: BENCH_full.json + compact "
                            "headline"], cwd=ROOT)

    # --- 2. pre-fix seed rows (identical-episode triplets, ckpts gone) ---
    clear_ckpts("dql_d4rl_mujoco/halfcheetah-medium-v2",
                "idql_d4rl_mujoco/halfcheetah-medium-v2")
    drop_rows("dql_hc_medium", "idql_hc_medium")
    rc = suite("dql_hc_medium,idql_hc_medium")
    b = commit_stage("hc-medium seed re-scores", b, rc)

    # --- 3. walker2d calibrated regen + retrains ---
    rc = gen_dataset(["tools/make_locomotion_dataset.py", "walker2d",
                      "--medium-only"],
                     "chain_r5_gen_walker_medium.log", r"\[sac:")
    if rc == 0:
        wjobs = ["dql_walker2d_medium", "idql_walker2d_medium",
                 "dql_walker2d_medreplay"]
        clear_ckpts("dql_d4rl_mujoco/walker2d-medium-v2",
                    "dql_d4rl_mujoco/walker2d-medium-replay-v2",
                    "idql_d4rl_mujoco/walker2d-medium-v2")
        drop_rows(*wjobs)
        rc = suite(",".join(wjobs))
        b = commit_stage("walker2d re-scores on calibrated-pick data", b, rc)
    else:
        log("walker2d medium regen FAILED — keeping old rows")

    # --- 4. halfcheetah medium-replay on the full-curve ring ---
    rc = gen_dataset(["tools/make_locomotion_dataset.py", "halfcheetah",
                      "--replay-only"],
                     "chain_r5_gen_hc_replay.log", r"\[sac:")
    if rc == 0:
        clear_ckpts("dql_d4rl_mujoco/halfcheetah-medium-replay-v2")
        drop_rows("dql_hc_medreplay")
        rc = suite("dql_hc_medreplay")
        b = commit_stage("hc-medium-replay re-score", b, rc)
    else:
        log("hc replay regen FAILED — keeping old row")

    # --- 5. maze2d-large gi pin sweep (inference-only) ---
    rc = suite("veteran_maze2d_large_gi_pin15")
    b = commit_stage("maze2d-large gi pin15", b, rc)

    log("all done")


if __name__ == "__main__":
    main()
