"""Round-5c chain: chain_r5b stages 1-7 after the dd_kitchen mid-run stall.

chain_r5b's stage-1 kitchen train hit a THIRD wedge signature at 432k/1M:
log frozen >20 min while the client spun on the dead tunnel socket in
kernel time (~0.6 ticks/s), so the driver's strict log+CPU freeze check
never fired (tunnel probe from a fresh client succeeded — per-client
stall, not an outage). run_score_suite.launch_with_retry now uses a
tick-RATE threshold for the mid-run check; this chain restarts the
remaining work WITHOUT clearing the kitchen checkpoints. (Post-hoc note:
dd_d4rl_kitchen.py has no resume support — the retrain and both
"inference-only" variants each retrained the full 1M steps from scratch,
~20 min apiece; scores were unaffected, only wall-clock.) Stage 0
(adaptdiffuser commit) was already done by chain_r5b.

Usage: nohup python -u tools/chain_r5c.py > logs/chain_r5c.log 2>&1 &
"""

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
    log("start (continuation of chain_r5b after the dd_kitchen stall)")
    b = board()
    wait_ready()

    # --- 1. kitchen retrains, RESUMED (no clear_ckpts: dd has ckpt_400000,
    # rows were already dropped by chain_r5b's stage 1) ---
    kjobs = ["dd_kitchen_mixed", "dql_kitchen_mixed",
             "dd_kitchen_mixed_tr068", "dd_kitchen_mixed_wcfg2"]
    rc = suite(",".join(kjobs))
    b = commit_stage("kitchen retrains on 1.89-ceiling data", b, rc)

    # --- 2. hopper medium-replay on the full-curve ring ---
    rc = gen_dataset(["tools/make_locomotion_dataset.py", "hopper",
                      "--replay-only"],
                     "chain_r5_gen_hopper_replay.log", r"\[sac:")
    if rc == 0:
        clear_ckpts("dql_d4rl_mujoco/hopper-medium-replay-v2")
        drop_rows("dql_hopper_medreplay")
        rc = suite("dql_hopper_medreplay")
        b = commit_stage("hopper-medium-replay re-score", b, rc)
    else:
        log("hopper replay regen FAILED — keeping old row")

    # --- 3. bench on-chip: BENCH_full.json + compact headline ---
    import subprocess

    wait_ready()
    with open(ROOT / "logs" / "bench_r5.log", "w") as f:
        r = subprocess.run([sys.executable, "-u", "bench.py"], cwd=ROOT,
                           stdout=f, stderr=subprocess.STDOUT)
    log(f"bench.py -> rc={r.returncode}")
    if r.returncode == 0:
        subprocess.run(["git", "add", "BENCH_full.json", "logs/bench_r5.log"],
                       cwd=ROOT)
        subprocess.run(["git", "commit", "-q", "-m",
                        "Mid-round bench: BENCH_full.json + compact headline"],
                       cwd=ROOT)

    # --- 4. walker2d re-scores on the 0.62-gated data (already on disk) ---
    wjobs = ["dql_walker2d_medium", "idql_walker2d_medium",
             "dql_walker2d_medreplay", "dql_walker2d_medium_2m"]
    clear_ckpts("dql_d4rl_mujoco/walker2d-medium-v2",
                "dql_d4rl_mujoco/walker2d-medium-replay-v2",
                "idql_d4rl_mujoco/walker2d-medium-v2")
    drop_rows(*wjobs)
    rc = suite(",".join(wjobs))
    b = commit_stage("walker2d re-scores on 0.62-gated data", b, rc)

    # --- 5. halfcheetah medium-replay on the full-curve ring ---
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

    # --- 6. pre-fix seed rows (identical-episode triplets, ckpts gone) ---
    clear_ckpts("dql_d4rl_mujoco/halfcheetah-medium-v2",
                "idql_d4rl_mujoco/halfcheetah-medium-v2")
    drop_rows("dql_hc_medium", "idql_hc_medium")
    rc = suite("dql_hc_medium,idql_hc_medium")
    b = commit_stage("hc-medium seed re-scores", b, rc)

    # --- 7. maze2d-large gi pin sweep (inference-only) ---
    rc = suite("veteran_maze2d_large_gi_pin15")
    b = commit_stage("maze2d-large gi pin15", b, rc)

    log("all done")


if __name__ == "__main__":
    main()
