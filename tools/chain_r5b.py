"""Round-5b chain: the rest of VERDICT r4 after chain_r5's first two stages.

Replaces chain_r5's remaining stages with a corrected plan:
  - drops chain_r5's walker2d FULL regen (the 07:24 data already used the
    0.62 stochastic gate — chain_d_gen_walker.log: "medium pick:
    normalized 0.636 (gate 0.6)"); only the rows TRAINED on the old data
    need re-scoring (dql/idql walker2d-medium, dql walker2d-medreplay,
    plus dql_walker2d_medium_2m whose r4 run resumed an old-data 1M ckpt)
  - adds the kitchen retrains on the regenerated 1.89-tasks/ep data
    (VERDICT r4 item 5) + the tr068/wcfg2 inference variants
  - adds a mid-round bench run so BENCH_full.json and the compact headline
    are verified on-chip before the driver's round-end run (item 6)

Stages, value order (each commits only the rows that actually landed —
ADVICE r4 #1):
  0. wait for the orphaned adaptdiffuser suite run to finish; commit it
  1. kitchen: dd_kitchen_mixed + dql_kitchen_mixed retrains on the new
     dataset, then dd_kitchen_mixed_tr068 / _wcfg2 (inference-only)
  2. hopper --replay-only regen (full-curve ring) + dql_hopper_medreplay
  3. bench.py on-chip -> BENCH_full.json + logs/bench_r5.log committed
  4. walker2d re-scores on the 0.62-gated data (no regen):
     dql_walker2d_medium, idql_walker2d_medium, dql_walker2d_medreplay,
     dql_walker2d_medium_2m
  5. halfcheetah --replay-only regen + dql_hc_medreplay
  6. dql_hc_medium / idql_hc_medium re-scores under fixed eval seeding
  7. veteran_maze2d_large_gi_pin15 (inference-only)

Usage: nohup python -u tools/chain_r5b.py > logs/chain_r5b.log 2>&1 &
"""

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

from run_score_suite import SCOREBOARD, LEGACY_SCOREBOARD, launch_with_retry  # noqa: E402

LOGDIR = ROOT / "logs"


def log(msg):
    print(f"[chain-r5b] {msg} | {time.strftime('%H:%M:%S')}", flush=True)


def board():
    b = (json.loads(LEGACY_SCOREBOARD.read_text())
         if LEGACY_SCOREBOARD.exists() else {})
    if SCOREBOARD.exists():
        b.update(json.loads(SCOREBOARD.read_text()))
    return b


def wait_for_quiet():
    """Wait until no other suite/chain/pipeline/bench process is using the
    chip (the tunnel serializes clients)."""
    import re

    busy_rx = re.compile(
        r"run_score_suite|chain_r[45]\.py|pipelines/\w+\.py"
        r"|make_\w+_dataset|bench\.py")
    while True:
        out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                             text=True).stdout
        others = [ln for ln in out.splitlines()
                  if busy_rx.search(ln) and "chain_r5b" not in ln]
        if not others:
            return
        log(f"chip busy ({others[0].strip()[:90]}...) — waiting")
        time.sleep(60)


def tpu_up(timeout=120):
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "x = jnp.ones((256, 256));"
             "assert float((x @ x).sum()) > 0; print('ok')"],
            timeout=timeout, capture_output=True, cwd=ROOT)
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_ready():
    wait_for_quiet()
    while not tpu_up():
        log("TPU down — waiting")
        time.sleep(180)


def suite(only):
    cmd = [sys.executable, "-u", "tools/run_score_suite.py", "--only", only]
    r = subprocess.run(cmd, cwd=ROOT)
    log(f"suite --only {only} -> rc={r.returncode}")
    return r.returncode


def gen_dataset(cmd, logname, pattern):
    p = launch_with_retry([sys.executable, "-u"] + cmd, LOGDIR / logname,
                          wedge_timeout=900.0, pattern=pattern)
    rc = p.wait()
    log(f"{cmd[1:]} -> rc={rc}")
    return rc


def commit_stage(stage, before, rc, extra_paths=()):
    after = board()
    changed = [k for k in after
               if after.get(k) != before.get(k) and "error" not in after[k]]
    subprocess.run(["python3", "tools/render_parity.py"], cwd=ROOT)
    subprocess.run(["git", "add", "results/scoreboard.json",
                    "results/scoreboard_r3.json", "PARITY.md", "logs",
                    *extra_paths], cwd=ROOT)
    if changed:
        msg = f"Suite: {', '.join(sorted(changed))} scored ({stage})"
    else:
        msg = f"Suite: {stage} FAILED or landed no rows (rc={rc})"
    r = subprocess.run(["git", "commit", "-q", "-m", msg], cwd=ROOT)
    log(f"commit [{msg}] rc={r.returncode}")
    return after


def clear_ckpts(*subdirs):
    for s in subdirs:
        p = ROOT / "results" / s
        if p.exists():
            shutil.rmtree(p)
            log(f"cleared stale checkpoints: {s}")


def drop_rows(*names):
    for path in (SCOREBOARD, LEGACY_SCOREBOARD):
        if not path.exists():
            continue
        b = json.loads(path.read_text())
        for n in names:
            b.pop(n, None)
        path.write_text(json.dumps(b, indent=1))


def main():
    log("start")

    # --- 0. the orphaned adaptdiffuser suite run (chain_r5's stage 2) ---
    b = board()
    wait_ready()
    SCOREBOARD.write_text(json.dumps(board(), indent=1))
    b = commit_stage("adaptdiffuser hc-medium (orphaned run)", b, 0)

    # --- 1. kitchen retrains on the 1.89-tasks/ep regenerated data ---
    kjobs = ["dd_kitchen_mixed", "dql_kitchen_mixed",
             "dd_kitchen_mixed_tr068", "dd_kitchen_mixed_wcfg2"]
    clear_ckpts("dd_d4rl_kitchen/kitchen-mixed-v0",
                "dql_d4rl_kitchen/kitchen-mixed-v0")
    drop_rows(*kjobs)
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
    wait_ready()
    with open(LOGDIR / "bench_r5.log", "w") as f:
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
