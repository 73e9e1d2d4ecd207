"""Round-5 chain: finish the suite + data-quality re-scores (VERDICT r4).

Stages, in value order (each commits ONLY what actually landed — the
round-4 chain committed "rows landed" messages for stages that landed
nothing, ADVICE r4 #1):

  1. qgpo_hc_medium        — q/cep fused trainers fixed (HTTP-413 closure
                             constants -> explicit jit args); bc+collect
                             checkpoints survive in results/
  2. adaptdiffuser_hc_medium
  3. veteran_maze2d_large_gi_pin15 — inference-only on the fresh large ckpts
  4. walker2d regen (stochastic-gated generator) + forced re-scores of all
     five walker2d rows (the old rows measured 0.468-quality "medium" data
     against bands calibrated at 0.620)
  5. hopper --replay-only regen + dql_hopper_medreplay re-score
  6. halfcheetah --replay-only regen + dql_hc_medreplay re-score
  7. dql_hc_medium / idql_hc_medium re-scores under fixed eval seeding
     (the round-3 rows have identical-episode triplets; ckpts are gone)

Every stage: run -> diff the scoreboard -> commit with the real row list
(or a FAILED note). Resume-safe: a finished row is skipped by the suite
unless the stage carries force=True, and forced stages clear their stale
checkpoint dirs first so resume=true cannot no-op on old-data policies.

Usage: nohup python -u tools/chain_r5.py > logs/chain_r5.log 2>&1 &
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
    print(f"[chain-r5] {msg} | {time.strftime('%H:%M:%S')}", flush=True)


def board():
    b = (json.loads(LEGACY_SCOREBOARD.read_text())
         if LEGACY_SCOREBOARD.exists() else {})
    if SCOREBOARD.exists():
        b.update(json.loads(SCOREBOARD.read_text()))
    return b


def wait_for_quiet():
    """Wait until no other suite/chain/pipeline process is using the chip
    (the tunnel serializes clients: launching alongside one would hang at
    the first dispatch and look like a wedge)."""
    import re

    busy_rx = re.compile(
        r"run_score_suite|chain_r4|pipelines/\w+\.py|make_\w+_dataset")
    while True:
        out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                             text=True).stdout
        others = [ln for ln in out.splitlines()
                  if busy_rx.search(ln) and "chain_r5" not in ln]
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


def suite(only, force=False):
    cmd = [sys.executable, "-u", "tools/run_score_suite.py", "--only", only]
    if force:
        cmd.append("--force")
    r = subprocess.run(cmd, cwd=ROOT)
    log(f"suite --only {only}{' --force' if force else ''} "
        f"-> rc={r.returncode}")
    return r.returncode


def gen_dataset(cmd, logname, pattern):
    p = launch_with_retry([sys.executable, "-u"] + cmd, LOGDIR / logname,
                          wedge_timeout=900.0, pattern=pattern)
    rc = p.wait()
    log(f"{cmd[1:]} -> rc={rc}")
    return rc


def commit_stage(stage, before, rc):
    """Commit scoreboard+PARITY+logs with a message naming the rows that
    actually changed; mark the stage FAILED if nothing landed."""
    after = board()
    changed = [k for k in after
               if after.get(k) != before.get(k) and "error" not in after[k]]
    subprocess.run(["python3", "tools/render_parity.py"], cwd=ROOT)
    subprocess.run(["git", "add", "results/scoreboard.json",
                    "results/scoreboard_r3.json", "PARITY.md", "logs"],
                   cwd=ROOT)
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
    """Remove rows from BOTH board files so forced re-runs re-score even
    if the chain is interrupted between clear and re-run."""
    for path in (SCOREBOARD, LEGACY_SCOREBOARD):
        if not path.exists():
            continue
        b = json.loads(path.read_text())
        for n in names:
            b.pop(n, None)
        path.write_text(json.dumps(b, indent=1))


def main():
    log("start")
    wait_for_quiet()
    while not tpu_up():
        log("TPU down — waiting")
        time.sleep(180)
    # canonicalize the board before the first stage
    SCOREBOARD.write_text(json.dumps(board(), indent=1))

    b = board()

    # --- 1. qgpo (bc+collect ckpts survive; q/cep now compile) ---
    rc = suite("qgpo_hc_medium")
    b = commit_stage("qgpo hc-medium", b, rc)

    # --- 2. adaptdiffuser ---
    rc = suite("adaptdiffuser_hc_medium")
    b = commit_stage("adaptdiffuser hc-medium", b, rc)

    # --- 3. maze2d-large gi pin sweep (inference-only) ---
    rc = suite("veteran_maze2d_large_gi_pin15")
    b = commit_stage("maze2d-large gi pin15", b, rc)

    # --- 4. walker2d on stochastic-gated data ---
    rc = gen_dataset(["tools/make_locomotion_dataset.py", "walker2d"],
                     "chain_r5_gen_walker.log", r"\[sac:")
    if rc == 0:
        wjobs = ["dql_walker2d_medium", "idql_walker2d_medium",
                 "dql_walker2d_medreplay", "dql_walker2d_medexp",
                 "dql_walker2d_medium_2m"]
        clear_ckpts("dql_d4rl_mujoco/walker2d-medium-v2",
                    "dql_d4rl_mujoco/walker2d-medium-replay-v2",
                    "dql_d4rl_mujoco/walker2d-medium-expert-v2",
                    "idql_d4rl_mujoco/walker2d-medium-v2")
        drop_rows(*wjobs)
        rc = suite(",".join(wjobs))
        b = commit_stage("walker2d re-scores on 0.62-gated data", b, rc)
    else:
        log("walker2d regen FAILED — keeping old rows")

    # --- 5. hopper medium-replay on full-curve ring ---
    rc = gen_dataset(["tools/make_locomotion_dataset.py", "hopper",
                      "--replay-only"],
                     "chain_r5_gen_hopper_replay.log", r"\[sac:")
    if rc == 0:
        clear_ckpts("dql_d4rl_mujoco/hopper-medium-replay-v2")
        drop_rows("dql_hopper_medreplay")
        rc = suite("dql_hopper_medreplay")
        b = commit_stage("hopper-medium-replay re-score", b, rc)

    # --- 6. halfcheetah medium-replay ---
    rc = gen_dataset(["tools/make_locomotion_dataset.py", "halfcheetah",
                      "--replay-only"],
                     "chain_r5_gen_hc_replay.log", r"\[sac:")
    if rc == 0:
        clear_ckpts("dql_d4rl_mujoco/halfcheetah-medium-replay-v2")
        drop_rows("dql_hc_medreplay")
        rc = suite("dql_hc_medreplay")
        b = commit_stage("hc-medium-replay re-score", b, rc)

    # --- 7. pre-fix seed rows (identical-episode triplets) ---
    clear_ckpts("dql_d4rl_mujoco/halfcheetah-medium-v2",
                "idql_d4rl_mujoco/halfcheetah-medium-v2")
    drop_rows("dql_hc_medium", "idql_hc_medium")
    rc = suite("dql_hc_medium,idql_hc_medium")
    b = commit_stage("hc-medium seed re-scores", b, rc)

    log("all done")


if __name__ == "__main__":
    main()
