"""Round-4 chain, part D: self-driving recovery + remaining score rows.

This machine came up with dev/ (datasets) and results/ (checkpoints,
scoreboard) wiped, and the TPU tunnel's COMPUTE path wedged hard (device
enumeration works; any buffer transfer/execute hangs — distinct from the
known 1-in-5 per-client launch wedge). This chain turns that state into
progress unattended:

  1. probe the TPU with a tiny matmul until the compute path recovers
  2. regenerate any missing datasets stage-by-stage (halfcheetah SAC
     on-chip ~15 min; maze2d-large host-only; walker2d SAC on-chip)
  3. run the remaining suite stages cheapest-first, committing the
     scoreboard + PARITY after each stage so every landed row is durable
     (the judged artifact is the committed scoreboard, not results/)

SUPERSEDED by tools/chain_r5.py (round 5), which gates each commit on the
rows actually added. Kept for the round-4 log record.

Remaining jobs = the only VERDICT-r3 items still open: family-coverage
rows (synther/diffuserlite/adaptdiffuser/qgpo on hc-medium), walker2d
medexp/2M, and veteran maze2d-large(+gi).

Usage: nohup python -u tools/chain_r4d.py > logs/chain_r4d.log 2>&1 &
"""

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

from run_score_suite import launch_with_retry  # noqa: E402

LOGDIR = ROOT / "logs"


def log(msg):
    print(f"[chain-d] {msg} | {time.strftime('%H:%M:%S')}", flush=True)


def tpu_up(timeout=120):
    """One compute-path probe in a fresh client process (the wedge is
    per-connection; a hung probe is killed by the timeout)."""
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


def wait_for_tpu(probe_every=180):
    n = 0
    while True:
        n += 1
        if tpu_up():
            log(f"TPU compute path UP (probe {n})")
            return
        log(f"TPU still down (probe {n})")
        time.sleep(probe_every)


def gen_dataset(cmd, logname, pattern):
    p = launch_with_retry([sys.executable, "-u"] + cmd, LOGDIR / logname,
                          wedge_timeout=600.0, pattern=pattern)
    rc = p.wait()
    log(f"{cmd[1:]} -> rc={rc}")
    return rc


def suite(only):
    r = subprocess.run(
        [sys.executable, "-u", "tools/run_score_suite.py", "--only", only],
        cwd=ROOT)
    log(f"suite --only {only} -> rc={r.returncode}")


def commit(stage):
    subprocess.run(["python3", "tools/render_parity.py"], cwd=ROOT)
    subprocess.run(["git", "add", "results/scoreboard_r3.json", "PARITY.md",
                    "logs"], cwd=ROOT)
    r = subprocess.run(["git", "commit", "-q", "-m",
                        f"Suite: {stage} rows landed (chain-d)"], cwd=ROOT)
    log(f"commit [{stage}] rc={r.returncode}")


def dataset_missing(name):
    return not (ROOT / f"dev/d4rl/{name}.npz").exists()


def main():
    log("start")
    # the TPU recovered while pytest was still running: chip work is the
    # critical path, so grab it immediately (hc gen is mostly chip-bound;
    # the 2x host contention with the pytest tail costs less than 15 min
    # of serialization). maze2d-large host-gen moves to AFTER the family
    # stages, overlapping the next suite stage's chip-bound training.
    wait_for_tpu()

    if dataset_missing("halfcheetah-medium-v2"):
        gen_dataset(["tools/make_locomotion_dataset.py", "halfcheetah"],
                    "chain_d_gen_hc.log", r"\[sac:")
    suite("synther_hc_medium,diffuserlite_hc_medium")
    commit("synther + diffuserlite hc-medium")
    suite("adaptdiffuser_hc_medium,qgpo_hc_medium")
    commit("adaptdiffuser + qgpo hc-medium")

    if dataset_missing("maze2d-large-v1"):
        gen_dataset(["tools/make_maze2d_expert.py", "maze2d-large-v1"],
                    "chain_d_maze2d_large.log", r"\[maze2d-expert\]")
    suite("veteran_maze2d_large,veteran_maze2d_large_gi")
    commit("veteran maze2d-large (+gi)")

    if dataset_missing("walker2d-medium-expert-v2"):
        gen_dataset(["tools/make_locomotion_dataset.py", "walker2d"],
                    "chain_d_gen_walker.log", r"\[sac:")
    suite("dql_walker2d_medexp,dql_walker2d_medium_2m")
    commit("walker2d medexp + 2M")

    log("all done")


if __name__ == "__main__":
    main()
