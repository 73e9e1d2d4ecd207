"""Inference-only planner knob sweep (VERDICT r3 item 3b).

Diffuser hc-medium sits at 0.388 vs the 0.42-0.46 band and DD at 0.421 vs
0.44-0.49, while tools/dataset_quality.py measures the hc-medium dataset
bias at -0.006 — the data matches d4rl, so the gap is knob-level. The
reference ships these as per-task hyperparameters (ref:configs/diffuser/
mujoco/mujoco.yaml w_cg/n_candidates, ref:configs/dd/mujoco/task/*.yaml
w_cfg/target_return); this sweeps them over the ALREADY-TRAINED hc-medium
checkpoints (train no-op) and writes results/sweeps.json.

Each point = one CLI inference run (50 envs x 3 episodes, the reference
protocol). Run on the chip, serially.

Usage: python tools/sweep_planner_knobs.py [--quick]
"""

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

SWEEPS = [
    # (tag, cli, task, [extra overrides])
    ("diffuser_wcg0.03", "pipelines/diffuser_d4rl_mujoco.py",
     ["task.w_cg=0.03"]),
    ("diffuser_wcg0.3", "pipelines/diffuser_d4rl_mujoco.py",
     ["task.w_cg=0.3"]),
    ("diffuser_wcg1.0", "pipelines/diffuser_d4rl_mujoco.py",
     ["task.w_cg=1.0"]),
    ("diffuser_wcg0.1_cand128", "pipelines/diffuser_d4rl_mujoco.py",
     ["task.w_cg=0.1", "num_candidates=128"]),
    ("diffuser_wcg0.3_temp1.0", "pipelines/diffuser_d4rl_mujoco.py",
     ["task.w_cg=0.3", "temperature=1.0"]),
    ("dd_wcfg2.0", "pipelines/dd_d4rl_mujoco.py", ["task.w_cfg=2.0"]),
    ("dd_wcfg3.0", "pipelines/dd_d4rl_mujoco.py", ["task.w_cfg=3.0"]),
    ("dd_tr0.95_wcfg2.0", "pipelines/dd_d4rl_mujoco.py",
     ["task.target_return=0.95", "task.w_cfg=2.0"]),
    ("dd_tr1.1_wcfg2.0", "pipelines/dd_d4rl_mujoco.py",
     ["task.target_return=1.1", "task.w_cfg=2.0"]),
    ("dd_temp1.0_wcfg2.0", "pipelines/dd_d4rl_mujoco.py",
     ["temperature=1.0", "task.w_cfg=2.0"]),
]


def run_with_wedge_retry(cmd, log, attempts=3, wedge_timeout=480.0):
    """Launch `cmd`, killing and relaunching if it wedges (no new log output
    AND no CPU progress for `wedge_timeout` seconds — the known tunnel wedge
    at jit-lowering freezes before the first log line; kill-and-relaunch
    clears it). Same policy as run_score_suite.launch_with_retry."""
    for attempt in range(1, attempts + 1):
        log_f = open(log, "a" if attempt > 1 else "w")
        p = subprocess.Popen(cmd, stdout=log_f, stderr=subprocess.STDOUT,
                             cwd=ROOT)
        log_f.close()
        last_size, last_cpu, last_change = -1, -1.0, time.time()
        while True:
            rc = p.poll()
            if rc is not None:
                if rc == 0 or attempt == attempts:
                    return rc
                print(f"[sweep] attempt {attempt}: rc={rc}, retrying",
                      flush=True)
                break
            size = log.stat().st_size if log.exists() else 0
            try:
                with open(f"/proc/{p.pid}/stat") as f:
                    parts = f.read().split()
                cpu = int(parts[13]) + int(parts[14])
            except (FileNotFoundError, IndexError, ValueError):
                cpu = -1
            if size != last_size or cpu != last_cpu:
                last_size, last_cpu, last_change = size, cpu, time.time()
            elif time.time() - last_change > wedge_timeout:
                print(f"[sweep] attempt {attempt}: wedged (no output/CPU "
                      f"{wedge_timeout:.0f}s), killing {p.pid}", flush=True)
                p.kill()
                p.wait()
                if attempt == attempts:
                    return -9
                break
            time.sleep(10.0)
    return -9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 episode per point instead of 3")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    out_path = ROOT / "results/sweeps.json"
    results = (json.loads(out_path.read_text())
               if out_path.exists() else {})
    for tag, cli, ovs in SWEEPS:
        if args.only and not re.search(args.only, tag):
            continue
        if tag in results and "error" not in results[tag]:
            print(f"[sweep] {tag}: done ({results[tag]['mean']}) — skip",
                  flush=True)
            continue
        # '+'-prefixed: these protocol keys exist only in some CLIs' configs
        # (plain overrides warn on unknown keys — utils/config.py)
        cmd = [sys.executable, "-u", cli, "task=halfcheetah-medium-v2",
               "mode=inference", "+ckpt=latest",
               "+diffusion_ckpt=latest", "+classifier_ckpt=latest",
               "+invdyn_ckpt=latest"] + ovs
        if args.quick:
            cmd.append("num_episodes=1")
        log = ROOT / f"logs/sweep_{tag}.log"
        t0 = time.time()
        rc = run_with_wedge_retry(cmd, log)
        scores = [float(m) for m in re.findall(
            r"episode \d+: ([-\d.]+)", log.read_text(errors="ignore"))]
        if rc != 0 or not scores:
            results[tag] = dict(error=f"rc={rc}")
        else:
            import numpy as np

            results[tag] = dict(mean=round(float(np.mean(scores)), 4),
                                episodes=scores,
                                overrides=ovs,
                                secs=round(time.time() - t0, 1))
        out_path.write_text(json.dumps(results, indent=1))
        print(f"[sweep] {tag}: {results[tag]}", flush=True)


if __name__ == "__main__":
    main()
