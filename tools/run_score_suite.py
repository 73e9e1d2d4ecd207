"""Sequential train+eval score suite on the chip (resume-safe).

Runs a list of (CLI, overrides) jobs ONE AT A TIME — the tunneled chip and
the single host CPU both punish concurrency (CLAUDE.md) — with the wedge
retry recipe of tools/tpu_launch_retry.sh inlined: a launch that produces
no training-log line within --wedge-timeout is killed and retried (the
tunnel wedges ~1-in-5 fresh client connections at first blocking op).

Each job is train -> inference; the per-episode normalized scores printed
by the CLI's inference branch are parsed from the log and appended to
results/scoreboard_r3.json, keyed by job name, so a crashed suite resumes
where it stopped (training itself also resumes from ckpt_latest via the
CLIs' resume=true).

Usage:
    python tools/run_score_suite.py [--only name1,name2] [--list]
"""

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SCOREBOARD = ROOT / "results/scoreboard.json"
LEGACY_SCOREBOARD = ROOT / "results/scoreboard_r3.json"  # pre-r5 name
LOGDIR = ROOT / "logs"

# One entry per score row to produce. `steps` uses each CLI's step-count
# key. Reference recipes: DQL 2M / IDQL 1M+ / EDP 1M gradient steps
# (configs/*/mujoco/mujoco.yaml); planners 1M (cut to 500k — losses are
# flat long before; the scan-window trainer makes the cost linear).
JOBS = [
    # --- halfcheetah-medium: the reference's headline locomotion row ---
    dict(name="dql_hc_medium", cli="pipelines/dql_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps_key="gradient_steps",
         steps=2_000_000),
    dict(name="idql_hc_medium", cli="pipelines/idql_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps_key="gradient_steps",
         steps=1_500_000),
    dict(name="edp_hc_medium", cli="pipelines/edp_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps_key="gradient_steps",
         steps=1_000_000),
    # --- hopper / walker2d medium ---
    dict(name="dql_hopper_medium", cli="pipelines/dql_d4rl_mujoco.py",
         task="hopper-medium-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="dql_walker2d_medium", cli="pipelines/dql_d4rl_mujoco.py",
         task="walker2d-medium-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="idql_hopper_medium", cli="pipelines/idql_d4rl_mujoco.py",
         task="hopper-medium-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="idql_walker2d_medium", cli="pipelines/idql_d4rl_mujoco.py",
         task="walker2d-medium-v2", steps_key="gradient_steps",
         steps=1_000_000),
    # --- medium-expert: the band where diffusion policies shine ---
    dict(name="dql_hc_medexp", cli="pipelines/dql_d4rl_mujoco.py",
         task="halfcheetah-medium-expert-v2", steps_key="gradient_steps",
         steps=1_000_000),
    # --- planners on hc-medium (sequence datasets) ---
    dict(name="dd_hc_medium", cli="pipelines/dd_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps_key="diffusion_gradient_steps",
         steps=500_000, extra_train=["invdyn_gradient_steps=500000"]),
    dict(name="diffuser_hc_medium", cli="pipelines/diffuser_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps_key="diffusion_gradient_steps",
         steps=500_000, extra_train=["classifier_gradient_steps=500000"]),
    # --- veteran on maze2d (the reference's 4th veteran CLI; scripted
    # waypoint expert data from tools/make_maze2d_expert.py) ---
    dict(name="veteran_maze2d_umaze", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-umaze-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_train=["policy_diffusion_gradient_steps=300000",
                      "invdyn_gradient_steps=150000"]),
    # --- veteran maze2d with goal inpainting (extension: Diffuser's maze2d
    # protocol — pin the plan's final xy to the eval goal; reuses the
    # checkpoints trained by veteran_maze2d_umaze, so train no-op exits) ---
    dict(name="veteran_maze2d_umaze_gi", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-umaze-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_train=["policy_diffusion_gradient_steps=300000",
                      "invdyn_gradient_steps=150000"],
         extra_infer=["goal_inpaint=true"]),
    # --- antmaze umaze (sparse reward + max_q_backup path; dataset from
    # tools/make_antmaze_dataset.py — BFS waypoints + SAC navigator) ---
    dict(name="dql_antmaze_umaze", cli="pipelines/dql_d4rl_antmaze.py",
         task="antmaze-umaze-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="idql_antmaze_umaze", cli="pipelines/idql_d4rl_antmaze.py",
         task="antmaze-umaze-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="dql_antmaze_umaze_div", cli="pipelines/dql_d4rl_antmaze.py",
         task="antmaze-umaze-diverse-v2", steps_key="gradient_steps",
         steps=1_000_000),
    # --- remaining d4rl tiers (datasets already in dev/d4rl): replay is
    # the low-quality tier, medium-expert the bimodal tier ---
    dict(name="dql_hc_medreplay", cli="pipelines/dql_d4rl_mujoco.py",
         task="halfcheetah-medium-replay-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="dql_hopper_medreplay", cli="pipelines/dql_d4rl_mujoco.py",
         task="hopper-medium-replay-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="dql_walker2d_medreplay", cli="pipelines/dql_d4rl_mujoco.py",
         task="walker2d-medium-replay-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="dql_hopper_medexp", cli="pipelines/dql_d4rl_mujoco.py",
         task="hopper-medium-expert-v2", steps_key="gradient_steps",
         steps=1_000_000),
    dict(name="dql_walker2d_medexp", cli="pipelines/dql_d4rl_mujoco.py",
         task="walker2d-medium-expert-v2", steps_key="gradient_steps",
         steps=1_000_000),
    # --- veteran maze2d-medium (bigger layout, 600-step horizon; dataset
    # from tools/make_maze2d_expert.py) ---
    dict(name="veteran_maze2d_medium", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-medium-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_train=["policy_diffusion_gradient_steps=300000",
                      "invdyn_gradient_steps=150000"],
         # 600-step episodes: 6 eval episodes x 50 envs = 300 rollouts
         extra_infer=["num_episodes=6"]),
    dict(name="veteran_maze2d_medium_gi", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-medium-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_train=["policy_diffusion_gradient_steps=300000",
                      "invdyn_gradient_steps=150000"],
         extra_infer=["goal_inpaint=true", "num_episodes=6"]),
    dict(name="veteran_maze2d_large", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-large-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_train=["policy_diffusion_gradient_steps=300000",
                      "invdyn_gradient_steps=150000"],
         # 800-step episodes: 4 eval episodes x 50 envs = 200 rollouts
         extra_infer=["num_episodes=4"]),
    dict(name="veteran_maze2d_large_gi", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-large-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_train=["policy_diffusion_gradient_steps=300000",
                      "invdyn_gradient_steps=150000"],
         extra_infer=["goal_inpaint=true", "num_episodes=4"]),
    # --- gi pin-index sweep (inference-only: same task dir => train is a
    # resume no-op on the _gi checkpoints). d4rl maze2d score counts
    # time-to-first-reach; the default pin at H-1 stretches the traverse
    # over 31*stride=465 env steps, so earlier pins demand a time-optimal
    # traverse (veteran.py gi_pin_idx) ---
    dict(name="veteran_maze2d_umaze_gi_pin5", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-umaze-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_infer=["goal_inpaint=true", "gi_pin_idx=5"]),
    dict(name="veteran_maze2d_umaze_gi_pin9", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-umaze-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_infer=["goal_inpaint=true", "gi_pin_idx=9"]),
    dict(name="veteran_maze2d_medium_gi_pin9", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-medium-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_infer=["goal_inpaint=true", "gi_pin_idx=9", "num_episodes=6"]),
    dict(name="veteran_maze2d_medium_gi_pin15", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-medium-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_infer=["goal_inpaint=true", "gi_pin_idx=15", "num_episodes=6"]),
    dict(name="veteran_maze2d_large_gi_pin15", cli="pipelines/veteran_d4rl_maze2d.py",
         task="maze2d-large-v1", steps_key="planner_diffusion_gradient_steps",
         steps=300_000,
         extra_infer=["goal_inpaint=true", "gi_pin_idx=15", "num_episodes=4"]),
    # --- extension: walker2d to the full reference 2M-step DQL recipe
    # (resumes the 1M ckpt of dql_walker2d_medium; 0.810 at 1M sits just
    # under the ~0.82-0.87 band) ---
    dict(name="dql_walker2d_medium_2m", cli="pipelines/dql_d4rl_mujoco.py",
         task="walker2d-medium-v2", steps_key="gradient_steps",
         steps=2_000_000),
    # --- family coverage: one real-data tier-1 row per remaining algorithm
    # family (VERDICT r3 item 10). Multi-phase CLIs run each mode in order
    # (`phases`); `steps` is the primary budget for reporting only. ---
    dict(name="sfbc_hc_medium", cli="pipelines/sfbc_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps=1_000_000,
         phases=[["mode=bc_training", "bc_gradient_steps=1000000"],
                 ["mode=critic_training", "critic_gradient_steps=100000"]]),
    dict(name="qgpo_hc_medium", cli="pipelines/qgpo_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps=1_000_000,
         # bc/collect resume via skip_if: their artifacts are the phase's
         # entire output, and collection alone is ~52 min of chip
         phases=[dict(args=["mode=bc_training", "bc_gradient_steps=1000000"],
                      skip_if="qgpo_d4rl_mujoco/{task}/diffusion_ckpt_latest"),
                 dict(args=["mode=supported_action_collecting"],
                      skip_if="qgpo_d4rl_mujoco/{task}/supported_act.npy"),
                 ["mode=q_training", "q_gradient_steps=1000000"],
                 ["mode=cep_training", "cep_gradient_steps=1000000"]]),
    dict(name="synther_hc_medium", cli="pipelines/synther_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps=1_000_000,
         phases=[["mode=train_diffusion", "diffusion_gradient_steps=100000"],
                 ["mode=transition_generation"],
                 ["mode=train_td3bc", "td3bc_gradient_steps=1000000"]]),
    dict(name="diffuserlite_hc_medium",
         cli="pipelines/diffuserlite_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps=500_000,
         phases=[["mode=training", "diffusion_gradient_steps=500000",
                  "invdyn_gradient_steps=500000"],
                 ["mode=prepare_dataset", "reflow_backbone_ckpt=latest"],
                 ["mode=reflow", "reflow_backbone_ckpt=latest",
                  "reflow_gradient_steps=250000"]],
         extra_infer=["test_model=R2", "diffusion_ckpt=latest"]),
    # --- kitchen (dataset from tools/make_kitchen_dataset.py: scripted
    # IK demonstrator on FrankaKitchen, d4rl-mixed regime) ---
    dict(name="dd_kitchen_mixed", cli="pipelines/dd_d4rl_kitchen.py",
         task="kitchen-mixed-v0", steps_key="diffusion_gradient_steps",
         steps=1_000_000, extra_train=["invdyn_gradient_steps=200000"]),
    dict(name="dql_kitchen_mixed", cli="pipelines/dql_d4rl_kitchen.py",
         task="kitchen-mixed-v0", steps_key="gradient_steps",
         steps=1_000_000),
    # --- DD kitchen conditioning variants (inference-only: same task dir,
    # train resumes as a no-op). Demonstrator-data dense-val support tops
    # out at 0.69 of scale; probe the top of the support and a stronger
    # CFG pull at the default target ---
    dict(name="dd_kitchen_mixed_tr068", cli="pipelines/dd_d4rl_kitchen.py",
         task="kitchen-mixed-v0", steps_key="diffusion_gradient_steps",
         steps=1_000_000, extra_train=["invdyn_gradient_steps=200000"],
         extra_infer=["task.target_return=0.68"]),
    dict(name="dd_kitchen_mixed_wcfg2", cli="pipelines/dd_d4rl_kitchen.py",
         task="kitchen-mixed-v0", steps_key="diffusion_gradient_steps",
         steps=1_000_000, extra_train=["invdyn_gradient_steps=200000"],
         extra_infer=["task.w_cfg=2.0"]),
    dict(name="adaptdiffuser_hc_medium",
         cli="pipelines/adaptdiffuser_d4rl_mujoco.py",
         task="halfcheetah-medium-v2", steps=500_000,
         phases=[["mode=train", "diffusion_gradient_steps=500000",
                  "classifier_gradient_steps=500000"],
                 dict(args=["mode=finetune", "ft_ckpt=latest"],
                      # the self-evolving buffer collection prints
                      # "selected k/50000 ..." before any gradient step
                      pattern=r"selected \d+/|'gradient_steps'")],
         extra_infer=["ckpt=finetuned_latest"]),
]


def dataset_path(task: str) -> Path:
    import os

    return Path(os.environ.get("CLEANDIFFUSER_DATA",
                               ROOT / "dev/d4rl")) / f"{task}.npz"


def _proc_cpu_ticks(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return int(parts[13]) + int(parts[14])
    except (OSError, IndexError, ValueError):
        return None


class _Finished:
    """Popen-compatible result for a child launch_with_retry already ran
    to completion (callers do `p = launch_with_retry(...); rc = p.wait()`)."""

    def __init__(self, rc):
        self.returncode = rc

    def wait(self):
        return self.returncode

    def poll(self):
        return self.returncode


def launch_with_retry(cmd, log_path: Path, wedge_timeout: float,
                      pattern=r"'gradient_steps'|'step'|episode ",
                      max_attempts: int = 5):
    """Run cmd to completion, killing + relaunching on a wedge. Two wedge
    modes, both observed with the axon tunnel:
    - launch wedge: no progress line within wedge_timeout of start
      (~1-in-5 fresh client connections freeze at the first blocking op)
    - mid-run wedge: log size AND host CPU ticks both frozen for
      wedge_timeout (seen at td3bc step 296k, round 4) — training relaunch
      resumes from ckpt_latest, so a kill loses at most a save interval.
    A nonzero exit AFTER progress is a genuine failure and is returned,
    not retried. A nonzero SELF-exit BEFORE progress that repeats with the
    same traceback tail is a deterministic crash (e.g. the qgpo HTTP-413
    lowering failure, round 4), not a wedge: terminal after 2 identical
    exits instead of burning all attempts. Returns an object whose .wait()
    yields the returncode."""
    rx = re.compile(pattern)
    log_path.write_text("")  # fresh log per JOB, append per ATTEMPT
    prev_crash_sig = None
    for attempt in range(1, max_attempts + 1):
        # append mode: keep every wedged attempt's output (the only
        # evidence for diagnosing recurring wedges); mark the boundary
        with open(log_path, "a") as f:
            f.write(f"\n[suite] ---- attempt {attempt} ----\n")
        attempt_rx_off = log_path.stat().st_size  # only scan THIS attempt
        log_f = open(log_path, "a")
        p = subprocess.Popen(cmd, stdout=log_f, stderr=subprocess.STDOUT,
                             cwd=ROOT)
        log_f.close()  # child holds its own fd; don't leak ours

        def seen():
            with open(log_path, errors="ignore") as f:
                f.seek(attempt_rx_off)
                return rx.search(f.read())

        t0 = time.time()
        started = False
        last_size, last_cpu, last_move = -1, -1, time.time()
        while True:
            time.sleep(10)
            rc = p.poll()
            if rc is not None:
                if rc == 0:
                    if not seen():
                        # clean exit without a progress line: e.g.
                        # resume=true on a fully-trained run prints only
                        # the resume banner — completion, not a wedge
                        print(f"[suite] attempt {attempt}: clean no-op "
                              "exit rc=0", flush=True)
                    return _Finished(0)
                if seen():
                    return _Finished(rc)  # genuine post-progress failure
                # pre-progress self-exit: wedge kills never reach here (the
                # wedge branches `break` with the process still alive), so
                # this is a real crash — fingerprint its traceback tail
                with open(log_path, errors="ignore") as f:
                    f.seek(attempt_rx_off)
                    tail = [ln for ln in f.read().splitlines() if ln.strip()]
                sig = (rc, tail[-1] if tail else "")
                if sig == prev_crash_sig:
                    print(f"[suite] attempt {attempt}: identical crash "
                          f"(rc={rc}, {sig[1][:120]!r}) — terminal, not a "
                          "wedge", flush=True)
                    return _Finished(rc)
                prev_crash_sig = sig
                break  # died before first progress line -> retry once more
            if not started and seen():
                started = True
                print(f"[suite] attempt {attempt}: running (pid {p.pid})",
                      flush=True)
            if not started and time.time() - t0 >= wedge_timeout:
                print(f"[suite] attempt {attempt}: launch wedge, killing "
                      f"{p.pid}", flush=True)
                break
            size = log_path.stat().st_size
            cpu = _proc_cpu_ticks(p.pid)
            if size != last_size:
                last_size, last_cpu, last_move = size, cpu, time.time()
            elif started and time.time() - last_move >= wedge_timeout:
                # log frozen past the timeout. A third wedge mode (round 5,
                # dd_kitchen @432k): the client spins on the dead tunnel
                # socket in KERNEL time, so cpu ticks creep (~0.6/s) and a
                # strict log+CPU freeze check never fires. Declare a wedge
                # whenever the tick RATE over the frozen window is below a
                # busy-host threshold (5 ticks/s = 5% core); a genuinely
                # working host (mujoco eval, compile) burns far more.
                secs = max(time.time() - last_move, 1.0)
                rate = ((cpu - last_cpu) / secs
                        if None not in (cpu, last_cpu) else 0.0)
                if rate < 5.0:
                    print(f"[suite] attempt {attempt}: MID-RUN wedge (log "
                          f"frozen {wedge_timeout:.0f}s, cpu {rate:.1f} "
                          f"ticks/s), killing {p.pid}", flush=True)
                    break
                last_move = time.time()  # host busy: not a wedge, rearm
                last_cpu = cpu
        if p.poll() is None:
            p.kill()
        p.wait()
        time.sleep(15)
    raise RuntimeError(f"{cmd}: no progress after {max_attempts} attempts")


def parse_scores(log_text: str):
    """Per-episode normalized means printed by the CLIs' inference mode.
    Only the LAST attempt's section counts — a mid-run-wedged earlier
    attempt may have printed a partial episode list before freezing.

    Prefer the CLIs' final full-precision "[means] [stds]" array line over
    the 3-decimal "episode N:" prints: low-variance tasks (halfcheetah)
    can collide at 3 decimals into an apparent identical-seed triplet
    (idql hc-medium, round 5: 0.45805/0.45797/0.45799 all print 0.458)."""
    last = log_text.split("[suite] ---- attempt")[-1]
    eps = [float(m) for m in re.findall(r"episode \d+: ([-\d.]+)", last)]
    full = re.findall(r"(?m)^\[([-\d.eE+\s]+)\]\s+\[([-\d.eE+\s]+)\]\s*$",
                      last)
    if full:
        vals = [float(v) for v in full[-1][0].split()]
        if vals and (not eps or len(vals) == len(eps)):
            return vals
    return eps


def run_job(job, args):
    name = job["name"]
    dp = dataset_path(job["task"])
    if not dp.exists():
        # the CLIs silently fall back to SYNTHETIC data — a score measured
        # on that would be garbage presented as real; refuse instead
        print(f"[suite] {name}: dataset {dp} missing — skip (generate with "
              "tools/make_locomotion_dataset.py / make_maze2d_expert.py)",
              flush=True)
        return dict(name=name, error=f"dataset missing: {dp}")
    train_log = LOGDIR / f"suite_{name}_train.log"
    infer_log = LOGDIR / f"suite_{name}_infer.log"
    base = [sys.executable, "-u", job["cli"], f"task={job['task']}"]

    t0 = time.time()
    if "phases" in job:
        # multi-phase CLIs (sfbc/qgpo/synther/diffuserlite/adaptdiffuser):
        # run each mode sequentially; a phase may be a plain override list
        # or a dict(args=[...], pattern=...) for a custom liveness regex
        for pi, phase in enumerate(job["phases"]):
            ph_args = phase["args"] if isinstance(phase, dict) else phase
            skip_if = (phase.get("skip_if") if isinstance(phase, dict)
                       else None)
            if skip_if and (ROOT / "results"
                            / skip_if.format(task=job["task"])).exists():
                print(f"[suite] {name}: phase {pi} skipped — "
                      f"{skip_if.format(task=job['task'])} exists",
                      flush=True)
                continue
            ph_pat = (phase.get("pattern") if isinstance(phase, dict)
                      else None) or r"'gradient_steps'|'step'|episode "
            ph_log = LOGDIR / f"suite_{name}_p{pi}_train.log"
            p = launch_with_retry(base + list(ph_args), ph_log,
                                  args.wedge_timeout, pattern=ph_pat)
            rc = p.wait()
            if rc != 0:
                print(f"[suite] {name}: PHASE {pi} FAILED rc={rc} — see "
                      f"{ph_log}", flush=True)
                return dict(name=name, error=f"phase{pi} rc={rc}")
    else:
        train_cmd = base + [
            "mode=train", f"{job['steps_key']}={job['steps']}", "resume=true",
        ] + job.get("extra_train", [])
        p = launch_with_retry(train_cmd, train_log, args.wedge_timeout)
        rc = p.wait()
        if rc != 0:
            print(f"[suite] {name}: TRAIN FAILED rc={rc} — see {train_log}",
                  flush=True)
            return dict(name=name, error=f"train rc={rc}")
    t_train = time.time() - t0

    t0 = time.time()
    # '+ckpt': planner CLIs use per-model ckpt keys instead of `ckpt`
    # (plain overrides warn on unknown keys — utils/config.py)
    infer_cmd = base + ["mode=inference", "+ckpt=latest"] + job.get(
        "extra_infer", [])
    p = launch_with_retry(infer_cmd, infer_log, args.wedge_timeout,
                          pattern=r"episode \d+:")
    rc = p.wait()
    scores = parse_scores(infer_log.read_text(errors="ignore"))
    if rc != 0 or not scores:
        print(f"[suite] {name}: INFER FAILED rc={rc} — see {infer_log}",
              flush=True)
        return dict(name=name, error=f"infer rc={rc}")
    import numpy as np

    return dict(name=name, task=job["task"], steps=job["steps"],
                score_mean=round(float(np.mean(scores)), 4),
                score_std=round(float(np.std(scores)), 4),
                episodes=scores, train_s=round(t_train, 1),
                infer_s=round(time.time() - t0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated job names to run")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--wedge-timeout", type=float, default=900.0)
    ap.add_argument("--force", action="store_true",
                    help="re-run jobs already on the scoreboard")
    args = ap.parse_args()

    if args.list:
        for j in JOBS:
            print(j["name"])
        return

    only = set(args.only.split(",")) if args.only else None
    SCOREBOARD.parent.mkdir(parents=True, exist_ok=True)
    # r5 migration: merge legacy-named rows under the canonical board (a
    # pre-rename suite process may still be appending to the old file);
    # canonical rows win
    board = (json.loads(LEGACY_SCOREBOARD.read_text())
             if LEGACY_SCOREBOARD.exists() else {})
    if SCOREBOARD.exists():
        board.update(json.loads(SCOREBOARD.read_text()))

    for job in JOBS:
        name = job["name"]
        if only is not None and name not in only:
            continue
        if not args.force and name in board and "error" not in board[name]:
            print(f"[suite] {name}: already scored "
                  f"({board[name]['score_mean']}) — skip", flush=True)
            continue
        print(f"[suite] === {name} ===", flush=True)
        board[name] = run_job(job, args)
        SCOREBOARD.write_text(json.dumps(board, indent=1))
        print(f"[suite] {name}: {board[name]}", flush=True)
        # a finished row must never miss the public table again
        # (round 4: SynthER scored 0.480 but PARITY was never re-rendered)
        subprocess.run([sys.executable, str(ROOT / "tools/render_parity.py")],
                       cwd=ROOT)

    print("[suite] done:", json.dumps(
        {k: v.get("score_mean", v.get("error")) for k, v in board.items()}),
        flush=True)


if __name__ == "__main__":
    main()
