#!/bin/bash
# Round-4 TPU job chain: runs after the main suite (pid in /tmp/suite_r4.pid)
# finishes. Order = leverage: antmaze rescore on the regenerated fixed-task
# datasets first, kitchen rows second, then inference-only re-evals of the
# pre-seed-fix rows so every tier-1 error bar reflects independent episodes.
set -u
cd /root/repo

SUITE_PID=$(cat /tmp/suite_r4.pid 2>/dev/null || echo "")
if [ -n "$SUITE_PID" ]; then
  echo "[chain] waiting for suite pid $SUITE_PID"
  while kill -0 "$SUITE_PID" 2>/dev/null; do sleep 60; done
fi
echo "[chain] suite done at $(date)"

# --- antmaze: datasets were REGENERATED (fixed-task recipe) and the eval
# env changed (pinned d4rl task); old checkpoints trained on the old data
# must not be resumed ---
rm -rf results/dql_d4rl_antmaze/antmaze-umaze-v2 \
       results/dql_d4rl_antmaze/antmaze-umaze-diverse-v2 \
       results/idql_d4rl_antmaze/antmaze-umaze-v2
python3 -u tools/run_score_suite.py --force \
  --only dql_antmaze_umaze,idql_antmaze_umaze,dql_antmaze_umaze_div \
  >> logs/chain_r4.log 2>&1

# --- kitchen rows (dataset from make_kitchen_dataset.py) ---
python3 -u tools/run_score_suite.py \
  --only dd_kitchen_mixed,dql_kitchen_mixed >> logs/chain_r4.log 2>&1

# --- honest error bars: re-eval every pre-seed-fix row (train no-op
# resumes, inference re-runs with non-overlapping per-episode seeds) ---
python3 -u tools/run_score_suite.py --force \
  --only dql_hc_medium,idql_hc_medium,edp_hc_medium,dql_hopper_medium,dql_walker2d_medium,idql_hopper_medium,idql_walker2d_medium,dql_hc_medexp,dql_hc_medreplay,dd_hc_medium,diffuser_hc_medium,veteran_maze2d_umaze,veteran_maze2d_umaze_gi,veteran_maze2d_medium,veteran_maze2d_medium_gi \
  >> logs/chain_r4.log 2>&1

echo "[chain] all done at $(date)"
