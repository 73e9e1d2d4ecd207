#!/bin/bash
# Round-4 TPU master chain, priority order:
# 1. antmaze rescore (VERDICT item 1)  2. kitchen rows (item 4)
# 3. planner knob sweep quick (item 3b)  4. bf16 analysis (item 5)
# 5. remaining suite jobs (family coverage etc., resumable trains)
# 6. inference-only re-evals of pre-seed-fix rows (cuttable tail)
set -u
cd /root/repo
echo "[chain] start $(date)"

rm -rf results/dql_d4rl_antmaze/antmaze-umaze-v2 \
       results/dql_d4rl_antmaze/antmaze-umaze-diverse-v2 \
       results/idql_d4rl_antmaze/antmaze-umaze-v2
python3 -u tools/run_score_suite.py --force \
  --only dql_antmaze_umaze,idql_antmaze_umaze,dql_antmaze_umaze_div \
  >> logs/chain_r4.log 2>&1
echo "[chain] antmaze done $(date)"

python3 -u tools/run_score_suite.py \
  --only dd_kitchen_mixed,dql_kitchen_mixed >> logs/chain_r4.log 2>&1
echo "[chain] kitchen done $(date)"

python3 -u tools/sweep_planner_knobs.py --quick >> logs/chain_r4.log 2>&1
python3 -u tools/bench_bf16_analysis.py >> logs/bf16_analysis.log 2>&1
echo "[chain] sweep+bf16 done $(date)"

python3 -u tools/run_score_suite.py \
  --only dql_walker2d_medexp,veteran_maze2d_large,veteran_maze2d_large_gi,dql_walker2d_medium_2m,sfbc_hc_medium,qgpo_hc_medium,synther_hc_medium,diffuserlite_hc_medium,adaptdiffuser_hc_medium \
  >> logs/chain_r4.log 2>&1
echo "[chain] suite tail done $(date)"

python3 -u tools/run_score_suite.py --force \
  --only dql_hc_medium,idql_hc_medium,edp_hc_medium,dql_hopper_medium,dql_walker2d_medium,idql_hopper_medium,idql_walker2d_medium,dql_hc_medexp,dql_hc_medreplay,dd_hc_medium,diffuser_hc_medium,veteran_maze2d_umaze,veteran_maze2d_umaze_gi,veteran_maze2d_medium,veteran_maze2d_medium_gi \
  >> logs/chain_r4.log 2>&1
echo "[chain] all done $(date)"
