#!/bin/bash
# Round-4 chain, part B (restarted after the kitchen reward-densify fix):
# 1. kitchen rows on DENSIFIED rewards (VERDICT item 4) — both jobs retrain
# 2. planner knob sweep quick (item 3b)  3. bf16 analysis (item 5)
# 4. remaining suite jobs (family coverage etc., resumable trains)
# 5. inference-only re-evals of pre-seed-fix rows (cuttable tail)
set -u
cd /root/repo
echo "[chain-b] start $(date)"

# retrain from scratch: resume=true would no-op on the stale (sparse-reward
# trained / OOD-conditioned) checkpoints
rm -rf results/dd_d4rl_kitchen results/dql_d4rl_kitchen
python3 -u tools/run_score_suite.py --force \
  --only dql_kitchen_mixed,dd_kitchen_mixed >> logs/chain_r4.log 2>&1
echo "[chain-b] kitchen done $(date)"

python3 -u tools/sweep_planner_knobs.py --quick >> logs/chain_r4.log 2>&1
python3 -u tools/bench_bf16_analysis.py >> logs/bf16_analysis.log 2>&1
echo "[chain-b] sweep+bf16 done $(date)"

python3 -u tools/run_score_suite.py \
  --only dql_walker2d_medexp,veteran_maze2d_large,veteran_maze2d_large_gi,dql_walker2d_medium_2m,sfbc_hc_medium,qgpo_hc_medium,synther_hc_medium,diffuserlite_hc_medium,adaptdiffuser_hc_medium \
  >> logs/chain_r4.log 2>&1
echo "[chain-b] suite tail done $(date)"

python3 -u tools/run_score_suite.py --force \
  --only dql_hc_medium,idql_hc_medium,edp_hc_medium,dql_hopper_medium,dql_walker2d_medium,idql_hopper_medium,idql_walker2d_medium,dql_hc_medexp,dql_hc_medreplay,dd_hc_medium,diffuser_hc_medium,veteran_maze2d_umaze,veteran_maze2d_umaze_gi,veteran_maze2d_medium,veteran_maze2d_medium_gi \
  >> logs/chain_r4.log 2>&1
echo "[chain-b] all done $(date)"

python3 -u tools/run_score_suite.py \
  --only dd_kitchen_mixed_tr068,dd_kitchen_mixed_wcfg2,veteran_maze2d_umaze_gi_pin5,veteran_maze2d_umaze_gi_pin9,veteran_maze2d_medium_gi_pin9,veteran_maze2d_medium_gi_pin15,veteran_maze2d_large_gi_pin15 \
  >> logs/chain_r4.log 2>&1
echo "[chain-b] gi pin sweep done $(date)"
