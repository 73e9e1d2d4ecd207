#!/bin/bash
# Round-4 chain, part C (reprioritized with ~3h of round left; replaces the
# tail of chain_r4b): guaranteed-quick wins first, then the items VERDICT
# weighs heaviest among what can still land.
#   1. DD knob sweeps  — unblocked by the use_pallas_block checkpoint-layout
#      fix (commit 7027eca); closes VERDICT item 3 for DD
#   2. family-coverage rows (VERDICT item 10): sfbc/synther/diffuserlite/
#      adaptdiffuser/qgpo, cheapest-first so partial progress still lands
#   3. maze2d-large + walker2d-medexp (resume)
#   4. honest-error-bar re-evals of the pre-seed-fix rows (inference-only)
#   5. long tail: 2M walker2d, kitchen conditioning variants, gi pins
set -u
cd /root/repo
echo "[chain-c] start $(date)"

python3 -u tools/sweep_planner_knobs.py --quick --only "dd_" \
  >> logs/chain_r4.log 2>&1
echo "[chain-c] dd sweeps done $(date)"

python3 -u tools/run_score_suite.py \
  --only sfbc_hc_medium,synther_hc_medium,diffuserlite_hc_medium \
  >> logs/chain_r4.log 2>&1
echo "[chain-c] families A done $(date)"

python3 -u tools/run_score_suite.py \
  --only adaptdiffuser_hc_medium,qgpo_hc_medium >> logs/chain_r4.log 2>&1
echo "[chain-c] families B done $(date)"

python3 -u tools/run_score_suite.py \
  --only veteran_maze2d_large,veteran_maze2d_large_gi,dql_walker2d_medexp \
  >> logs/chain_r4.log 2>&1
echo "[chain-c] maze2d-large+medexp done $(date)"

python3 -u tools/run_score_suite.py --force \
  --only dql_hc_medium,idql_hc_medium,edp_hc_medium,dql_hopper_medium,dql_walker2d_medium,idql_hopper_medium,idql_walker2d_medium,dql_hc_medexp,dd_hc_medium,diffuser_hc_medium,veteran_maze2d_umaze,veteran_maze2d_umaze_gi,veteran_maze2d_medium,veteran_maze2d_medium_gi \
  >> logs/chain_r4.log 2>&1
echo "[chain-c] re-evals done $(date)"

python3 -u tools/run_score_suite.py \
  --only dql_walker2d_medium_2m,dd_kitchen_mixed_tr068,dd_kitchen_mixed_wcfg2,veteran_maze2d_umaze_gi_pin5,veteran_maze2d_umaze_gi_pin9,veteran_maze2d_medium_gi_pin9,veteran_maze2d_medium_gi_pin15,veteran_maze2d_large_gi_pin15 \
  >> logs/chain_r4.log 2>&1
echo "[chain-c] all done $(date)"
