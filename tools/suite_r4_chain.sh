#!/bin/bash
# Round-4 suite chain (sequential — the tunneled chip punishes concurrency):
#   1. antmaze rows (VERDICT r3 "missing" #2 — highest leverage)
#   2. rescore the rows whose error bars were illusory under the old
#      overlapping per-episode seeds (VERDICT "weak" #1); training no-op
#      exits via resume=true, so this is an inference-only pass
#   3. remaining locomotion tiers (medium-replay / medium-expert)
#   4. maze2d-large (plain + goal-inpaint)
#   5. one tier-1 row per remaining algorithm family
#   6. walker2d DQL to the full 2M reference recipe
cd "$(dirname "$0")/.." || exit 1
P="python -u tools/run_score_suite.py"
$P --only dql_antmaze_umaze,idql_antmaze_umaze,dql_antmaze_umaze_div
$P --force --only dql_hc_medium,idql_hc_medium,edp_hc_medium,dql_hopper_medium,dql_walker2d_medium,idql_hopper_medium,idql_walker2d_medium,dql_hc_medexp,dd_hc_medium,diffuser_hc_medium
$P --only dql_hc_medreplay,dql_hopper_medreplay,dql_walker2d_medreplay,dql_hopper_medexp,dql_walker2d_medexp
$P --only veteran_maze2d_large,veteran_maze2d_large_gi
$P --only sfbc_hc_medium,synther_hc_medium,adaptdiffuser_hc_medium,diffuserlite_hc_medium,qgpo_hc_medium
$P --only dql_walker2d_medium_2m
echo "[chain] all phases done"
