#!/bin/bash
# Chain work after the running score suite finishes (the chip and the
# single-CPU host both punish concurrency — CLAUDE.md): wait for the
# suite PID, generate the antmaze-umaze dataset on the chip (with the
# tunnel wedge-retry recipe: a launch with no log progress in 900s is
# killed and relaunched), then re-run the suite — scoreboard-keyed, so
# completed jobs are skipped and the new antmaze jobs run.
# Usage: chain_after_suite.sh <suite_pid>
set -u
cd /root/repo
SUITE_PID=${1:?usage: chain_after_suite.sh <suite_pid>}

while kill -0 "$SUITE_PID" 2>/dev/null; do sleep 60; done
echo "[chain] suite $SUITE_PID finished at $(date)" >> logs/chain_r3.log

DATA=${CLEANDIFFUSER_DATA:-dev/d4rl}
for ENV in antmaze-umaze-v2 antmaze-umaze-diverse-v2; do
  [ -f "$DATA/$ENV.npz" ] && continue
  GLOG=logs/antmaze_gen_$ENV.log
  for attempt in 1 2 3 4 5; do
    python -u tools/make_antmaze_dataset.py "$ENV" --seed 0 \
      > "$GLOG" 2>&1 &
    GEN=$!
    echo $GEN > /tmp/antmaze_gen.pid
    # wedge probe: no sac/data log line within 900s => kill + relaunch
    for i in $(seq 1 90); do
      sleep 10
      grep -qE "antmaze-sac|\[data" "$GLOG" && break 2
      kill -0 $GEN 2>/dev/null || break
    done
    if grep -qE "antmaze-sac|\[data" "$GLOG"; then break; fi
    echo "[chain] $ENV gen attempt $attempt wedged, retrying" >> logs/chain_r3.log
    kill $GEN 2>/dev/null; wait $GEN 2>/dev/null; sleep 20
  done
  wait $GEN
  echo "[chain] $ENV gen rc=$? at $(date)" >> logs/chain_r3.log
done

python -u tools/run_score_suite.py > logs/suite_r3b.log 2>&1
echo "[chain] suite pass 2 rc=$? at $(date)" >> logs/chain_r3.log
