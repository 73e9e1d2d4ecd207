#!/bin/bash
# Round-4 TPU chain, stage 2: perf evidence. Runs after chain_r4.sh
# (pid in /tmp/chain_r4.pid): planner knob sweep over the trained
# hc-medium checkpoints, the bf16 matmul-precision analysis, and a full
# bench.py pass (now covering Pallas-on DD configs + Picard batch-1/4
# regimes).
set -u
cd /root/repo

CH=$(cat /tmp/chain_r4.pid 2>/dev/null || echo "")
if [ -n "$CH" ]; then
  echo "[chain2] waiting for chain pid $CH"
  while kill -0 "$CH" 2>/dev/null; do sleep 60; done
fi
echo "[chain2] starting at $(date)"

python3 -u tools/sweep_planner_knobs.py >> logs/chain_r4b.log 2>&1
python3 -u tools/bench_bf16_analysis.py >> logs/bf16_analysis.log 2>&1
python3 -u bench.py > logs/bench_r4_preview.json 2> logs/bench_r4_preview.err

echo "[chain2] all done at $(date)"
