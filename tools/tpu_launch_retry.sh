#!/bin/bash
# Launch a TPU training CLI with wedge-retry: the tunneled chip wedges
# ~1-in-5 fresh client connections on their first blocking op (probes
# 4/5 ok, 5th hangs — see CLAUDE.md "tunnel wedge"). Kills and retries
# until the run's log shows a "'step'" line (first training window).
# Usage: tpu_launch_retry.sh LOGFILE CMD [ARGS...]
LOG=$1; shift
for attempt in 1 2 3 4 5 6; do
  "$@" > $LOG 2>&1 &
  PID=$!
  echo $PID > ${LOG}.pid
  for i in $(seq 1 ${RETRY_PROBES:-60}); do
    sleep 10
    if grep -qE "${RETRY_PATTERN:-'step'|'gradient_steps'}" $LOG 2>/dev/null; then echo "attempt $attempt: RUNNING pid $PID"; exit 0; fi
    if ! kill -0 $PID 2>/dev/null; then break; fi
  done
  if grep -qE "${RETRY_PATTERN:-'step'|'gradient_steps'}" $LOG 2>/dev/null; then echo "attempt $attempt: RUNNING pid $PID"; exit 0; fi
  echo "attempt $attempt: wedged/dead, killing $PID"
  kill $PID 2>/dev/null; sleep 20
done
echo FAILED; exit 1
