#!/bin/bash
# Retry wrapper for chip jobs: probe the axon tunnel with a tiny program,
# then run the job; on probe failure or job error, back off and retry.
#   scratch/chip_run.sh <logfile> <timeout_s> <cmd...>
LOG="$1"; TMO="$2"; shift 2
for attempt in 1 2 3 4 5 6; do
  echo "== attempt $attempt $(date +%H:%M:%S)" >> "$LOG"
  timeout 120 python -c "
import jax
x = jax.jit(lambda a: a + 1)(jax.numpy.ones((8, 8)))
assert float(x.sum()) == 128.0
print('probe ok')" >> "$LOG" 2>&1
  if [ $? -ne 0 ]; then
    echo "probe failed; sleeping 180s" >> "$LOG"
    sleep 180
    continue
  fi
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "job rc=$rc" >> "$LOG"
  [ $rc -eq 0 ] && exit 0
  sleep 120
done
echo "giving up" >> "$LOG"
exit 1
