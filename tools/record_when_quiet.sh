#!/bin/bash
# Record-run gate (SCALE.md R14 §5 / R15 §5 protocol): start the bench
# record only after the host is genuinely quiet — BOTH the 1-minute AND
# the 5-minute load averages below the threshold for two consecutive
# polls. The round-15 first attempt failed its control gates (raw
# 36.9%) precisely because the 1-min average had decayed while the
# 5-min average was still carrying the previous workload's tail:
# early-run samples were inflated, late ones clean, and the drift gate
# (correctly) rejected the record.
#
# Usage: tools/record_when_quiet.sh [threshold] [out_stdout]
set -u
THRESH="${1:-0.6}"
OUT="${2:-/tmp/record_attempt.stdout}"
QUIET=0
while true; do
  L1=$(cut -d' ' -f1 /proc/loadavg)
  L5=$(cut -d' ' -f2 /proc/loadavg)
  OK=$(python3 -c "print(1 if float('$L1')<$THRESH and float('$L5')<$THRESH else 0)")
  echo "$(date +%H:%M:%S) load1=$L1 load5=$L5 ok=$OK quiet_streak=$QUIET"
  if [ "$OK" = "1" ]; then QUIET=$((QUIET+1)); else QUIET=0; fi
  if [ "$QUIET" -ge 2 ]; then break; fi
  sleep 60
done
echo "host quiet — starting record"
cd "$(dirname "$0")/.."
SPARK_GRAFT_BENCH_RECORD=1 \
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
python bench.py > "$OUT" 2>"${OUT%.stdout}.err"
echo "record exit=$? → $OUT"
