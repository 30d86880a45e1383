#!/bin/bash
# Uniform full-catalog scale sweep: Verify + 8-way sharded strict gate at
# each scale. Fixtures come from tools/gen_scale.py (10x / 20x key-shifted
# replication of sf0.1). Usage: tools/run_sweep.sh [sf ...]  (default: 1.0 2.0)
set -u
cd "$(dirname "$0")/.."
SCALES=${@:-"1.0 2.0"}
for SF in $SCALES; do
  SRC=/tmp/testdata/sf$SF
  OUT=/tmp/verify_sf$SF
  # stale outputs from a previous run at this scale must never feed the
  # gate: wipe OUT first, and a non-zero Verify rc invalidates the whole
  # scale (skip the gate entirely — same silent-evidence-corruption class
  # as the shard-crash check below).
  rm -rf "$OUT"
  echo "=== sf$SF verify start $(date +%T)"
  t0=$(date +%s)
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SRC $OUT" \
    > /tmp/sweep_verify_$SF.log 2>&1
  rc=$?
  t1=$(date +%s)
  echo "=== sf$SF verify done rc=$rc wall=$((t1-t0))s"
  grep -E "FAILED" /tmp/sweep_verify_$SF.log | head -5
  if [ "$rc" -ne 0 ]; then
    echo "=== sf$SF TOTAL INVALID: verify rc=$rc (gate skipped)"
    continue
  fi
  echo "=== sf$SF gate start $(date +%T)"
  pids=()
  for i in 0 1 2 3 4 5 6 7; do
    CHECK_SHARD=$i/8 python3 tools/check_strict.py $SRC $OUT \
      > /tmp/gate_${SF}_$i.log 2>&1 &
    pids+=($!)
  done
  # a crashed shard must fail the sweep loudly, never silently shrink the
  # TOTAL (its log would carry no summary line and the sum would
  # undercount). A shard that RAN but found failures still emits its
  # "== pass=.. fail=.." summary — that is a valid (red) result, not a
  # crash, and flows into the TOTAL below.
  crashed=0
  for i in 0 1 2 3 4 5 6 7; do
    wait ${pids[$i]}
    if ! grep -q "^== " /tmp/gate_${SF}_$i.log; then
      echo "=== sf$SF SHARD $i CRASHED (no summary; see /tmp/gate_${SF}_$i.log)"
      crashed=1
    fi
  done
  t2=$(date +%s)
  echo "=== sf$SF gate done wall=$((t2-t1))s"
  cat /tmp/gate_${SF}_*.log | grep -E "^(FAIL|ERR)" | head -20
  summaries=$(cat /tmp/gate_${SF}_*.log | grep -c "^== ")
  if [ "$crashed" -ne 0 ] || [ "$summaries" -ne 8 ]; then
    echo "=== sf$SF TOTAL INVALID: crashed=$crashed summary_lines=$summaries/8"
  else
    cat /tmp/gate_${SF}_*.log | grep "^== " \
      | awk -v sf=$SF '{for(i=1;i<=NF;i++){split($i,a,"=");if(a[1]=="pass")p+=a[2];if(a[1]=="fail")f+=a[2];if(a[1]=="rows-only")r+=a[2]}} END{printf "=== sf%s TOTAL pass=%d fail=%d rows-only=%d\n", sf, p, f, r}'
  fi
done
