#!/bin/bash
# Uniform full-catalog scale sweep: Verify + 8-way sharded strict gate at
# each scale. Fixtures come from tools/gen_scale.py (10x / 20x key-shifted
# replication of sf0.1) and are generated here when missing, so the
# gen_scale runtime asserts are part of the sweep's own evidence.
#
# Usage: tools/run_sweep.sh [sf ...]      (default: 1.0 2.0)
#   SWEEP_OUT=path.json  machine-readable artifact (default SWEEP_LOCAL.json)
#
# The artifact (round-12 verdict #2) carries, per scale: verify rc + wall,
# gate wall, pass/fail/rows-only totals, shard crash count, fixture row
# counts per table, and the tail of gen_scale's output when this run
# generated the fixture — so a round's sweep claim is diffable JSON, not
# prose.
set -u
cd "$(dirname "$0")/.."
SCALES=${@:-"1.0 2.0"}
SWEEP_OUT=${SWEEP_OUT:-SWEEP_LOCAL.json}
FRAGS=$(mktemp -d /tmp/sweep_frags.XXXXXX)
for SF in $SCALES; do
  SRC=/tmp/testdata/sf$SF
  OUT=/tmp/verify_sf$SF
  GEN="pregenerated"
  if [ ! -d "$SRC" ]; then
    echo "=== sf$SF generating fixture via gen_scale.py"
    python3 tools/gen_scale.py /root/testdata/sf0.1 "$SRC" \
      "$(python3 -c "print(int(round(float('$SF')/0.1)))")" \
      > /tmp/gen_scale_$SF.log 2>&1
    gen_rc=$?
    GEN="rc=$gen_rc $(tail -3 /tmp/gen_scale_$SF.log | tr '\n' ' ')"
    if [ "$gen_rc" -ne 0 ]; then
      echo "=== sf$SF TOTAL INVALID: gen_scale rc=$gen_rc"
      python3 - "$FRAGS/$SF.json" "$SF" "$GEN" <<'EOF'
import json, sys
json.dump({"sf": sys.argv[2], "valid": False, "reason": "gen_scale failed",
           "gen_scale": sys.argv[3]}, open(sys.argv[1], "w"))
EOF
      continue
    fi
  fi
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
    python3 - "$FRAGS/$SF.json" "$SF" "$rc" "$((t1-t0))" "$GEN" <<'EOF'
import json, sys
json.dump({"sf": sys.argv[2], "valid": False, "reason": "verify failed",
           "verify_rc": int(sys.argv[3]), "verify_wall_sec": int(sys.argv[4]),
           "gen_scale": sys.argv[5]}, open(sys.argv[1], "w"))
EOF
    continue
  fi
  echo "=== sf$SF gate start $(date +%T)"
  # Cost-balanced shards (round-13 verdict #5): with the committed
  # per-oracle cost table, check_strict assigns shards by greedy LPT so
  # the expensive oracles (unrolled v4/v5/graph CTE chains) spread across
  # shards instead of stacking the gate wall on one. Each shard also
  # writes its measured per-query seconds — refresh tools/oracle_costs.json
  # from them when the catalog's cost profile shifts.
  COST_FILE=${CHECK_COST_FILE:-tools/oracle_costs.json}
  pids=()
  for i in 0 1 2 3 4 5 6 7; do
    CHECK_SHARD=$i/8 CHECK_COST_FILE=$COST_FILE \
      CHECK_COSTS_OUT=/tmp/gate_costs_${SF}_$i.json \
      python3 tools/check_strict.py $SRC $OUT \
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
  python3 - "$FRAGS/$SF.json" "$SF" "$SRC" "$((t1-t0))" "$((t2-t1))" \
      "$crashed" "$summaries" "$GEN" <<'EOF'
import glob, json, re, sys
frag, sf, src, vwall, gwall, crashed, summaries, gen = sys.argv[1:9]
p = f = r = 0
shard_walls = {}
for log in glob.glob(f"/tmp/gate_{sf}_*.log"):
    for line in open(log):
        m = re.match(r"^== pass=(\d+) fail=(\d+) rows-only=(\d+)(?: wall=([0-9.]+))?", line)
        if m:
            p += int(m.group(1)); f += int(m.group(2)); r += int(m.group(3))
            if m.group(4):
                shard_walls[log.rsplit("_", 1)[1].split(".")[0]] = float(m.group(4))
rows = {}
try:
    import duckdb
    for t in sorted(glob.glob(f"{src}/*.parquet")):
        name = t.split("/")[-1].replace(".parquet", "")
        rows[name] = duckdb.sql(f"SELECT count(*) FROM read_parquet('{t}/**/*.parquet')"
                                if __import__("os").path.isdir(t) else
                                f"SELECT count(*) FROM read_parquet('{t}')").fetchone()[0]
except Exception as e:
    rows = {"_error": str(e)}
valid = crashed == "0" and summaries == "8"
json.dump({"sf": sf, "valid": valid, "pass": p, "fail": f, "rows_only": r,
           "verify_wall_sec": int(vwall), "gate_wall_sec": int(gwall),
           "gate_shard_walls_sec": {k: shard_walls[k] for k in sorted(shard_walls)},
           "shards_crashed": int(crashed), "shard_summaries": int(summaries),
           "gen_scale": gen, "fixture_rows": rows}, open(frag, "w"))
EOF
done
python3 - "$SWEEP_OUT" "$FRAGS" <<'EOF'
import glob, json, sys
out, frags = sys.argv[1], sys.argv[2]
scales = [json.load(open(f)) for f in sorted(glob.glob(f"{frags}/*.json"))]
json.dump({"sweep": scales}, open(out, "w"), indent=1)
print(f"[sweep] wrote {out}: " + ", ".join(
    f"sf{s['sf']} " + (f"pass={s.get('pass')} fail={s.get('fail')}"
                       if s.get("valid") else "INVALID") for s in scales))
EOF
rm -rf "$FRAGS"
