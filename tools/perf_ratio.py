#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB ratio audit — a DIAGNOSTIC RANKING plus an
outlier-constant gate, not a naive per-query race.

What a per-query ratio at sf0.1 actually measures: Spark pays a fixed
~0.5-1 s per query (plan/codegen/task dispatch, amplified by the bench's
8-way self-contention) that DuckDB does not, so at 60 MB of data the
MEDIAN entry is ~10x its oracle time while the SUITE is ~3x FASTER than
the serial oracle suite on wall clock. Flagging every >2x entry would
report that constant 123 times (measured, round 13). The v5-class signal
the round-12 verdict actually acted on is different: an entry whose cost
is an OUTLIER against the suite's own distribution AND far above its
oracle AND material in absolute seconds — that combination smells like a
plan constant (unrolled expression towers, gate scaffolding), not data.

A query is flagged weak when ALL three hold:
  spark_sec / duckdb_sec > --threshold        (default 2.0)
  spark_sec > --outlier x suite median        (default 3.0 — suite outlier)
  spark_sec - duckdb_sec > --min-gap-sec      (default 2.0 — material)

Exit 1 on any flag or on a catalog mismatch between the two records.
The full ranking prints regardless — it is the round's
where-to-optimize-next list.

--twin flagged=twin (repeatable): a DOCUMENTED exact/sketch pair — the
flagged entry is the deliberate exact form kept for cross-engine gating,
the twin is the production plan (dq3's multi-distinct Expand next to
dq5's no-Expand HLL profile, adjudicated "keep the pair" in rounds 13 and
15). The flag is suppressed ONLY if the named twin itself passes the
gate; a slow twin fails both. The pairing is on the command line, not
buried in the tool, so the waiver is visible in every gate log.

--solo <record>: a bench record captured with SPARK_GRAFT_BENCH_THREADS=1
(and typically SPARK_GRAFT_BENCH_ONLY over the flagged names). The
in-suite per-query seconds include the 8-way self-contention plateau —
a ~2.5 s constant any sub-second query reads while co-running with the
heavy entries (measured round 15: the same 10 names re-flagged every
round at unchanged values). A flagged entry whose SOLO seconds pass the
material-gap test is reported as PLATEAU (contention constant, not plan
pathology) and does not fail the gate; an entry that stays weak SOLO is
the real thing. The solo record is measured evidence, not a waiver: it
must contain the entry, positive, or the flag stands.

Usage: python3 tools/perf_ratio.py <BENCH_LOCAL.json> <duckdb_bench.json>
       [--solo <solo_record.json>]
"""
import argparse
import json
import statistics
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
    ap.add_argument("--outlier", type=float, default=3.0)
    ap.add_argument("--min-gap-sec", type=float, default=2.0)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--solo", default=None,
                    help="1-thread bench record; rescues plateau flags")
    ap.add_argument("--twin", action="append", default=[],
                    help="flagged=twin documented exact/production pair")
    args = ap.parse_args()
    twins = dict(t.split("=", 1) for t in args.twin)

    spark = load_queries(args.spark_record)
    duck = load_queries(args.duckdb_record)
    solo = load_queries(args.solo) if args.solo else {}

    only_spark = sorted(set(spark) - set(duck))
    only_duck = sorted(set(duck) - set(spark))
    for q in only_spark:
        print(f"MISMATCH {q}: in spark record only")
    for q in only_duck:
        print(f"MISMATCH {q}: in duckdb record only")

    common = sorted(set(spark) & set(duck))
    if not common:
        print("MISMATCH: no common queries between the two records")
        return 1
    median = statistics.median(spark[q] for q in common) if common else 0.0
    floor = args.outlier * median

    # A failed query carries a negative sentinel in either record; a
    # negative value yields a negative ratio/gap that silently passes the
    # weak gate and skews the suite sum — reject it loudly instead
    # (mirrors the bench's own phantom-speedup rule).
    bad = [(q, spark[q], duck[q]) for q in common
           if spark[q] <= 0 or duck[q] <= 0]
    for q, s, d in bad:
        print(f"MISMATCH {q}: non-positive seconds (spark {s}, duckdb {d}) "
              f"— failed entry in a record")
    if bad:
        return 1

    rows = []
    for q in common:
        s, d = spark[q], duck[q]
        ratio = s / d if d > 0 else float("inf")
        rows.append((ratio, s, d, q))

    candidates = [(r, s, d, q) for (r, s, d, q) in rows
                  if r > args.threshold and s > floor and s - d > args.min_gap_sec]
    weak, plateau, twinned = [], [], []
    for r, s, d, q in candidates:
        ss = solo.get(q)
        # solo rescue: measured 1-thread seconds replace the in-suite
        # seconds for the SAME material-gap test — only a positive solo
        # timing that passes the gate retires the flag
        if ss is not None and ss > 0 and not (
                ss / d > args.threshold and ss - d > args.min_gap_sec):
            plateau.append((r, s, d, q, ss))
        elif q in twins and twins[q] in spark and twins[q] in duck and not (
                spark[twins[q]] / duck[twins[q]] > args.threshold
                and spark[twins[q]] > floor
                and spark[twins[q]] - duck[twins[q]] > args.min_gap_sec):
            twinned.append((r, s, d, q, twins[q], spark[twins[q]]))
        else:
            weak.append((r, s, d, q))
    weak.sort(key=lambda t: -(t[1] - t[2]))
    for r, s, d, q in weak:
        print(f"WEAK {q}: spark {s:.2f}s vs duckdb {d:.2f}s = {r:.1f}x "
              f"(gap {s - d:.2f}s, suite median {median:.2f}s)")
    for r, s, d, q, ss in sorted(plateau, key=lambda t: -t[1]):
        print(f"PLATEAU {q}: suite {s:.2f}s but solo {ss:.2f}s vs duckdb "
              f"{d:.2f}s — 8-way self-contention constant, not plan cost")
    for r, s, d, q, tw, ts in sorted(twinned, key=lambda t: -t[1]):
        print(f"TWIN {q}: deliberate exact form at {s:.2f}s; production "
              f"twin {tw} passes at {ts:.2f}s")

    print(f"-- top spark costs (the where-to-optimize ranking; "
          f"median {median:.2f}s, outlier floor {floor:.2f}s) --")
    for r, s, d, q in sorted(rows, key=lambda t: -t[1])[:args.top]:
        print(f"   {q}: {s:.2f}s vs {d:.2f}s = {r:.1f}x")
    ts, td = sum(spark[q] for q in common), sum(duck[q] for q in common)
    ratio_str = f"{ts / td:.2f}x" if td > 0 else "n/a (duckdb sum 0)"
    print(f"== suite sum: spark {ts:.1f}s / duckdb {td:.1f}s = {ratio_str} "
          f"(bench wall runs 8-way; compare walls for the headline); "
          f"weak={len(weak)} plateau={len(plateau)} twinned={len(twinned)} "
          f"mismatched={len(only_spark) + len(only_duck)}")
    return 1 if weak or only_spark or only_duck else 0


if __name__ == "__main__":
    sys.exit(main())
