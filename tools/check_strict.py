#!/usr/bin/env python3
"""Strict driver-replica correctness gate.

Unlike tools/check.py (which normalizes Decimal vs float before comparing),
this mimics the driver's pandas-based compare: Spark output loaded with
pandas.read_parquet (pyarrow: DECIMAL -> object(Decimal)), oracle loaded
with duckdb .fetchdf() (DECIMAL -> float64, HUGEINT -> float64/object).
Cells are compared via their string rendering WITHOUT cross-type
normalization, and a column whose Python value types differ between the
two sides is a failure even when the strings happen to agree. Array/list
cells are a failure outright (the driver's sort crashes on ndarray).

Usage: python3 tools/check_strict.py <sfDir> <verifyOutDir>

Env knobs (all optional):
  CHECK_THREADS=k        cap DuckDB threads (sharded runs)
  CHECK_SHARD=i/N        run shard i of N only (0-based)
  CHECK_COST_FILE=path   per-query cost table (JSON name->seconds): shards
                         are then assigned by greedy LPT over the costs
                         (deterministic — every shard process computes the
                         same assignment) instead of round-robin, so one
                         expensive oracle (the unrolled v4/v5/graph CTE
                         chains) can't make one shard the gate's wall.
                         Unknown names get the table's median cost.
  CHECK_COSTS_OUT=path   write this run's measured per-query seconds
                         (oracle execution + compare) as JSON — feed it
                         back as the next CHECK_COST_FILE.
"""
import sys, json, glob, os, time
import math
import numpy as np
import pandas as pd
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    """Strict string rendering: no Decimal<->float bridging. Dates and
    timestamps DO get a common rendering (midnight-padded isoformat) —
    round-1 driver results show date-vs-timestamp is tolerated (a7, q3
    hash-matched with DATE on one side, datetime64 on the other)."""
    import datetime
    if v is None:
        return "\x00NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\x00NULL"
    if v is pd.NaT:
        return "\x00NULL"
    if isinstance(v, np.floating):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.integer, int, bool, np.bool_)):
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return str(v)
    if isinstance(v, datetime.date):
        return f"{v} 00:00:00"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError(f"array cell: {type(v).__name__}")
    return str(v)


def kind(v):
    """Type bucket for dtype-mismatch detection (int width is fine)."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.floating, float)):
        return "float"
    if isinstance(v, (np.bool_, bool)):
        return "bool"
    if isinstance(v, (np.integer, int)):
        return "int"
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return "datelike"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "array"
    return type(v).__name__


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows, kinds = [], [set() for _ in cols]
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(cell(v) for v in tup))
        for i, v in enumerate(tup):
            k = kind(v)
            if k is not None:
                kinds[i].add(k)
    return cols, sorted(rows), kinds


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # CHECK_THREADS caps DuckDB's per-connection threads so sharded runs
    # (CHECK_SHARD=i/N below) don't oversubscribe the box.
    if os.environ.get("CHECK_THREADS"):
        con.execute(f"PRAGMA threads={int(os.environ['CHECK_THREADS'])}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # CHECK_SHARD=i/N: run shard i only — a wall-clock wrapper, not a
    # semantics change (every query still runs the identical compare in
    # exactly one shard; the caller sums the per-shard tallies). Default
    # assignment is round-robin names[i::N]; with CHECK_COST_FILE it is
    # greedy LPT over measured per-query costs — deterministic, so the N
    # independent shard processes agree on the partition.
    if os.environ.get("CHECK_SHARD"):
        i, n = (int(x) for x in os.environ["CHECK_SHARD"].split("/"))
        # Shards are 0-based: a 1-based spec (1/4..4/4) would silently drop
        # names[0] from every shard while the tallies still sum plausibly.
        if not (0 <= i < n):
            raise SystemExit(
                f"CHECK_SHARD out of range: {i}/{n} (expected 0 <= i < n; shards are 0-based)")
        cost_file = os.environ.get("CHECK_COST_FILE")
        if cost_file and os.path.exists(cost_file):
            costs = json.load(open(cost_file))
            known = sorted(v for v in costs.values() if isinstance(v, (int, float)))
            med = known[len(known) // 2] if known else 1.0
            # LPT: heaviest first onto the least-loaded shard; ties broken
            # by shard index, input order fixed by (cost desc, name) — all
            # deterministic, so every process computes the same partition
            loads = [0.0] * n
            assign = {}
            for nm in sorted(names, key=lambda x: (-float(costs.get(x, med)), x)):
                s = min(range(n), key=lambda j: (loads[j], j))
                assign[nm] = s
                loads[s] += float(costs.get(nm, med))
            names = [nm for nm in names if assign[nm] == i]
        else:
            names = names[i::n]
    def check_one(name):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output parquet")
            return "fail"
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            s_cols, s_rows, s_kinds = frame_rows(sdf)
        except TypeError as e:
            print(f"FAIL  {name}: spark side: {e}")
            return "fail"
        if name not in oracle:
            # rows-only: the driver still sorts by all columns, so array
            # cells are fatal even without an oracle (k2 round-1 lesson)
            print(f"ROWS  {name}: rows={len(s_rows)} (no oracle)")
            return "rows"
        try:
            odf = con.execute(oracle[name]).fetchdf()
            o_cols, o_rows, o_kinds = frame_rows(odf)
        except TypeError as e:
            print(f"FAIL  {name}: oracle side: {e}")
            return "fail"
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            return "fail"
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns spark={s_cols} oracle={o_cols}")
            return "fail"
        bad_kind = [(c, sk, ok) for c, sk, ok in zip(s_cols, s_kinds, o_kinds)
                    if sk and ok and sk != ok]
        if bad_kind:
            print(f"FAIL  {name}: dtype mismatch: " + "; ".join(
                f"{c}: spark={sorted(sk)} oracle={sorted(ok)}"
                for c, sk, ok in bad_kind))
            return "fail"
        if s_rows == o_rows:
            print(f"PASS  {name}: {len(s_rows)} rows")
            return "pass"
        print(f"FAIL  {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
        sa, sb = set(s_rows), set(o_rows)
        for r in list(sa - sb)[:3]:
            print(f"      spark-only:  {r}")
        for r in list(sb - sa)[:3]:
            print(f"      oracle-only: {r}")
        return "fail"

    n_pass = n_fail = n_rowsonly = 0
    t_start = time.monotonic()
    q_secs = {}
    for name in names:
        t_q = time.monotonic()
        status = check_one(name)
        q_secs[name] = round(time.monotonic() - t_q, 3)
        if status == "pass":
            n_pass += 1
        elif status == "rows":
            n_rowsonly += 1
        else:
            n_fail += 1
    wall = round(time.monotonic() - t_start, 1)
    if os.environ.get("CHECK_COSTS_OUT"):
        json.dump(q_secs, open(os.environ["CHECK_COSTS_OUT"], "w"), indent=0)
    print(f"== pass={n_pass} fail={n_fail} rows-only={n_rowsonly} wall={wall}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
