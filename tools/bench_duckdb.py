#!/usr/bin/env python3
"""Time the oracle SQL suite in DuckDB — the single-node comparison point
for BENCH.md. Materializes with fetchall() (results leave the engine, like
the Spark harness's hash-materialization forces all output columns).

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [threads]
(verifyOutDir only supplies oracle_sql.json, written by graft.Verify)
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, threads="8"):
    con = duckdb.connect()
    con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    total = 0.0
    times = {}
    for name in sorted(oracle):
        con.execute(oracle[name]).fetchall()  # warm (buffer cache, plan)
        t0 = time.perf_counter()
        con.execute(oracle[name]).fetchall()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 4)
        total += dt
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 3),
                      "unit": "sec", "threads": int(threads),
                      "queries": times, "sf": sf_dir}))


if __name__ == "__main__":
    main(*sys.argv[1:])
