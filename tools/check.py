#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet views,
sorts columns by name and rows by all values, and compares.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "\x00NULL"
        if isinstance(v, float):
            return f"{v!r}"
        if isinstance(v, bool):
            return str(v)
        import decimal, datetime
        if isinstance(v, decimal.Decimal):
            return str(v.normalize()) if v != 0 else "0"
        if isinstance(v, datetime.datetime):
            return v.isoformat()
        if isinstance(v, datetime.date):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output parquet")
            n_fail += 1
            continue
        rel = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        spark_cols = [c[0] for c in rel.description]
        spark_rows = rel.fetchall()
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(spark_rows)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracle[name])
            ora_cols = [c[0] for c in res.description]
            ora_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(ora_cols):
            print(f"FAIL  {name}: columns spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
            n_fail += 1
            continue
        a, b = canon(spark_rows, spark_cols), canon(ora_rows, ora_cols)
        if a == b:
            print(f"PASS  {name}: {len(a)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows spark={len(a)} oracle={len(b)}")
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print(f"      spark-only:  {r}")
            for r in list(sb - sa)[:3]:
                print(f"      oracle-only: {r}")
    print(f"== pass={n_pass} fail={n_fail} rows-only={n_rowsonly}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
