#!/usr/bin/env python3
"""Generate a larger strict-gate fixture by deterministic key-shifted
replication of an existing driver fixture (round-6 verdict #7: each 10x
scale-up has caught a new tie/overflow class; the driver only ships up to
sf0.1).

The strict gate needs Spark and DuckDB to agree on the SAME parquet — not
a faithful TPC-H distribution — so COPIES copies of sf0.1 with disjoint
key ranges (strides far above each table's max key) preserve referential
integrity (customer->orders->lineitem, doc/vec/event ids) while 5x-ing
every row count. Money columns get a +k*0.01 nudge per copy so price-
derived aggregates see fresh values (more rounding-tie exposure), dates
shift +k days (stays inside every catalog query's date window), and text/
embedding payloads replicate verbatim — identical content under distinct
ids is exactly the duplicate-heavy regime the dedup/CC/BPE stack should
be stressed with.

Usage: python3 tools/gen_scale.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/testdata/sf0.5 5
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf0.5"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 5

# key strides: comfortably above each table's max key, and doc_id stays
# below 2^31 (the d3/d5 packed-long encoding requires 31-bit doc ids).
# SUPP is 1e4: the trade-graph entries build a unified node space as
# suppkey UNION custkey+1e6, so every scaled suppkey (max copies*1e4+999 =
# 191k at 20 copies of the default fixture) must stay BELOW 1e6 or copies'
# supplier nodes collide with other copies' customer nodes (the ~0.3%
# node-merge artifact the round-10 verdict flagged). The assertions run
# against the ACTUAL max keys of SRC at runtime (round-11 ADVICE: a
# hardcoded 999 could not catch a larger source fixture whose max suppkey
# reaches the stride).
CUST, ORD, PART, SUPP, DOC, VEC, EVT, USR = (
    10**6, 10**7, 10**6, 10**4, 10**5, 10**5, 10**7, 10**6)

# (table, key column, stride) for every shifted key; checked in main()
KEYED = [
    ("customer", "c_custkey", CUST), ("supplier", "s_suppkey", SUPP),
    ("part", "p_partkey", PART), ("orders", "o_orderkey", ORD),
    ("events", "event_id", EVT), ("events", "user_id", USR),
    ("documents", "doc_id", DOC), ("embeddings", "vec_id", VEC),
]


def check_strides(con):
    """Disjoint-id-space guarantees against SRC's actual max keys: every
    stride must exceed its table's max key (otherwise copies' key ranges
    overlap and 'replicated' rows silently merge), scaled suppkeys must
    stay below the 1e6 customer-node offset of the unified trade graph,
    and scaled doc ids below 2^31 (the packed-long encoding)."""
    for table, keycol, stride in KEYED:
        mx = con.execute(
            f"SELECT max({keycol}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
        assert mx < stride, \
            f"{table}.{keycol}: max key {mx} >= stride {stride} — copies would overlap"
        if keycol == "s_suppkey":
            assert (COPIES - 1) * stride + mx < 10**6, \
                f"scaled suppkey {(COPIES-1)*stride + mx} reaches the 1e6 cust-node offset"
        if keycol == "doc_id":
            assert (COPIES - 1) * stride + mx < 2**31, \
                f"scaled doc_id {(COPIES-1)*stride + mx} breaks the 31-bit packed-long contract"

TABLES = {
    "region": "SELECT * FROM src",   # tiny dims replicate as-is (k=0 only)
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey + k*{CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal + k*0.01 AS c_acctbal, c_mktsegment
        FROM src CROSS JOIN ks""",
    "supplier": f"""
        SELECT s_suppkey + k*{SUPP} AS s_suppkey, s_name, s_nationkey,
               s_acctbal + k*0.01 AS s_acctbal
        FROM src CROSS JOIN ks""",
    "part": f"""
        SELECT p_partkey + k*{PART} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice + k*0.01 AS p_retailprice
        FROM src CROSS JOIN ks""",
    "orders": f"""
        SELECT o_orderkey + k*{ORD} AS o_orderkey,
               o_custkey + k*{CUST} AS o_custkey, o_orderstatus,
               o_totalprice + k*0.01 AS o_totalprice,
               o_orderdate + to_days(CAST(k AS INTEGER)) AS o_orderdate, o_orderpriority
        FROM src CROSS JOIN ks""",
    "lineitem": f"""
        SELECT l_orderkey + k*{ORD} AS l_orderkey,
               l_partkey + k*{PART} AS l_partkey,
               l_suppkey + k*{SUPP} AS l_suppkey,
               l_linenumber, l_quantity,
               l_extendedprice + k*0.01 AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + to_days(CAST(k AS INTEGER)) AS l_shipdate
        FROM src CROSS JOIN ks""",
    "events": f"""
        SELECT event_id + k*{EVT} AS event_id, ts + to_days(CAST(k AS INTEGER)) AS ts,
               user_id + k*{USR} AS user_id, event_type, value, props
        FROM src CROSS JOIN ks""",
    "documents": f"""
        SELECT doc_id + k*{DOC} AS doc_id, text, lang, source, n_chars
        FROM src CROSS JOIN ks""",
    "embeddings": f"""
        SELECT vec_id + k*{VEC} AS vec_id, embedding, label
        FROM src CROSS JOIN ks""",
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    check_strides(con)
    con.execute(f"CREATE VIEW ks AS SELECT range AS k FROM range({COPIES})")
    for name, sql in TABLES.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM '{SRC}/{name}.parquet'")
        # preserve source column types exactly: key arithmetic widens to the
        # source type via explicit casts below, timestamps stay timestamps
        src_types = dict((r[0], r[1]) for r in
                         con.execute("DESCRIBE SELECT * FROM src").fetchall())
        cast_cols = ", ".join(
            f'CAST("{c}" AS {t}) AS "{c}"' for c, t in src_types.items())
        con.execute(
            f"COPY (SELECT {cast_cols} FROM ({sql})) TO "
            f"'{DST}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
