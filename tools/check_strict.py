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
  CHECK_HASH=0           disable the digest fast path (default on: compare
                         order-independent multiset digests of the rendered
                         rows — identical verdict semantics, no per-row
                         Python strings and no O(n log n) sort; digest
                         mismatches rerun the render compare for the
                         authoritative verdict + diagnostics)
  CHECK_DIFFERENTIAL_HASH=1  run BOTH the digest and render compares on
                         every query and fail on any verdict disagreement
                         (the hash-mode proof harness)
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

# glibc munmaps every >128KB block on free, so each large numpy/pandas
# temporary is a FRESH mmap whose first touch page-faults — and this
# host's fault path runs at ~10-15 MB/s in its slow weather phases
# (measured: an allocating 120MB elementwise op = 8-37s on first touch,
# 0.04s once pages are warm). Raising M_MMAP_THRESHOLD keeps big blocks
# on the heap, so the process pays first-touch once at its high-water
# mark and every later query reuses warm pages. RSS then holds at the
# peak single-query footprint per shard — the same transient peak the
# compare always needed, just retained.
try:
    import ctypes
    ctypes.CDLL("libc.so.6").mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD = -3
except Exception:
    pass  # non-glibc platform: only costs the warm-page reuse

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


def frame_rows_percell(df):
    """The reference implementation: per-cell dispatch, row tuples."""
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


NULL = "\x00NULL"


def render_column(ser):
    """Vectorized cell() over one column: returns (list[str], kindset),
    producing byte-identical strings to cell()/kind() (the differential
    mode below proves it on real outputs). Falls back to per-cell
    dispatch for any type it does not fully recognize — never guesses."""
    import datetime, decimal
    dt = str(ser.dtype)
    n = len(ser)
    if dt in ("int64", "int32", "int16", "int8"):
        return ser.astype(str).tolist(), ({"int"} if n else set())
    if dt == "bool":
        return ser.astype(str).tolist(), ({"bool"} if n else set())
    if dt in ("float64", "float32"):
        vals = ser.tolist()  # python floats (float() applied, like cell())
        out = [NULL if v != v else repr(v) for v in vals]
        return out, ({"float"} if any(v == v for v in vals) else set())
    if dt.startswith("datetime64"):
        # str(Timestamp) omits an all-zero fraction; strftime never does —
        # keep the per-element str(), it is already dispatch-free
        out = [NULL if v is pd.NaT else str(v) for v in ser]
        return out, ({"datelike"} if any(v is not pd.NaT for v in ser) else set())
    if dt == "object":
        vals = ser.tolist()
        types = {type(v) for v in vals}
        out, kinds = [], set()
        for t in types:
            if t in (list, tuple, np.ndarray):
                raise TypeError(f"array cell: {t.__name__}")
        simple = {str, bool, int, type(None), float,
                  decimal.Decimal, datetime.date, datetime.datetime,
                  pd.Timestamp, type(pd.NaT), bytes}
        if not types <= simple:
            return None  # unrecognized member type: per-cell fallback
        for v in vals:
            if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                out.append(NULL)
                continue
            if isinstance(v, bool):
                out.append(str(v)); kinds.add("bool")
            elif isinstance(v, float):
                # repr(float(v)), never repr(v): np.float64 is a float
                # subclass and numpy 2 reprs it as 'np.float64(...)'
                out.append(repr(float(v))); kinds.add("float")
            elif isinstance(v, int):
                out.append(str(v)); kinds.add("int")
            elif isinstance(v, str):
                out.append(v); kinds.add("str")
            elif isinstance(v, decimal.Decimal):
                out.append(str(v)); kinds.add("decimal")
            elif isinstance(v, (pd.Timestamp, datetime.datetime)):
                out.append(str(v)); kinds.add("datelike")
            elif isinstance(v, datetime.date):
                out.append(f"{v} 00:00:00"); kinds.add("datelike")
            else:  # bytes — cell() falls through to str(v)
                out.append(str(v)); kinds.add(type(v).__name__)
        return out, kinds
    return None


def column_hashes(ser):
    """uint64 hash per cell + kindset for one column, or None → caller
    falls back to the render path. Hash identity == render identity,
    argued per KIND (the kind check runs before any digest compare, so
    only same-kind column pairs ever reach it):
      - datelike → int64 ns-since-epoch (equal instants render equal and
        hash equal; unequal instants differ in both — str(Timestamp)
        prints fractional seconds at full resolution);
      - float → the IEEE bit pattern (repr(float) is injective on bit
        patterns modulo NaN, and every NaN is null-masked; -0.0/0.0
        differ in both renderings and bits);
      - int/bool → the integer value (render str(v) is injective on
        values; object-side Python ints overflowing int64 fall back to
        the string path for the whole column, which at worst costs a
        digest mismatch and a render-path rerun — never a wrong verdict);
      - everything else → exactly render_column's strings.
    Nulls of every representation (None/NaN/NaT) hash as NULLH on every
    path, as they all render as the one NULL sentinel. `categorize=False`
    everywhere: factorizing 15M mostly-unique values first is pure
    overhead (measured 3-4x on the sf2.0 gate's row-heavy columns)."""
    import datetime
    dt = str(ser.dtype)
    n = len(ser)
    if dt.startswith("datetime64"):
        mask = ser.isna().to_numpy()
        ints = ser.to_numpy(dtype="datetime64[ns]").view("int64").copy()
        h = pd.util.hash_array(ints, categorize=False)
        h[mask] = NULLH
        return h, ({"datelike"} if (~mask).any() else set())
    if dt in ("float64", "float32"):
        mask = ser.isna().to_numpy()
        bits = ser.to_numpy(dtype=np.float64).view(np.int64).copy()
        h = pd.util.hash_array(bits, categorize=False)
        h[mask] = NULLH
        return h, ({"float"} if (~mask).any() else set())
    if dt in ("int64", "int32", "int16", "int8"):
        h = pd.util.hash_array(ser.to_numpy(dtype=np.int64), categorize=False)
        return h, ({"int"} if n else set())
    if dt == "bool":
        h = pd.util.hash_array(ser.to_numpy(dtype=np.int64), categorize=False)
        return h, ({"bool"} if n else set())
    if dt == "object":
        # infer_dtype is the C-speed type probe (a Python set over the
        # values costs seconds per 15M-row column); it is EXACT, not
        # sampled, so each branch below sees a homogeneous column.
        # Homogeneity matters: a mixed bool+int column value-hashing
        # True==1 where the render path distinguishes "True" from "1"
        # must take the string path ("mixed*" kinds fall through).
        inferred = pd.api.types.infer_dtype(ser, skipna=True)
        if inferred in ("date", "datetime", "datetime64"):
            try:
                conv = pd.to_datetime(ser, errors="raise")
                if str(conv.dtype).startswith("datetime64"):
                    return column_hashes(conv)
            except Exception:
                pass  # odd datelikes (tz mixtures): the proven string path
        if inferred == "string":
            vals = ser.to_numpy()
            mask = pd.isna(vals)
            if mask.any():
                vals = vals.copy()
                vals[mask] = NULL
            return (pd.util.hash_array(vals, categorize=False),
                    {"str"} if (~mask).any() else set())
        if inferred in ("floating", "mixed-integer-float"):
            # pure Python-float object column (fetchdf occasionally):
            # float64 conversion is exact (same doubles), so the bits
            # path applies — renders equal ⟺ bits equal, and None/NaN
            # both null-mask. pandas labels [None, 1.5] as
            # "mixed-integer-float", so that class is refined with an
            # exact type check; a GENUINE int+float mix stays on the
            # string path (render distinguishes "1" from "1.0").
            if inferred == "floating" or \
                    all(type(v) is float for v in ser.dropna()):
                try:
                    return column_hashes(ser.astype(np.float64))
                except Exception:
                    pass
        if inferred in ("integer", "boolean"):
            kind_set = {"bool"} if inferred == "boolean" else {"int"}
            vals = ser.to_numpy()
            mask = pd.isna(vals)
            try:
                ints = np.fromiter(
                    (0 if m else int(v) for v, m in zip(vals, mask)),
                    dtype=np.int64, count=n)
                h = pd.util.hash_array(ints, categorize=False)
                h[mask] = NULLH
                return h, (kind_set if (~mask).any() else set())
            except OverflowError:
                pass  # beyond-int64 Python ints: string path
    r = render_column(ser)
    if r is None:
        return None
    strs, kinds = r
    return pd.util.hash_array(np.array(strs, dtype=object), categorize=False), kinds


def frame_digest(df):
    """Hash-mode twin of [[frame_rows]]: (cols, kinds, n, digest) where
    digest is an ORDER-INDEPENDENT multiset fingerprint of the rows —
    per-row uint64 (columns folded in sorted-name order, the same total
    order both sides use), combined by wrap-around sum, a mixed sum, and
    xor. Equal row multisets → equal digests exactly; unequal → unequal
    with probability 1 - O(2^-64) per comparison. No per-row Python
    strings, no O(n log n) sort — the two costs that made the strict gate
    compare-bound at sf2.0 (render+encode+sort ≈ 100 s/side on p1's 15M
    rows; the digest is a handful of vectorized passes). Returns None if
    any column needs the per-cell fallback (caller uses the render path).
    CHECK_DIFFERENTIAL_HASH=1 proves digest-verdict ≡ render-verdict per
    query on real outputs."""
    cols = sorted(df.columns)
    df = df[cols]
    n = len(df)
    acc = np.zeros(n, dtype=np.uint64)
    kinds = []
    P1 = np.uint64(1099511628211)
    for c in range(len(cols)):
        r = column_hashes(df.iloc[:, c])
        if r is None:
            return None
        h, ks = r
        with np.errstate(over="ignore"):
            np.multiply(acc, P1, out=acc)
            np.add(acc, h.astype(np.uint64, copy=False), out=acc)
        kinds.append(ks)
    if n:
        with np.errstate(over="ignore"):
            mixed = acc ^ (acc >> np.uint64(33))
            mixed = mixed * np.uint64(0xFF51AFD7ED558CCD)
            mixed = mixed ^ (mixed >> np.uint64(33))
            digest = (n, int(acc.sum(dtype=np.uint64)),
                      int(mixed.sum(dtype=np.uint64)),
                      int(np.bitwise_xor.reduce(acc)))
    else:
        digest = (0, 0, 0, 0)
    return cols, kinds, digest


# the NULL sentinel's hash — every path maps a null cell to this value,
# so null representation (None vs NaT vs NaN) never splits the hashes
NULLH = pd.util.hash_array(np.array([NULL], dtype=object))[0]


def encode_rows(col_strings):
    """Rows as ONE string each: every cell length-prefixed ('7:content')
    and joined — an INJECTIVE encoding (no separator collision can make
    two different rows equal), so sorted-list equality of encodings is
    exactly multiset equality of rows. Which total order the sort uses is
    irrelevant to that equality — both sides sort the same way."""
    return ["".join(f"{len(c)}:{c}" for c in row) for row in zip(*col_strings)]


def frame_rows(df):
    """Vectorized twin of [[frame_rows_percell]] — same (cols, kinds),
    rows as injectively-encoded strings instead of tuples. ~10-40x less
    Python object churn on the row-heavy entries that dominate the gate
    wall (p1 at sf2.0: 15M rows x 6 cols). CHECK_PERCELL=1 forces the
    reference path (tuples); CHECK_DIFFERENTIAL=1 runs BOTH and asserts
    the vectorized encodings equal the re-encoded reference tuples
    byte-for-byte — the proof harness, run over every query's real
    output at sf0.01 plus the row-heavy sf1.0 entries."""
    if os.environ.get("CHECK_PERCELL"):
        return frame_rows_percell(df)
    cols = sorted(df.columns)
    df = df[cols]
    col_strings, kinds = [], []
    fellback = False
    for c in range(len(cols)):
        r = render_column(df.iloc[:, c])
        if r is None:
            fellback = True
            break
        col_strings.append(r[0])
        kinds.append(r[1])
    if fellback:
        pcols, prows, pkinds = frame_rows_percell(df)
        enc = sorted(encode_rows([[t[i] for t in prows] for i in range(len(pcols))])) \
            if pcols else []
        # prows is already sorted as tuples; re-encode then re-sort in
        # encoding order so fast and fallback paths order identically
        return pcols, enc, pkinds
    rows = sorted(encode_rows(col_strings)) if cols else []
    if os.environ.get("CHECK_DIFFERENTIAL"):
        pcols, prows, pkinds = frame_rows_percell(df)
        ref = sorted(encode_rows([[t[i] for t in prows] for i in range(len(pcols))])) \
            if pcols else []
        assert pcols == cols, f"differential: cols {pcols} != {cols}"
        assert pkinds == kinds, f"differential: kinds {pkinds} != {kinds}"
        assert ref == rows, "differential: row encodings diverge"
    return cols, rows, kinds


def hash_verdict(sdf, odf, name):
    """('pass'|'fail', reported) or (None, False) when a column needs
    the per-cell fallback. Prints its own FAIL lines for column/kind
    mismatches (identical content to the render path's).

    TypeError is the ONE exception class that is a verdict (array cells
    are fatal by the driver's own sort contract — the same FAIL the
    render path raises). Anything else the vectorized digest trips over
    (a tz-aware or out-of-range datetime64 in to_numpy, an unexpected
    dtype in a numpy op) is a DIGEST limitation, not a result defect:
    degrade that frame to the authoritative render compare instead of
    killing the whole strict-gate run (round-15 ADVICE — fail-loud
    stays, wrong-scope abort goes). Module-level so
    selftest_check_strict.py can pin both exception behaviors."""
    try:
        ds = frame_digest(sdf)
    except TypeError as e:
        print(f"FAIL  {name}: spark side: {e}")
        return "fail", True
    except Exception as e:
        print(f"NOTE  {name}: digest fell back to render (spark side: "
              f"{type(e).__name__}: {e})")
        return None, False
    try:
        do = frame_digest(odf)
    except TypeError as e:
        print(f"FAIL  {name}: oracle side: {e}")
        return "fail", True
    except Exception as e:
        print(f"NOTE  {name}: digest fell back to render (oracle side: "
              f"{type(e).__name__}: {e})")
        return None, False
    if ds is None or do is None:
        return None, False
    s_cols, s_kinds, s_dig = ds
    o_cols, o_kinds, o_dig = do
    if s_cols != o_cols:
        print(f"FAIL  {name}: columns spark={s_cols} oracle={o_cols}")
        return "fail", True
    bad_kind = [(c, sk, ok) for c, sk, ok in zip(s_cols, s_kinds, o_kinds)
                if sk and ok and sk != ok]
    if bad_kind:
        print(f"FAIL  {name}: dtype mismatch: " + "; ".join(
            f"{c}: spark={sorted(sk)} oracle={sorted(ok)}"
            for c, sk, ok in bad_kind))
        return "fail", True
    if s_dig == o_dig:
        return "pass", False
    return "fail", False  # render path reports the row diff


def render_verdict(sdf, odf, name, quiet=False):
    def out(msg):
        if not quiet:
            print(msg)
    try:
        s_cols, s_rows, s_kinds = frame_rows(sdf)
    except TypeError as e:
        out(f"FAIL  {name}: spark side: {e}")
        return "fail"
    try:
        o_cols, o_rows, o_kinds = frame_rows(odf)
    except TypeError as e:
        out(f"FAIL  {name}: oracle side: {e}")
        return "fail"
    if s_cols != o_cols:
        out(f"FAIL  {name}: columns spark={s_cols} oracle={o_cols}")
        return "fail"
    bad_kind = [(c, sk, ok) for c, sk, ok in zip(s_cols, s_kinds, o_kinds)
                if sk and ok and sk != ok]
    if bad_kind:
        out(f"FAIL  {name}: dtype mismatch: " + "; ".join(
            f"{c}: spark={sorted(sk)} oracle={sorted(ok)}"
            for c, sk, ok in bad_kind))
        return "fail"
    if s_rows == o_rows:
        out(f"PASS  {name}: {len(s_rows)} rows")
        return "pass"
    out(f"FAIL  {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
    if not quiet:
        sa, sb = set(s_rows), set(o_rows)
        for r in list(sa - sb)[:3]:
            print(f"      spark-only:  {r}")
        for r in list(sb - sa)[:3]:
            print(f"      oracle-only: {r}")
    return "fail"


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
    # CHECK_HASH=1 (the default): compare order-independent multiset
    # DIGESTS instead of rendering + sorting every row — identical
    # pass/fail semantics (equal multisets give equal digests EXACTLY;
    # unequal collide with probability ~2^-64), a fraction of the cost on
    # row-heavy entries (the sf2.0 gate was compare-bound on exactly
    # this). On a digest mismatch the render path reruns for the
    # authoritative verdict + row-level diagnostics, so failures lose
    # nothing. CHECK_HASH=0 restores pure render compare;
    # CHECK_DIFFERENTIAL_HASH=1 runs BOTH paths on every query and
    # asserts their verdicts agree — the proof harness.
    hash_mode = os.environ.get("CHECK_HASH", "1") != "0"
    differential = bool(os.environ.get("CHECK_DIFFERENTIAL_HASH"))

    def check_one(name):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output parquet")
            return "fail"
        # date_as_object=False: DATE32 loads as datetime64[ns] instead of
        # 15M boxed datetime.date objects (a ~27 s/col to_datetime or
        # str() wall either way). Verdict-equivalent by construction: the
        # compare already equates a date with its midnight timestamp
        # (cell() pads dates; kind() calls both "datelike"), which is how
        # round-1 driver results behave. Everything else keeps the exact
        # pd.read_parquet dtypes (strings/decimals → object, ints/floats
        # native).
        import pyarrow.parquet as pq
        sdf = pd.concat(
            [pq.read_table(f).to_pandas(date_as_object=False) for f in files])
        if name not in oracle:
            # rows-only: the driver still sorts by all columns, so array
            # cells are fatal even without an oracle (k2 round-1 lesson)
            try:
                d = None
                if hash_mode:
                    try:
                        d = frame_digest(sdf)
                    except TypeError:
                        raise
                    except Exception:
                        d = None  # digest limitation → render-count fallback
                nrows = d[2][0] if d is not None else len(frame_rows(sdf)[1])
            except TypeError as e:
                print(f"FAIL  {name}: spark side: {e}")
                return "fail"
            print(f"ROWS  {name}: rows={nrows} (no oracle)")
            return "rows"
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            return "fail"
        if differential:
            hv, _ = hash_verdict(sdf, odf, name)
            rv = render_verdict(sdf, odf, name)
            if hv is not None and hv != rv:
                print(f"DIFFERENTIAL-MISMATCH  {name}: hash={hv} render={rv}")
                return "fail"
            return rv
        if hash_mode:
            hv, reported = hash_verdict(sdf, odf, name)
            if hv == "pass":
                print(f"PASS  {name}: {len(sdf)} rows (digest)")
                return "pass"
            if hv == "fail" and reported:
                return "fail"
            # digest mismatch (or per-cell fallback): the render path is
            # the authoritative verdict and carries the diagnostics
        return render_verdict(sdf, odf, name)

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
