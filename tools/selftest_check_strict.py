#!/usr/bin/env python3
"""Comparator self-test: frame_digest's verdict must equal frame_rows'
verdict on every tricky type pairing the engines actually produce —
the same hash≡render claim CHECK_DIFFERENTIAL_HASH proves on real
catalog outputs, pinned here on crafted corner cases so a comparator
edit can't silently shift semantics between rounds.

Run: python3 tools/selftest_check_strict.py   (exit 1 on any failure)
"""
import sys, os, math, datetime, decimal
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import pandas as pd
import check_strict as cs


def render_key(df):
    cols, rows, kinds = cs.frame_rows(df)
    return cols, kinds, tuple(rows)


def digest_key(df):
    r = cs.frame_digest(df)
    assert r is not None, f"unexpected per-cell fallback for dtypes {dict(df.dtypes.astype(str))}"
    return r


FAILS = []


def expect(name, a, b, equal):
    """Both comparators must agree with `equal` on frames a vs b
    (columns/kinds assumed compatible — this tests the ROW verdict)."""
    ra, rb = render_key(a), render_key(b)
    da, db = digest_key(a), digest_key(b)
    render_eq = ra[2] == rb[2]
    digest_eq = da[2] == db[2]
    kinds_eq_r = ra[1] == rb[1]
    kinds_eq_d = da[1] == db[1]
    ok = (render_eq == equal and digest_eq == equal and kinds_eq_r == kinds_eq_d)
    (print if ok else FAILS.append)(
        f"{'ok  ' if ok else 'FAIL'} {name}: render_eq={render_eq} "
        f"digest_eq={digest_eq} kinds_agree={kinds_eq_r == kinds_eq_d} want_eq={equal}")


def main():
    # date objects vs datetime64 midnight: EQUAL (the round-1 driver rule)
    expect("date vs ts-midnight",
           pd.DataFrame({"d": [datetime.date(2024, 3, 1), datetime.date(2024, 3, 2)]}),
           pd.DataFrame({"d": pd.to_datetime(["2024-03-01", "2024-03-02"])}),
           True)
    # one second apart: NOT equal
    expect("ts off by 1s",
           pd.DataFrame({"d": pd.to_datetime(["2024-03-01 00:00:00"])}),
           pd.DataFrame({"d": pd.to_datetime(["2024-03-01 00:00:01"])}),
           False)
    # sub-second timestamps: NOT equal
    expect("ts off by 1us",
           pd.DataFrame({"d": pd.to_datetime(["2024-03-01 00:00:00.000001"])}),
           pd.DataFrame({"d": pd.to_datetime(["2024-03-01 00:00:00.000002"])}),
           False)
    # NaT vs None-in-object-date column: EQUAL (both are the one NULL)
    expect("NaT vs None datelike",
           pd.DataFrame({"d": pd.to_datetime([pd.NaT, "2024-03-01"])}),
           pd.DataFrame({"d": [None, datetime.date(2024, 3, 1)]}),
           True)
    # -0.0 vs 0.0: NOT equal (repr and bits both distinguish)
    expect("-0.0 vs 0.0",
           pd.DataFrame({"x": [-0.0]}), pd.DataFrame({"x": [0.0]}), False)
    # float64 NaN vs None-in-object float: EQUAL (both null)
    expect("NaN vs None float",
           pd.DataFrame({"x": [float("nan"), 1.5]}),
           pd.DataFrame({"x": pd.Series([None, 1.5], dtype="object")}),
           True)
    # int32 vs int64 same values: EQUAL (width is not identity)
    expect("int32 vs int64",
           pd.DataFrame({"n": np.array([1, 2, 3], dtype=np.int32)}),
           pd.DataFrame({"n": np.array([1, 2, 3], dtype=np.int64)}),
           True)
    # object ints (HUGEINT-style) vs int64: EQUAL on equal values
    expect("object-int vs int64",
           pd.DataFrame({"n": pd.Series([1, 2], dtype="object")}),
           pd.DataFrame({"n": np.array([1, 2], dtype=np.int64)}),
           True)
    # bool column vs int 0/1: kinds must DISAGREE on both paths (the
    # kind gate fires before any row compare) — check kinds directly
    kb = digest_key(pd.DataFrame({"b": [True, False]}))[1][0]
    ki = digest_key(pd.DataFrame({"b": [1, 0]}))[1][0]
    rb = render_key(pd.DataFrame({"b": [True, False]}))[1][0]
    ri = render_key(pd.DataFrame({"b": [1, 0]}))[1][0]
    ok = kb != ki and rb != ri and kb == rb and ki == ri
    (print if ok else FAILS.append)(
        f"{'ok  ' if ok else 'FAIL'} bool vs int kinds: digest=({kb},{ki}) render=({rb},{ri})")
    # decimals: string identity (2.50 != 2.5 as Decimal strings on BOTH paths)
    expect("decimal trailing zero",
           pd.DataFrame({"m": pd.Series([decimal.Decimal("2.50")], dtype="object")}),
           pd.DataFrame({"m": pd.Series([decimal.Decimal("2.5")], dtype="object")}),
           False)
    # multiset (order) insensitivity with duplicate rows: permuted EQUAL,
    # multiplicity change NOT equal
    a = pd.DataFrame({"k": ["x", "x", "y"], "v": [1, 1, 2]})
    expect("permutation", a, a.iloc[[2, 0, 1]].reset_index(drop=True), True)
    expect("multiplicity", a, pd.DataFrame({"k": ["x", "y", "y"], "v": [1, 2, 2]}), False)
    # mixed bool+int object column must NOT value-collapse True==1:
    # it takes the string path, so "True" != "1"
    expect("mixed bool+int object",
           pd.DataFrame({"z": pd.Series([True, 2], dtype="object")}),
           pd.DataFrame({"z": pd.Series([1, 2], dtype="object")}),
           False)
    # array cells: BOTH paths must raise (the driver's sort crashes on them)
    arr = pd.DataFrame({"a": pd.Series([[1, 2]], dtype="object")})
    for fn, nm in ((cs.frame_rows, "render"), (cs.frame_digest, "digest")):
        try:
            fn(arr)
            FAILS.append(f"FAIL array cell not rejected on {nm} path")
        except TypeError:
            print(f"ok   array cell rejected ({nm})")
    # empty frames with same columns: EQUAL
    expect("empty frames",
           pd.DataFrame({"k": pd.Series([], dtype="object")}),
           pd.DataFrame({"k": pd.Series([], dtype="object")}),
           True)

    # hash_verdict exception taxonomy (round-15 ADVICE): TypeError is a
    # VERDICT (fail, reported); any other digest exception must degrade
    # to the render path (None, unreported) instead of propagating and
    # killing the whole strict-gate run
    plain = pd.DataFrame({"k": [1, 2]})
    real_digest = cs.frame_digest
    try:
        def boom(kind):
            def f(df):
                raise kind("synthetic digest limitation")
            return f
        cs.frame_digest = boom(ValueError)
        v = cs.hash_verdict(plain, plain, "selftest_valueerror")
        ok = v == (None, False)
        (print if ok else FAILS.append)(
            f"{'ok  ' if ok else 'FAIL'} digest ValueError degrades to render: got {v}")
        cs.frame_digest = boom(TypeError)
        v = cs.hash_verdict(plain, plain, "selftest_typeerror")
        ok = v == ("fail", True)
        (print if ok else FAILS.append)(
            f"{'ok  ' if ok else 'FAIL'} digest TypeError stays a FAIL verdict: got {v}")
    finally:
        cs.frame_digest = real_digest
    # and the degraded path's authoritative verdict still works
    v = cs.render_verdict(plain, plain, "selftest_render", quiet=True)
    ok = v == "pass"
    (print if ok else FAILS.append)(
        f"{'ok  ' if ok else 'FAIL'} render verdict after degrade: got {v}")

    if FAILS:
        print("\n".join(str(f) for f in FAILS))
        print(f"== SELFTEST FAILED: {len(FAILS)}")
        return 1
    print("== SELFTEST PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
