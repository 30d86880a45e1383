#!/usr/bin/env python3
"""Diff two BENCH_LOCAL.json records (line 2: the full per-query map) —
the round-over-round regression check the shuffle-bytes instrumentation
exists for. Wall seconds on a shared box are ±0.5 s noise; shuffle BYTES
are deterministic per plan+data, so a byte delta is usually a real plan
change (new exchange, changed key width, different pre-aggregation) and
is reported separately from timing drift.

One attribution caveat (observed, not hypothetical): queries sharing a
MEMOIZED artifact (the trade-graph edge checkpoint feeding g1/g2/g4/g7,
the BPE/unigram model tables, the k-means assignment tower) attribute
the one-time build's shuffles to whichever query's thread happens to
trigger it first — under the bench's work-stealing order that mover can
differ between runs, so byte deltas that APPEAR on one g*/v* entry and
disappear on a sibling are attribution movement, not plan changes. A
real regression shows as a NET increase across the sharing group (or on
any non-sharing query).

Usage: python3 tools/diff_bench.py <old BENCH_LOCAL.json> <new BENCH_LOCAL.json>
       [--sec-threshold 0.5] [--byte-threshold 0.02]

Exit code 1 if any query's shuffle bytes moved by more than
--byte-threshold (relative) — timing-only drift never fails.
"""
import argparse
import json


def load(path):
    lines = open(path).read().strip().split("\n")
    full = json.loads(lines[1] if len(lines) > 1 else lines[0])
    return (full.get("queries", {}),
            full.get("shuffle_read_bytes", {}),
            full.get("shuffle_write_bytes", {}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--sec-threshold", type=float, default=0.5)
    ap.add_argument("--byte-threshold", type=float, default=0.02)
    args = ap.parse_args()

    (q0, r0, w0), (q1, r1, w1) = load(args.old), load(args.new)
    # A record without shuffle maps (pre-round-12 format) would make the
    # byte check VACUOUSLY pass — indistinguishable from "no regressions"
    # (round-12 ADVICE). Fail loudly instead.
    for path, r, w in ((args.old, r0, w0), (args.new, r1, w1)):
        if not r and not w:
            print(f"ERROR {path}: no shuffle_read_bytes/shuffle_write_bytes "
                  f"maps — byte check would be vacuous (pre-round-12 record?)")
            return 2
    added = sorted(set(q1) - set(q0))
    removed = sorted(set(q0) - set(q1))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    byte_moved = []
    for name in sorted(set(w0) & set(w1)):
        for kind, a, b in (("write", w0, w1), ("read", r0, r1)):
            ov, nv = a.get(name, 0), b.get(name, 0)
            base = max(ov, 1)
            if abs(nv - ov) / base > args.byte_threshold:
                byte_moved.append((name, kind, ov, nv))
    for name, kind, ov, nv in byte_moved:
        print(f"BYTES {name}: shuffle_{kind} {ov/1e6:.2f} MB -> {nv/1e6:.2f} MB "
              f"({(nv-ov)/max(ov,1)*100:+.0f}%)")

    # timing drift: informational only (box noise), sorted by |delta|
    drift = sorted(((q1[n] - q0[n], n) for n in set(q0) & set(q1)
                    if q0[n] >= 0 and q1[n] >= 0
                    and abs(q1[n] - q0[n]) > args.sec_threshold),
                   key=lambda x: -abs(x[0]))
    for d, n in drift[:15]:
        print(f"sec   {n}: {q0[n]:.2f} -> {q1[n]:.2f} ({d:+.2f})")

    s0 = sum(v for v in q0.values() if v >= 0)
    s1 = sum(v for v in q1.values() if v >= 0)
    print(f"== sum_sec {s0:.1f} -> {s1:.1f}; "
          f"byte-moved queries: {len(set(n for n, _, _, _ in byte_moved))}; "
          f"timing drifts > {args.sec_threshold}s: {len(drift)}")
    return 1 if byte_moved else 0


if __name__ == "__main__":
    raise SystemExit(main())
