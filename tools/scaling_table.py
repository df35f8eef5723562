#!/usr/bin/env python3
"""Render the full-suite dual-SF scaling table (SCALE_NOTES round-9+).

Usage: scaling_table.py <bench_lo.jsonl> <bench_hi.jsonl> [factor=10]

Reads the two Bench detailed JSON lines (the '"metric":"total"' line of
each artifact), joins per-query times, and prints a markdown table of
the scaling exponent e = log_factor(t_hi / t_lo) for every query above
a noise floor, classed flat / sub-linear / ~linear / super-linear.
Times under the floor (default 0.25 s at the LOW SF) are classed by
the hi-SF time alone: their lo-SF measurement is dominated by fixed
per-query overhead (~50-150 ms plan+submit), which would read as fake
super-linearity.
"""
import json
import math
import sys

FLOOR_LO = 0.25
FLOOR_HI = 1.0


def load(path):
    for line in open(path):
        d = json.loads(line)
        if "queries" in d:
            return d
    raise SystemExit(f"no detailed bench line in {path}")


def main():
    lo, hi = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    ql, qh = lo["queries"], hi["queries"]
    shared = sorted(set(ql) & set(qh))
    rows = []
    for k in shared:
        a, b = ql[k], qh[k]
        if a < 0 or b < 0:
            rows.append((k, a, b, None, "ERR"))
            continue
        if a < FLOOR_LO and b < FLOOR_HI:
            rows.append((k, a, b, None, "flat (sub-noise)"))
            continue
        e = math.log(max(b, 0.01) / max(a, 0.01)) / math.log(factor)
        cls = ("flat" if e < 0.15 else
               "sub-linear" if e < 0.85 else
               "~linear" if e <= 1.15 else
               "SUPER-LINEAR")
        rows.append((k, a, b, e, cls))
    errs = [r for r in rows if r[4] == "ERR"]
    sup = [r for r in rows if r[4] == "SUPER-LINEAR"]
    meas = [r for r in rows if r[3] is not None]
    med = sorted(r[3] for r in meas)[len(meas) // 2] if meas else float("nan")
    print(f"lo total {lo['value']:.1f}s (warmup {lo['warmup_shared_sec']:.1f})  "
          f"hi total {hi['value']:.1f}s (warmup {hi['warmup_shared_sec']:.1f})  "
          f"ratio {hi['value'] / lo['value']:.2f}x for {factor:g}x data  "
          f"n_failed lo={lo.get('n_failed')} hi={hi.get('n_failed')}")
    print(f"measured {len(meas)}, median exponent {med:.2f}, "
          f"super-linear {len(sup)}, errors {len(errs)}\n")
    print("| query | t_lo (s) | t_hi (s) | exponent | class |")
    print("|---|---|---|---|---|")
    for k, a, b, e, cls in sorted(rows, key=lambda r: -(r[3] if r[3] is not None else -9)):
        if cls == "flat (sub-noise)":
            continue
        print(f"| {k} | {a:.2f} | {b:.2f} | "
              f"{'%.2f' % e if e is not None else '—'} | {cls} |")
    n_skip = sum(1 for r in rows if r[4] == "flat (sub-noise)")
    print(f"\n({n_skip} queries under the noise floor at both SFs omitted: "
          f"flat by construction)")


if __name__ == "__main__":
    main()
