#!/usr/bin/env python3
"""Skew-twin suite delta, reported BOTH ways (r12 what's-wrong #5 /
verdict item #6): compares a plain-sf0.1 bench stats artifact against
its 20%-hot skew twin and prints the suite delta (sum of per-query
mins) (a) over ALL queries — the pre-r13 headline that let the three
deliberately-sequential recurrence receipts dominate — and (b) over
ENGINE rows only (receipts excluded), which is what the headline
measures from r13 on. Receipt rows are taken from the artifact's own
"receipt" field, so the two files decide their own split.

Usage: python3 tools/skew_both_ways.py BENCH_sf01_r13_stats.jsonl \
         BENCH_sf01skew_r13_stats.jsonl
"""
import sys, json


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                d = json.loads(line)
                rows[d["query"]] = d
    return rows


def main():
    plain, skew = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(plain) & set(skew))
    def tot(rows, names):
        return sum(rows[q]["min"] for q in names if rows[q]["min"] >= 0)
    engine = [q for q in shared if not plain[q].get("receipt")]
    receipts = [q for q in shared if plain[q].get("receipt")]
    pa, sa = tot(plain, shared), tot(skew, shared)
    pe, se = tot(plain, engine), tot(skew, engine)
    pr, sr = tot(plain, receipts), tot(skew, receipts)
    print(f"shared queries: {len(shared)} ({len(receipts)} receipts)")
    print(f"ALL rows      : plain {pa:8.1f} s -> skew {sa:8.1f} s  "
          f"(+{100*(sa-pa)/pa:.1f}%)")
    print(f"ENGINE rows   : plain {pe:8.1f} s -> skew {se:8.1f} s  "
          f"(+{100*(se-pe)/pe:.1f}%)")
    if pr > 0:
        print(f"receipt rows  : plain {pr:8.1f} s -> skew {sr:8.1f} s  "
              f"(+{100*(sr-pr)/pr:.1f}%)")
    worst = sorted(((skew[q]["min"] / plain[q]["min"], q) for q in shared
                    if plain[q]["min"] > 0.05 and skew[q]["min"] >= 0),
                   reverse=True)[:10]
    print("worst skew/plain ratios (>50ms rows):")
    for r, q in worst:
        tag = " [receipt]" if plain[q].get("receipt") else ""
        print(f"  {q}: {plain[q]['min']:.2f} -> {skew[q]['min']:.2f} "
              f"({r:.1f}x){tag}")


if __name__ == "__main__":
    main()
