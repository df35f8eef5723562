#!/usr/bin/env python3
"""Same-host interleaved A/B analysis (r12 verdict item #7): reads two
sets of bench stdout files (each containing the detailed
{"metric":"total",...,"queries":{...}} line), takes each HEAD's
per-query MIN across its runs, and reports the shared-query ratio plus
the worst per-query regressions — the judge's cross-round comparison,
reproduced locally in the SAME mode on the SAME host so neither the
host confound nor a methodology switch can inflate the claim
(the r12 what's-wrong #4 lesson: query-major vs pass-major minima are
not comparable).

Usage: python3 tools/ab_compare.py A:/tmp/ab_r12_1.out A:/tmp/ab_r12_2.out \
         B:/tmp/ab_r13_1.out B:/tmp/ab_r13_2.out
"""
import sys, json


def detail_line(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric":"total"'):
                return json.loads(line)
    raise SystemExit(f"{path}: no detailed bench line")


def main():
    runs = {"A": [], "B": []}
    for arg in sys.argv[1:]:
        side, path = arg.split(":", 1)
        runs[side].append(detail_line(path))
    mins = {}
    for side, ds in runs.items():
        per = {}
        for d in ds:
            for q, t in d["queries"].items():
                if t >= 0:
                    per[q] = min(per.get(q, float("inf")), t)
        mins[side] = per
    shared = sorted(set(mins["A"]) & set(mins["B"]))
    sa = sum(mins["A"][q] for q in shared)
    sb = sum(mins["B"][q] for q in shared)
    print(f"shared queries: {len(shared)}")
    print(f"A shared total: {sa:.1f} s   B shared total: {sb:.1f} s   "
          f"ratio B/A: {sb/sa:.3f}")
    only_a = sorted(set(mins['A']) - set(mins['B']))
    only_b = sorted(set(mins['B']) - set(mins['A']))
    if only_a:
        print(f"A-only: {', '.join(only_a)}")
    if only_b:
        tb = sum(mins['B'][q] for q in only_b)
        print(f"B-only ({tb:.1f} s): {', '.join(only_b)}")
    regress = sorted(((mins["B"][q] / mins["A"][q], q) for q in shared
                      if mins["A"][q] > 0.05), reverse=True)[:8]
    print("worst B/A regressions (>50ms rows):")
    for r, q in regress:
        print(f"  {q}: {mins['A'][q]:.3f} -> {mins['B'][q]:.3f}  ({r:.2f}x)")
    improve = sorted(((mins["B"][q] / mins["A"][q], q) for q in shared
                      if mins["A"][q] > 0.05))[:8]
    print("best B/A improvements (>50ms rows):")
    for r, q in improve:
        print(f"  {q}: {mins['A'][q]:.3f} -> {mins['B'][q]:.3f}  ({r:.2f}x)")
    for side in ("A", "B"):
        for i, d in enumerate(runs[side]):
            can = d.get("canary")
            print(f"{side} run{i+1}: value={d['value']} contended={d['contended']} "
                  f"warmup={d['warmup_shared_sec']} canary={can}")


if __name__ == "__main__":
    main()
