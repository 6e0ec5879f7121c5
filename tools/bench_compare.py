#!/usr/bin/env python3
"""Dispersion-aware bench comparator (builder-side tooling).

Usage: python3 tools/bench_compare.py <old_bench_queries.json> <new_bench_queries.json>

Each input is the per-query artifact Bench writes (bench_queries.json):
`samples` holds the FULL rep list per query, `queries` the per-query min,
plus loadavg_start/loadavg_end for the run. Per-query regressions are
flagged ONLY when the rep RANGES do not overlap (new min > old max) AND
the shift is material (> 20% and > 0.1 s) — a single slow rep inside the
old range is ambient-load noise, not a regression (the round-15 q47
false alarm this artifact exists to prevent). Exit code 1 when any
regression is flagged, 0 otherwise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    olds, news = old.get("samples", {}), new.get("samples", {})
    common = sorted(set(olds) & set(news))
    dropped = sorted(set(olds) ^ set(news))
    regressions, improvements = [], []
    for q in common:
        o = [s for s in olds[q] if s >= 0]
        n = [s for s in news[q] if s >= 0]
        if not o or not n:
            continue
        if min(n) > max(o) and min(n) > 1.2 * min(o) and min(n) - min(o) > 0.1:
            regressions.append((q, min(o), max(o), min(n), max(n)))
        elif max(n) < min(o) and min(o) > 1.2 * min(n) and min(o) - min(n) > 0.1:
            improvements.append((q, min(o), max(o), min(n), max(n)))
    print(f"old: total={old.get('value'):.1f}s loadavg="
          f"{old.get('loadavg_start')}→{old.get('loadavg_end')}")
    print(f"new: total={new.get('value'):.1f}s loadavg="
          f"{new.get('loadavg_start')}→{new.get('loadavg_end')}")
    ratios = sorted(min(x for x in news[q] if x >= 0) /
                    min(x for x in olds[q] if x >= 0)
                    for q in common
                    if any(x >= 0 for x in olds[q]) and
                       any(x >= 0 for x in news[q]) and
                       min(x for x in olds[q] if x >= 0) > 0)
    if ratios:
        print(f"median per-query ratio over {len(ratios)} common queries: "
              f"{ratios[len(ratios) // 2]:.3f}")
    if dropped:
        print(f"queries only in one run (ignored): {', '.join(dropped)}")
    for tag, rows in (("REGRESSION", regressions), ("improvement", improvements)):
        for q, olo, ohi, nlo, nhi in rows:
            print(f"{tag}: {q}  old [{olo:.2f}, {ohi:.2f}]s → "
                  f"new [{nlo:.2f}, {nhi:.2f}]s (ranges disjoint)")
    if not regressions:
        print("no per-query regressions (all rep ranges overlap or shifts "
              "are immaterial)")
    return 1 if regressions else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
