#!/usr/bin/env python3
"""Round-5 drift analysis (VERDICT r4 'Next #1'): compare catalog-only bench runs
against the round-3 and round-4 quiet-epoch baselines on their SHARED query sets,
taking the per-query MINIMUM across this round's runs (min-of-N per query is the
documented estimator under one-sided contention noise).

Usage: drift_analysis.py run1.json|log [run2 ...]
Accepts raw bench log files (extracts the JSON line) or bench JSON artifacts.
"""
import json, re, sys


def load(path):
    txt = open(path, errors="replace").read()
    m = re.search(r'\{"metric":"total".*\}', txt)
    if not m:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(m.group(0))["queries"]


def main():
    runs = [load(p) for p in sys.argv[1:]]
    # union across runs (a query present only in later runs still counts), and a
    # query with no usable (>= 0) time anywhere is reported, not a min() crash
    names = set().union(*runs)
    minima = {}
    for q in sorted(names):
        vals = [r[q] for r in runs if q in r and r[q] >= 0]
        if vals:
            minima[q] = min(vals)
        else:
            print(f"WARNING: {q} has no usable time in any run (skipped/failed)")
    names = set(minima)

    r3 = load("bench/bench_round3_76q_full.json")
    r4 = load("bench/bench_round4_102q_catalog.json")

    for base, label in [(r3, "round-3 quiet (76q full run)"),
                        (r4, "round-4 quiet (102q catalog)")]:
        shared = sorted(set(base) & names)
        b = sum(base[q] for q in shared)
        n = sum(minima[q] for q in shared)
        print(f"vs {label}: shared={len(shared)} base={b:.1f}s now(min-of-{len(runs)})="
              f"{n:.1f}s ratio={n/b:.3f}")
        worst = sorted(shared, key=lambda q: minima[q] - base[q], reverse=True)[:8]
        for q in worst:
            print(f"  {q:28s} {base[q]:7.2f} -> {minima[q]:7.2f}  ({minima[q]/max(base[q],0.01):5.2f}x)")
    new = sorted(names - set(r4))
    print(f"new-in-round-5 queries: {[(q, round(minima[q],2)) for q in new]}")
    print(f"total (min-of-N, all {len(names)}): {sum(minima.values()):.1f}s")


if __name__ == "__main__":
    main()
