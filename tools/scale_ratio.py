#!/usr/bin/env python3
"""Cohort analysis for the DESIGN.md scaling table: per-query sf0.1 -> sf1
ratios from two Bench artifacts (best sample per query — the honest per-query
cost; medians carry round-count asymmetry when sf1 runs 1 round)."""
import json
import sys

sf01 = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench_sf01.json"))
sf1 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "bench_sf1.json"))


def best(d, q):
    s = d["detail"].get(q, {}).get("samples")
    return min(s) if s else None


qs = sorted(set(sf01["detail"]) & set(sf1["detail"]))
rows = []
for q in qs:
    a, b = best(sf01, q), best(sf1, q)
    if a and b:
        rows.append((q, a, b, b / a))

floor = [r for r in rows if r[3] < 2]
linear = [r for r in rows if 2 <= r[3] < 20]
superl = [r for r in rows if r[3] >= 20]
for name, cohort in [("floor (<2x)", floor), ("linear (2-20x)", linear),
                     ("super-linear (>=20x)", superl)]:
    t01 = sum(r[1] for r in cohort)
    t1 = sum(r[2] for r in cohort)
    print(f"{name:22s} n={len(cohort):3d}  sf0.1={t01:7.1f}s  sf1={t1:7.1f}s")
ratios = sorted(r[3] for r in rows)
print(f"median per-query ratio: {ratios[len(ratios)//2]:.2f}x; "
      f"total {sum(r[1] for r in rows):.1f}s -> {sum(r[2] for r in rows):.1f}s "
      f"({sum(r[2] for r in rows)/sum(r[1] for r in rows):.2f}x) over {len(rows)} queries")
print("\nslowest sf1 (best-sample):")
for q, a, b, r in sorted(rows, key=lambda r: -r[2])[:12]:
    print(f"  {q:34s} {a:6.2f} -> {b:7.2f}s  ({r:5.1f}x)")
print("\nhighest ratios:")
for q, a, b, r in sorted(rows, key=lambda r: -r[3])[:12]:
    print(f"  {q:34s} {a:6.2f} -> {b:7.2f}s  ({r:5.1f}x)")
