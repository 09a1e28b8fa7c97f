#!/usr/bin/env python3
"""Two-point scale-ratio table for the heavy-query family.

Usage: python3 scripts/scale_ratios.py <bench_sf01.json> <bench_sf1.json> <bench_sf10.json>

Prints per-query seconds at sf0.1 / sf1 / sf10 (all measured in the
SAME host window — absolute cross-window comparisons are banned by
CLAUDE.md) and the two decade ratios r1 = sf1/sf0.1, r10 = sf10/sf1.
Sublinearity evidence = r10 <= ~r1 per query; a query whose r10 far
exceeds r1 has a superlinear term (expected only for the simhash
banding family, whose candidate count is N^2/2^16 by construction).
"""
import json, sys

def load(p):
    return json.load(open(p))["queries"]

a, b, c = (load(p) for p in sys.argv[1:4])
common = [q for q in c if q in a and q in b]
print(f"{'query':26s}{'sf0.1':>8s}{'sf1':>8s}{'sf10':>9s}{'r1':>7s}{'r10':>7s}")
for q in sorted(common):
    t1, t2, t3 = a[q], b[q], c[q]
    r1 = t2 / t1 if t1 > 0 else float("nan")
    r10 = t3 / t2 if t2 > 0 else float("nan")
    flag = "  <-- superlinear" if r10 > max(2 * r1, r1 + 5) else ""
    print(f"{q:26s}{t1:8.2f}{t2:8.2f}{t3:9.2f}{r1:7.1f}{r10:7.1f}{flag}")
