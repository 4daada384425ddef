#!/usr/bin/env python3
"""Compare two Bench JSON lines per-query: ratios, spreads, and the
gc/load telemetry for slow runs. Usage:
  python3 scripts/bench_compare.py BENCH_r10.json bench_result.json"""
import json, sys

def load(p):
    with open(p) as f:
        return json.loads(f.read().strip().splitlines()[-1])

a, b = load(sys.argv[1]), load(sys.argv[2])
qa, qb = a.get("queries", {}), b.get("queries", {})
common = [k for k in qb if k in qa and qa[k] > 0 and qb[k] > 0]
print(f"{'query':26s} {'old':>7s} {'new':>7s} {'ratio':>6s} {'spread':>7s}")
tot_a = tot_b = 0.0
worst = []
for k in sorted(common, key=lambda k: -(qb[k] / qa[k])):
    runs = [r for r in b.get("runs", {}).get(k, []) if r > 0]
    spread = (max(runs) / min(runs)) if runs else 0
    r = qb[k] / qa[k]
    tot_a += qa[k]; tot_b += qb[k]
    flag = " <<<" if r > 1.5 or spread > 1.3 else ""
    print(f"{k:26s} {qa[k]:7.2f} {qb[k]:7.2f} {r:6.2f} {spread:7.2f}{flag}")
    if r > 1.5:
        worst.append(k)
if tot_a > 0:
    print(f"\ncommon-set totals: old {tot_a:.1f}s new {tot_b:.1f}s "
          f"ratio {tot_b/tot_a:.2f}")
else:
    print("\nno positive-timed common queries between the two artifacts")
new_only = sorted(set(qb) - set(qa))
if new_only:
    print("new lines:", {k: round(qb[k], 2) for k in new_only})
if worst:
    print("REGRESSED >1.5x:", worst)
