#!/usr/bin/env python3
"""Compute per-query scaling exponents from two Bench JSON lines.

Usage: exponents.py <bench_small.log> <bench_big.log> <decades>
  decades: log10 of the size ratio between the two runs (1.0 for 10x).

Exponent = log10(t_big / t_small) / decades; 1.0 = linear, 2.0 = quadratic.
Sub-linear values mean fixed overhead (job dispatch) still dominates.
"""
import json, math, sys


def last_json(path):
    with open(path) as f:
        lines = [l for l in f if l.startswith('{"metric"')]
    return json.loads(lines[-1])


def main():
    small, big, decades = sys.argv[1], sys.argv[2], float(sys.argv[3])
    s, b = last_json(small), last_json(big)
    sq, bq = s["queries"], b["queries"]
    rows = []
    for q in sorted(bq):
        if q in sq and sq[q] > 0:
            rows.append((q, sq[q], bq[q],
                         math.log10(bq[q] / sq[q]) / decades))
    rows.sort(key=lambda r: -r[2])
    print(f"{'query':28s} {'small_s':>8s} {'big_s':>8s} {'exponent':>9s}")
    for q, ts, tb, e in rows:
        print(f"{q:28s} {ts:8.3f} {tb:8.3f} {e:9.2f}")
    tot_s = sum(sq[q] for q, _, _, _ in rows)
    tot_b = sum(tb for _, _, tb, _ in rows)
    print(f"\ncommon queries: {len(rows)}; total {tot_s:.1f}s -> "
          f"{tot_b:.1f}s; aggregate exponent "
          f"{math.log10(tot_b / tot_s) / decades:.2f}")
    fails = {k: v[:60] for k, v in b.get("failures", {}).items()}
    if fails:
        print("\nfailures at big sf:", json.dumps(fails, indent=1))


if __name__ == "__main__":
    main()
