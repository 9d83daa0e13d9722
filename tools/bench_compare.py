#!/usr/bin/env python3
"""Compare two Bench JSON lines (bench_last.json files).

Usage: python3 tools/bench_compare.py A.json B.json [top_n]

Prints total ratio and the top-N per-query swings — the first thing to
check when a sweep regresses: a uniform swing is host contention, a
single-query swing is a plan regression.
"""
import json
import sys

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    ta, tb = a["value"], b["value"]
    print(f"total: {ta:.1f}s -> {tb:.1f}s (ratio {max(ta,tb)/min(ta,tb):.2f})")
    rows = []
    for k, va in a["queries"].items():
        vb = b["queries"].get(k)
        if vb is None or va <= 0 or vb <= 0:
            print(f"  {k}: missing/failed (a={va}, b={vb})")
            continue
        rows.append((max(va, vb) / min(va, vb), k, va, vb))
    for r, k, va, vb in sorted(rows, reverse=True)[:top_n]:
        print(f"  {k:28s} {va:6.2f} -> {vb:6.2f}  ({r:.1f}x)")

if __name__ == "__main__":
    main()
