#!/usr/bin/env python
"""Compare two bench JSON outputs (plans/rXX/*.json or raw bench
lines): per-query before/after with speedups, for the round's
OPTIMIZATION notes. Usage: bench_diff.py BEFORE.json AFTER.json"""

import json
import math
import sys


def load(p):
    d = json.load(open(p))
    d = d.get("parsed", d)
    return {**d.get("queries", {}), **d.get("extra", {})}, d


def main():
    a, da = load(sys.argv[1])
    b, db = load(sys.argv[2])
    rats = []
    print(f"{'query':22s} {'before':>9s} {'after':>9s} {'speedup':>8s}")
    for k in a:
        if k in b and a[k] and b[k]:
            r = a[k] / b[k]
            rats.append(r)
            print(f"{k:22s} {a[k]:9.3f} {b[k]:9.3f} {r:8.2f}x")
    for k in sorted(set(b) - set(a)):
        print(f"{k:22s} {'-':>9s} {b[k]:9.3f}   (new)")
    g = math.exp(sum(math.log(r) for r in rats) / len(rats))
    print(f"\nB-total: {sum(da.get('queries', {}).values()):.3f} -> "
          f"{sum(db.get('queries', {}).values()):.3f}; "
          f"geomean speedup over {len(rats)} common entries: {g:.2f}x")


if __name__ == "__main__":
    main()
