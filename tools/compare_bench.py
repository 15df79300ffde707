#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs the 10x rehearsal) and
flag super-linear queries.

Usage: python3 tools/compare_bench.py small.json big.json [factor]

`factor` is the data-size ratio between the runs (default 10). A query
is flagged when big/small exceeds the factor with headroom (2x) AND the
two runs' spread intervals do not overlap after scaling — i.e. the
growth clears the noise floor the bench itself reports.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q, t_small in sorted(small["queries"].items()):
        t_big = big["queries"].get(q)
        if t_big is None or t_small <= 0 or t_big <= 0:
            continue
        ratio = t_big / t_small
        s_lo, s_hi = small.get("spread", {}).get(q, [t_small, t_small])
        b_lo, b_hi = big.get("spread", {}).get(q, [t_big, t_big])
        # worst-case-favorable ratio: fastest big run over slowest small
        lo_ratio = b_lo / s_hi if s_hi > 0 else float("inf")
        flag = ratio > 2 * factor and lo_ratio > factor
        rows.append((q, t_small, t_big, ratio, flag))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':32s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for q, a, b, r, flag in rows:
        mark = "  <-- SUPER-LINEAR" if flag else ""
        print(f"{q:32s} {a:8.3f} {b:8.3f} {r:7.2f}{mark}")
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\n{'TOTAL':32s} {tot_s:8.3f} {tot_b:8.3f} {tot_b / tot_s:7.2f}")
    print(f"(data factor {factor:g}; flag = ratio > {2 * factor:g} "
          "and spreads disjoint after scaling)")


if __name__ == "__main__":
    main()
