#!/usr/bin/env python3
"""Compare two Bench runs (e.g. sf0.1 vs a 10x copy ~ sf1) and print the
per-query scaling factors for the most expensive queries — the local
proxy for the 100x claim: a query whose runtime grows much faster than
the data did needs a plan diagnosis.

Usage:
  python3 tools/scaling_axis.py /tmp/bench_sf01_full.json /tmp/bench_sf1_full.json 10 [topN]

Prints a markdown table of the topN queries by large-axis runtime with
small/large times and the time ratio vs the data ratio. Queries under
0.5 s on the large axis are noise (JVM/job-scheduling floor dominates)
and are excluded from the table.
"""
import json, sys


def main(small_path, big_path, data_ratio, topn=12):
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    rows = []
    for q, tb in big.items():
        ts = small.get(q)
        if ts is None or tb < 0.5:
            continue
        rows.append((q, ts, tb, tb / ts))
    rows.sort(key=lambda r: -r[2])
    print(f"| query | t(1x) s | t({data_ratio}x) s | time ratio |")
    print("|---|---|---|---|")
    for q, ts, tb, r in rows[:topn]:
        flag = " **superlinear**" if r > data_ratio * 1.3 else ""
        print(f"| {q} | {ts:.2f} | {tb:.2f} | {r:.1f}x{flag} |")
    sup = [q for q, _, _, r in rows if r > data_ratio * 1.3]
    print(f"\ndata ratio {data_ratio}x; superlinear (>1.3x data ratio): "
          f"{sup if sup else 'none'}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]),
         int(sys.argv[4]) if len(sys.argv) > 4 else 12)
