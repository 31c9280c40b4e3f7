#!/usr/bin/env python3
"""Per-FAMILY scaling ratios between two full Bench runs (e.g. sf0.1 vs
a 10x copy). Complements scaling_axis.py's per-query top-N view with
the family rollup the round report needs: every query is bucketed by
its name prefix (q* = tpch, ds_*, doc_*, embed_*, ...), each family's
total time on both axes is summed, and the ratio printed. Queries
under the noise floor on the LARGE axis are still summed (family
totals stay honest) but flagged counts use the same 0.5 s floor as
scaling_axis.py.

Usage:
  python3 tools/family_axis.py /tmp/bench_sf01_full.json /tmp/bench_10x_full.json 10
"""
import json
import re
import sys


def family(q):
    if re.match(r"q\d+_", q):
        return "tpch"
    return q.split("_")[0]


def main(small_path, big_path, data_ratio):
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    fams = {}
    for q, tb in big.items():
        ts = small.get(q)
        if ts is None:
            continue
        f = fams.setdefault(family(q), [0.0, 0.0, 0, []])
        f[0] += ts
        f[1] += tb
        f[2] += 1
        if tb >= 0.5 and ts > 0 and tb / ts > data_ratio * 1.3:
            f[3].append((q, ts, tb, tb / ts))
    print(f"| family | n | t(1x) s | t({data_ratio:g}x) s | ratio | "
          f"superlinear members |")
    print("|---|---|---|---|---|---|")
    for name in sorted(fams, key=lambda n: -fams[n][1]):
        ts, tb, n, sup = fams[name]
        suptxt = ", ".join(f"{q} {r:.0f}x" for q, _, _, r in sup) or "—"
        print(f"| {name} | {n} | {ts:.1f} | {tb:.1f} | "
              f"{tb / ts:.1f}x | {suptxt} |")
    tot_s = sum(f[0] for f in fams.values())
    tot_b = sum(f[1] for f in fams.values())
    print(f"\ntotal {tot_s:.1f} s -> {tot_b:.1f} s = "
          f"{tot_b / tot_s:.1f}x for {data_ratio:g}x data")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
