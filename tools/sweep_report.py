#!/usr/bin/env python3
"""Merge two Bench `bench_full.json` artifacts (a smaller and a larger
scale factor) into the growth-slope table the scale story is graded on:
per-query wall time at both SFs, the time ratio, and the growth slope
(time ratio / data ratio — <= 1.0 is at-or-below linear scaling).

Usage: sweep_report.py small.json big.json data_ratio [out.json]
Prints a markdown table to stdout; optionally writes the merged JSON.
"""
import json
import statistics
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3])
    a, b = small["queries"], big["queries"]
    shared = sorted(set(a) & set(b))
    if not shared:
        sys.exit("no shared queries between the two bench artifacts")
    rows = [
        {
            "query": k,
            "t_small": round(a[k], 3),
            "t_big": round(b[k], 3),
            "ratio": round(b[k] / a[k], 2),
            "slope": round(b[k] / a[k] / data_ratio, 3),
        }
        for k in shared
    ]
    rows.sort(key=lambda r: -r["slope"])
    tot_a = sum(a[k] for k in shared)
    tot_b = sum(b[k] for k in shared)
    merged = {
        "sf_small": small.get("sf"),
        "sf_big": big.get("sf"),
        "data_ratio": data_ratio,
        "total_small_sec": round(tot_a, 1),
        "total_big_sec": round(tot_b, 1),
        "total_ratio": round(tot_b / tot_a, 2),
        "median_slope": round(statistics.median(r["slope"] for r in rows), 3),
        "queries": rows,
    }
    if len(sys.argv) > 4:
        json.dump(merged, open(sys.argv[4], "w"), indent=1)
    print(f"| query | {small.get('sf','small')} s | {big.get('sf','big')} s "
          "| ratio | slope |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['t_small']:.2f} | {r['t_big']:.2f} "
              f"| {r['ratio']:.1f} | {r['slope']:.2f} |")
    print(f"\ntotals: {tot_a:.1f}s -> {tot_b:.1f}s "
          f"({tot_b / tot_a:.2f}x on {data_ratio:.0f}x data); "
          f"median slope {merged['median_slope']:.3f}")


if __name__ == "__main__":
    main()
