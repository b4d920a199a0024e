#!/usr/bin/env python3
"""Compare two Bench JSON records (e.g. sf0.1 vs sf1) and print per-query
growth factors, flagging queries whose time grows more than THRESH x at
10x data (VERDICT r8 item 1). Usage:
  python3 tools/scale_growth.py BENCH_small.json BENCH_big.json [thresh]
Each file: first line of bench_out.json (the detailed record).
"""
import json, sys

def load(path):
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no detailed record in {path}")

small = load(sys.argv[1])
big = load(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
qs = sorted(set(small["queries"]) & set(big["queries"]))
rows = []
for q in qs:
    s, b = small["queries"][q], big["queries"][q]
    rows.append((b / s if s > 0 else float("inf"), s, b, q))
rows.sort(reverse=True)
print(f"{'growth':>8} {'small_s':>9} {'big_s':>9}  query")
flagged = 0
for g, s, b, q in rows:
    mark = " <-- FLAG" if g > thresh else ""
    if g > thresh:
        flagged += 1
    if g > thresh or rows.index((g, s, b, q)) < 25:
        print(f"{g:8.2f} {s:9.3f} {b:9.3f}  {q}{mark}")
tot_s = sum(small["queries"][q] for q in qs)
tot_b = sum(big["queries"][q] for q in qs)
print(f"\ntotals: {tot_s:.1f}s -> {tot_b:.1f}s ({tot_b/tot_s:.2f}x) over {len(qs)} queries; "
      f"{flagged} queries above {thresh}x")
