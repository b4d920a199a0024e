#!/usr/bin/env python3
"""Self-enforcing scale gate (VERDICT r9 item 4): compare a small-SF and
a 10x-SF bench record and FAIL (exit 1) if any non-exempt query's time
grows more than THRESH x — turning the round-9 one-time soak measurement
into a runnable check. Also writes the full growth table as a JSON
artifact (committed as SCALE_GROWTH.json) so the measurement is a
checked record, not SURVEY prose.

Usage:
  python3 tools/scale_gate.py BENCH_small.json BENCH_big.json [OUT.json]

Exemptions are the two documented weak-by-design quadratic shapes, each
with a green scale path shipped beside it (decision recorded on the
QueryDef and in SURVEY §7.13):
  e_cosine_near_dup — label-blocked all-pairs cosine, the brief's own
    brute-force baseline (measured 39x at 10x; e_semantic_dedup and the
    ANN family are the scale paths)
  e_semantic_dedup  — 12.9x measured, single-pass-vs-min-of-3 noise on a
    0.29 s base; kept on the exempt list so bench-noise near the line
    cannot flake the gate (its kernel is k ∝ n, verified oracle-exact
    at sf1 in round 9)
"""
import json
import sys

THRESH = 15.0
# Ratio flags only apply above an absolute floor on the big side:
# a lane that costs ~3 s at 10x data is constant/overhead-dominated,
# and a ratio on a ~0.1 s base measures bench noise, not plan shape —
# d_bpe_tokens is the motivating case (sf1 time stable at 2.9-3.0 s
# across rounds 9 and 10 while its sf0.1 base halved from unrelated
# harness speedups, swinging the ratio 10.7x -> 19.9x with zero change
# in scale behavior).
MIN_BIG_S = 3.0
EXEMPT = {"e_cosine_near_dup", "e_semantic_dedup"}


def load(path):
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue  # JVM GC warnings share stdout with the record
            if isinstance(d, dict) and "queries" in d:
                return d
    raise SystemExit(f"no detailed record in {path}")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    table = {}
    violations = []
    for q in qs:
        s, b = small["queries"][q], big["queries"][q]
        g = b / s if s > 0 else float("inf")
        table[q] = {"small_s": round(s, 3), "big_s": round(b, 3),
                    "growth": round(g, 2), "exempt": q in EXEMPT}
        if g > THRESH and b >= MIN_BIG_S and q not in EXEMPT:
            violations.append((g, q))
    tot_s = sum(small["queries"][q] for q in qs)
    tot_b = sum(big["queries"][q] for q in qs)
    record = {
        "thresh": THRESH,
        "min_big_s": MIN_BIG_S,
        "exempt": sorted(EXEMPT),
        "n_queries": len(qs),
        "total_small_s": round(tot_s, 1),
        "total_big_s": round(tot_b, 1),
        "total_growth": round(tot_b / tot_s, 2),
        "violations": [q for _, q in sorted(violations, reverse=True)],
        "queries": table,
    }
    if out:
        with open(out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    worst = sorted(((v["growth"], q) for q, v in table.items()), reverse=True)[:8]
    for g, q in worst:
        mark = (" (exempt)" if q in EXEMPT
                else (" <-- FLAG" if g > THRESH and table[q]["big_s"] >= MIN_BIG_S
                      else (" (under floor)" if g > THRESH else "")))
        print(f"{g:8.2f}x  {q}{mark}")
    print(f"totals: {tot_s:.1f}s -> {tot_b:.1f}s ({tot_b / tot_s:.2f}x) "
          f"over {len(qs)} queries")
    if violations:
        print(f"SCALE GATE FAIL: {len(violations)} non-exempt queries above "
              f"{THRESH}x: {[q for _, q in violations]}")
        sys.exit(1)
    print(f"SCALE GATE PASS (exemptions: {sorted(EXEMPT)})")


# ---------------------------------------------------------------------------
# Curve mode (VERDICT r10 item 4): a 2-point 10x ratio can hide an n^2
# term behind a constant floor — a lane 80% overhead + 20% quadratic
# shows ~2.5x at 10x and "passes". Three points expose curvature: fit
# the growth EXPONENT p between the two LARGEST factors (where the
# constant floor is most amortized): p = log(t_hi/t_mid)/log(f_hi/f_mid).
# Linear -> p ~= 1, quadratic -> p ~= 2. Fail on p > P_THRESH for lanes
# whose biggest-point time clears an absolute floor (a ratio on a 2 s
# base at 30x data still measures overhead, not plan shape).
#
# Usage:
#   python3 tools/scale_gate.py curve SMALL.json:1 MID.json:10 BIG.json:30 \
#       [OUT.json]
# OUT.json gains a "curve" table: per-lane times at each factor, the
# 10x and 30x growth columns, and the fitted tail exponent.

P_THRESH = 1.5
CURVE_MIN_BIG_S = 5.0


def curve_main(argv):
    import math
    pts = []          # (factor, record) sorted by factor
    out = None
    for a in argv:
        if ":" in a and a.rsplit(":", 1)[1].replace(".", "").isdigit():
            path, f = a.rsplit(":", 1)
            pts.append((float(f), load(path)))
        else:
            out = a
    pts.sort(key=lambda x: x[0])
    if len(pts) < 3:
        raise SystemExit("curve mode needs >= 3 FILE:factor points")
    factors = [f for f, _ in pts]
    # Per-lane point availability: deeper-regime records (e.g. the 100x
    # run of the three highest-exponent lanes) cover a subset — fit each
    # lane on the points it HAS (>= 3 required), with the tail exponent
    # always between that lane's two LARGEST factors, so a lane with a
    # 100x point is judged one decade deeper than the rest.
    qs = sorted(set.union(*(set(r["queries"]) for _, r in pts)))
    table = {}
    violations = []
    skipped = {}   # lanes with < 3 points get no exponent gate — record
    for q in qs:   # them visibly instead of letting missing coverage
        have = [(f, r["queries"][q]) for f, r in pts if q in r["queries"]]
        if len(have) < 3:  # read as passing (no-silent-caps convention)
            skipped[q] = [f for f, _ in have]
            continue
        fs = [f for f, _ in have]
        ts = [t for _, t in have]
        (f_mid, t_mid), (f_hi, t_hi) = have[-2], have[-1]
        p = (math.log(t_hi / t_mid) / math.log(f_hi / f_mid)
             if t_mid > 0 and t_hi > 0 else float("inf"))
        row = {"factors": fs,
               "times_s": [round(t, 3) for t in ts],
               "growth_mid": round(ts[-2] / ts[0], 2) if ts[0] > 0 else None,
               "growth_big": round(ts[-1] / ts[0], 2) if ts[0] > 0 else None,
               "tail_exponent": round(p, 3),
               "exempt": q in EXEMPT}
        table[q] = row
        if p > P_THRESH and t_hi >= CURVE_MIN_BIG_S and q not in EXEMPT:
            violations.append((p, q))
    print(f"{'p(tail)':>8} {'fit@':>9} {'t_first':>8} {'t_mid':>8} {'t_last':>8}  query")
    for q in sorted(table, key=lambda q: -table[q]["tail_exponent"]):
        r = table[q]
        mark = ""
        if r["tail_exponent"] > P_THRESH:
            mark = (" (exempt)" if r["exempt"]
                    else (" <-- FLAG" if r["times_s"][-1] >= CURVE_MIN_BIG_S
                          else " (under floor)"))
        fit = f"{int(r['factors'][-2])}-{int(r['factors'][-1])}x"
        print(f"{r['tail_exponent']:8.3f} {fit:>9} {r['times_s'][0]:8.3f} "
              f"{r['times_s'][-2]:8.3f} {r['times_s'][-1]:8.3f}  {q}{mark}")
    if skipped:
        print(f"SKIPPED (fewer than 3 curve points, NOT gated): "
              f"{ {q: fs for q, fs in sorted(skipped.items())} }")
    if out:
        record = {"p_thresh": P_THRESH, "min_big_s": CURVE_MIN_BIG_S,
                  "factors": factors, "n_queries": len(qs),
                  "violations": [q for _, q in sorted(violations, reverse=True)],
                  "skipped_underscoped": skipped,
                  "queries": table}
        with open(out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    if violations:
        print(f"CURVE GATE FAIL: {len(violations)} non-exempt lanes with tail "
              f"exponent > {P_THRESH}: {[q for _, q in violations]}")
        sys.exit(1)
    print(f"CURVE GATE PASS over {len(qs)} lanes "
          f"(p_thresh={P_THRESH}, floor={CURVE_MIN_BIG_S}s)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "curve":
        curve_main(sys.argv[2:])
    else:
        main()
