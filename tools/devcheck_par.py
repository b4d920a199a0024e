#!/usr/bin/env python3
"""Parallel per-query driver for devcheck.py with a per-query timeout —
needed for the sf1 gate, where a handful of deliberately-quadratic
DuckDB verification oracles (fine at sf0.01) need isolation so one
slow oracle cannot stall the whole 294-row pass. Each query runs in
its own devcheck.py process; records merge into one JSON in the
CORRECTNESS_r{N} shape, timeouts recorded as err=oracle_timeout for a
follow-up pass with a bigger budget.

Usage: python3 tools/devcheck_par.py SFDIR OUTDIR RECORD.json [timeout_s] [workers]
"""
import concurrent.futures as cf
import json
import os
import subprocess
import sys

sf, outdir, record_path = sys.argv[1], sys.argv[2], sys.argv[3]
budget = int(sys.argv[4]) if len(sys.argv) > 4 else 600
workers = int(sys.argv[5]) if len(sys.argv) > 5 else 4
here = os.path.dirname(os.path.abspath(__file__))
devcheck = os.path.join(os.path.dirname(here), "devcheck.py")

names = sorted(json.load(open(f"{outdir}/oracle_sql.json")))
record = {}
# resume: completed rows are kept; timeout rows are retried only when
# DEVCHECK_RETRY_TIMEOUTS=1 (a retry burns the full budget again)
retry_t = os.environ.get("DEVCHECK_RETRY_TIMEOUTS", "0") == "1"
if os.path.exists(record_path):
    record = json.load(open(record_path))
    done = {k for k, v in record.items()
            if not (retry_t and str(v.get("err") or "") == "oracle_timeout")}
    names = [n for n in names if n not in done]
    print(f"resume: {len(done)} done, {len(names)} to go", flush=True)

def run(name):
    # PID-keyed so two concurrent gate runs (e.g. sf0.1 and sf1 in
    # parallel) never read each other's per-query files (round-11 ADVICE)
    tmp = f"/tmp/devcheck_one_{os.getpid()}_{name}.json"
    try:
        p = subprocess.run(
            [sys.executable, devcheck, sf, outdir, "--json", tmp, name],
            capture_output=True, text=True, timeout=budget)
        rec = json.load(open(tmp)) if os.path.exists(tmp) else {}
        os.path.exists(tmp) and os.remove(tmp)
        if name in rec:
            return name, rec[name], p.stdout.strip()
        return name, {"rows_match": False, "schema_match": False,
                      "hash_match": False, "spark_rows": None,
                      "oracle_rows": None,
                      "err": (p.stdout + p.stderr)[-300:]}, p.stdout.strip()
    except subprocess.TimeoutExpired:
        return name, {"rows_match": False, "schema_match": False,
                      "hash_match": False, "spark_rows": None,
                      "oracle_rows": None, "err": "oracle_timeout"}, "TIMEOUT"

n_done = 0
with cf.ThreadPoolExecutor(max_workers=workers) as ex:
    for name, rec, out in ex.map(run, names):
        record[name] = rec
        n_done += 1
        ok = rec.get("hash_match") and rec.get("rows_match") and not rec.get("err")
        if not ok or n_done % 25 == 0:
            print(f"[{n_done}/{len(names)}] {name}: "
                  f"{'PASS' if ok else 'FAIL ' + str(rec.get('err'))[:120]}",
                  flush=True)
        with open(record_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)

n_pass = sum(1 for v in record.values()
             if v.get("hash_match") and v.get("rows_match")
             and v.get("schema_match") and not v.get("err"))
print(f"devcheck_par: {n_pass}/{len(record)} pass")
