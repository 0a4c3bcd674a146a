#!/usr/bin/env python3
"""Same-window sf0.1/sf1 solo ratio pairs — the contention-robust sf1
evidence path (SCALE.md round-12 technique, scripted for round 13).

For each requested query batch, runs graft.Bench solo at sf0.1 then at
sf1 BACK-TO-BACK (one pair), twice, logging the per-query timings plus
the runs' own calibration brackets. The RATIO sf1/sf0.1 divides out
box-wide contention that hits both halves of a pair equally; two pairs
expose windows where it didn't (drift between halves). Exponent =
log10(ratio) at the 10x scale step. Not a bench record — a scaling
measurement for SCALE.md; the merged/full sf1 record remains the
gold path when the box allows one.

Usage: ratiopairs.py <sf01Dir> <sf1Dir> <outJsonl> <query,query,...>
       [pairs=2] [batch=4]
"""
import json
import os
import subprocess
import sys
import time


def run_bench(sf_dir, names, out):
    # a bench that dies before writing must read as "no artifact", not
    # as the PREVIOUS run's numbers (same stale-artifact hole quietrun
    # closed in round 15)
    try:
        os.unlink(out)
    except OSError:
        pass
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_OUT=out)
    subprocess.run(["tools/run.sh", "graft.Bench"], env=env,
                   stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL, check=False)
    total, queries = None, {}
    try:
        with open(out) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("metric") == "total":
                    total = rec
                if isinstance(rec.get("queries"), dict):
                    queries.update(rec["queries"])
    except OSError:
        pass
    return total, queries


def main():
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    sf01, sf1, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = [q for q in sys.argv[4].split(",") if q]
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    batch = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    batches = [queries[i:i + batch] for i in range(0, len(queries), batch)]
    with open(out_path, "a") as log:
        for bi, names in enumerate(batches):
            for p in range(pairs):
                t01, q01 = run_bench(sf01, names, f"/tmp/rp_{bi}_{p}_a.json")
                t1, q1 = run_bench(sf1, names, f"/tmp/rp_{bi}_{p}_b.json")
                rec = {
                    "batch": names, "pair": p,
                    "wall": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "sf01": {k: q01.get(k) for k in names},
                    "sf1": {k: q1.get(k) for k in names},
                    "lf01": (t01 or {}).get("load_factor"),
                    "lf1": (t1 or {}).get("load_factor"),
                    "steal01": (t01 or {}).get("steal_pct"),
                    "steal1": (t1 or {}).get("steal_pct"),
                    # each half's own bandwidth brackets (and the calm
                    # wait's verdict when armed) — a SCALE.md pair entry
                    # needs BOTH halves' <=40ms provenance on its face
                    "bw01": [(t01 or {}).get("calib_bw_start"),
                             (t01 or {}).get("calib_bw_end")],
                    "bw1": [(t1 or {}).get("calib_bw_start"),
                            (t1 or {}).get("calib_bw_end")],
                    "wait01": (t01 or {}).get("calm_wait"),
                    "wait1": (t1 or {}).get("calm_wait"),
                }
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(f"batch {bi} pair {p}: " + ", ".join(
                    f"{k} {q01.get(k, -1):.2f}->{q1.get(k, -1):.2f}"
                    for k in names), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
