#!/usr/bin/env python3
"""Calm-window bench launcher.

The round-10 afternoon box shows sporadic multi-minute contention
windows (ambient lf 1.1-1.25, occasionally steal > 2%) that unqualify
otherwise-clean records. This watcher self-anchors a 1-thread CPU
probe (min over the session = quiet floor), waits until two
consecutive probes sit within TOL of the floor with zero hypervisor
steal, then fires one full graft.Bench run and qualifies it with
benchcheck. First QUALIFIED record wins and is copied to the target
path; unqualified attempts leave the watcher looping until the
attempt/time budget runs out.

Usage: python3 tools/quietrun.py <sfDir> <outRecord> [maxMinutes] [mode]
       python3 tools/quietrun.py check-sf1 <record>

mode 'sf01' (default) qualifies with tools/benchcheck.py (including the
per-query reference scan — sf0.1 floors). mode 'sf1' qualifies on the
record's own bracket metrics PLUS the per-query regression scan against
the committed BENCH_sf1.json (the per-query reference table is
sf0.1-specific; the sf1 exponent gate is scalecheck + SCALE.md).

`check-sf1 <record>` runs ONLY the sf1 self-qualification gate over an
existing record file and exits 0/1 — the hook BenchFormatSpec's negative
controls drive, so a refactor that defangs one of the gate's rejection
paths (lf, steal, nfailed, the >5-regressions scan) fails the unit suite
instead of silently admitting the next bandwidth-poisoned run.
"""
import json
import os
import subprocess
import sys
import time

SPIN_N = 6_000_000
TOL = 1.06
BW_TOL = 1.20
PROBE_SLEEP = 45


def spin() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(SPIN_N):
        acc = (acc * 1099511628211 + i) & ((1 << 64) - 1)
    return time.perf_counter() - t0


_BW_BUF = None


def bw_probe() -> float:
    """Memory-BANDWIDTH probe: the round-10c control experiment proved
    the damaging co-tenant saturates the memory controllers (shingle
    queries 4-6x, ALU-bound 1.3x, cache-resident spin ~1.3x), so a calm
    gate on the spin probe alone admits bandwidth-poisoned windows.
    Stream 256 MB through numpy sum — cache-defeating, ~25 ms quiet."""
    global _BW_BUF
    import numpy as np
    if _BW_BUF is None:
        _BW_BUF = np.arange(32_000_000, dtype=np.int64)
    t0 = time.perf_counter()
    _BW_BUF.sum()
    _BW_BUF.sum()
    return time.perf_counter() - t0


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[6])


def _parse(text):
    total, queries = None, {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            return None, {}
        if rec.get("metric") == "total":
            total = rec
        if isinstance(rec.get("queries"), dict):
            queries.update(rec["queries"])
    return total, queries


def self_qualified(path: str) -> bool:
    """sf1-mode gate: bracket metrics PLUS a per-query regression scan
    against the committed sf1 record. The brackets alone are blind to a
    bandwidth co-tenant that roams mid-run (round 11: an attempt read
    lf 1.014 while the shingle-dedup family ran 3.5-5.1x its committed
    sf1 level — the round-10 signature, invisible to CPU probes). Any
    query already covered by HEAD's BENCH_sf1.json must not read >2x
    its committed value (+0.3 s slack); more than 5 such regressions
    rejects the attempt."""
    with open(path) as f:
        total, queries = _parse(f.read())
    if not total:
        return False
    ok = (total.get("nfailed", 1) == 0
          and 0 < total.get("load_factor", 9) <= 1.05
          and total.get("steal_pct", 1) <= 0.02)
    regress = []
    try:
        head = subprocess.run(
            ["git", "show", "HEAD:BENCH_sf1.json"],
            capture_output=True, text=True, timeout=10)
        if head.returncode == 0:
            _, old = _parse(head.stdout)
            regress = [(k, queries[k], old[k]) for k in queries
                       if k in old and queries[k] > old[k] * 2 + 0.3]
    except (OSError, subprocess.SubprocessError):
        pass
    if len(regress) > 5:
        ok = False
        worst = sorted(regress, key=lambda t: t[1] / t[2], reverse=True)
        print("  regressions vs committed sf1 record: "
              + ", ".join(f"{k} {v:.1f}s/{o:.1f}s" for k, v, o in worst[:6]),
              flush=True)
    print(f"self-qualify: lf={total.get('load_factor'):.3f} "
          f"steal={total.get('steal_pct'):.4f} "
          f"nfailed={total.get('nfailed')} "
          f"regressed={len(regress)} -> {'OK' if ok else 'REJECT'}",
          flush=True)
    return ok


FLOOR_WINDOW = 20  # probes; ~15 min of history
BLIND_EVERY = 18   # non-calm probes between probe-blind attempts


def main() -> int:
    if sys.argv[1] == "check-sf1":
        return 0 if self_qualified(sys.argv[2]) else 1
    sf_dir, out_record = sys.argv[1], sys.argv[2]
    budget_s = float(sys.argv[3]) * 60 if len(sys.argv) > 3 else 3000
    mode = sys.argv[4] if len(sys.argv) > 4 else "sf01"
    t_start = time.time()
    # ROLLING floors (min over the last FLOOR_WINDOW probes), not
    # session mins: one outlier-fast probe during a brief idle moment
    # otherwise poisons the TOL gate for the rest of a hostile session
    # (observed round 11: floor 0.441 from a single reading, ambient
    # 0.52-0.66 forever after -> zero attempts in 50 minutes).
    import collections
    hist = collections.deque([min(spin() for _ in range(3))],
                             maxlen=FLOOR_WINDOW)
    bw_hist = collections.deque([min(bw_probe() for _ in range(3))],
                                maxlen=FLOOR_WINDOW)
    calm_streak = 0
    stale = 0  # non-calm probes since the last attempt
    attempt = 0
    while time.time() - t_start < budget_s:
        s0 = steal_ticks()
        p = spin()
        bw = bw_probe()
        stole = steal_ticks() - s0
        hist.append(p)
        bw_hist.append(bw)
        floor = min(hist)
        bw_floor = min(bw_hist)
        calm = (p <= floor * TOL and bw <= bw_floor * BW_TOL
                and stole == 0)
        calm_streak = calm_streak + 1 if calm else 0
        stale = 0 if calm else stale + 1
        print(f"probe {p:.3f}s floor {floor:.3f} "
              f"bw {bw * 1000:.1f}ms bwfloor {bw_floor * 1000:.1f} "
              f"steal {stole} streak {calm_streak}", flush=True)
        # Probe-blind fallback: on a day with no probe-calm window, an
        # attempt every ~BLIND_EVERY probes costs a few box-minutes and
        # lets benchcheck (the real gate: parallel calib brackets +
        # steal delta + per-query reference scan) judge windows the
        # 1-thread probes misread. A rejected attempt changes nothing.
        blind = stale >= BLIND_EVERY
        if calm_streak >= 2 or blind:
            attempt += 1
            stale = 0
            print(f"attempt {attempt}: launching bench"
                  + (" (probe-blind)" if blind else ""), flush=True)
            tmp = f"/tmp/quietrun_attempt{attempt}.json"
            env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                       SPARK_GRAFT_BENCH_OUT=tmp)
            subprocess.run(["tools/run.sh", "graft.Bench"], env=env,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL, check=False)
            if mode == "sf1":
                rc = 0 if self_qualified(tmp) else 1
            else:
                rc = subprocess.run(
                    [sys.executable, "tools/benchcheck.py", tmp]).returncode
            if rc == 0:
                with open(tmp) as f, open(out_record, "w") as g:
                    g.write(f.read())
                print(f"QUALIFIED on attempt {attempt} -> {out_record}",
                      flush=True)
                return 0
            calm_streak = 0
        time.sleep(PROBE_SLEEP)
    print("budget exhausted without a qualified record", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
