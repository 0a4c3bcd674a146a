#!/usr/bin/env python3
"""Bench-record qualifier: encode the "only trust similar-calib runs" policy.

Usage: python3 tools/benchcheck.py [BENCH_LAST.json]

Reads the persisted bench record (detail line + total line as written by
graft.Bench) and exits non-zero unless the run qualifies as a round
record:

  1. the total line parses and carries a positive "value" (the round-6
     artifact failure mode: an over-long final line truncated from the
     front left no parseable total);
  2. load_factor <= 1.05 — the CPU calib probes saw a quiet box;
  3. calib_io_end <= 0.18 — the warm-state IO probe is the stable one
     (0.12-0.17 on every settled record; io_START spans 0.19-0.33 even
     on settled boxes, so it is reported but advisory only);
  4. per-query contention scan vs tools/bench_reference.json (min-of-3
     quiet-box runs): more than MAX_INFLATED queries reading >1.5x their
     reference (+0.15 s absolute slack for sub-100 ms noise) is the
     documented mid-suite-contention signature. This is the check that
     would have caught round 6, where all four bracket probes read
     quiet (lf 0.88, io_end 0.124) yet 14 unchanged queries ran
     1.5-5.6x — probes bracket the suite; contention in the middle is
     invisible to them.

A run that fails 2-4 is not "wrong", it is UNQUALIFIED: re-run on a
quieter box before committing it as the round's record. If a query's
plan changed legitimately, update its entry in bench_reference.json in
the same commit, with the reason in the commit message.
"""
import json
import os
import subprocess
import sys

LOAD_FACTOR_MAX = 1.05
IO_END_MAX = 0.18
# Hypervisor steal fraction over the whole run (round 10: two sf1 runs
# read ~2.4x their quiet level with lf <= 1.03 — the host's noisy
# neighbor roamed BETWEEN the bracket probes, inflating disjoint query
# sets each run; /proc/stat steal delta catches exactly that). 2% of
# machine CPU-time stolen is already several seconds of a 32-thread
# suite minute.
STEAL_PCT_MAX = 0.02
# Memory-bandwidth bracket (round 14): the roaming co-tenant saturates
# the memory controllers while CPU/IO probes read calm (round 13: a
# full run read lf 0.92 with 39 queries 2-19x inflated; the 256 MB
# stream probe was the only bracket that saw it — ~25 ms quiet,
# 45-1000+ ms co-tenant). Bench records the in-JVM bracket as
# calib_bw_start/calib_bw_end; a qualified record needs BOTH under the
# same absolute cap the merge-sf1 gate uses. Missing bracket (legacy
# record or failed probe) refuses: a record must carry its own
# bandwidth evidence.
BW_MAX = 0.040
INFLATION_RATIO = 1.5
INFLATION_SLACK_SEC = 0.15
MAX_INFLATED = 5


def parse_record(text):
    """Return (total_dict_or_None, queries_map) from a bench record body."""
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


def count_inflated(queries, ref):
    return sum(1 for k, v in queries.items()
               if ref.get(k) and v > ref[k] * INFLATION_RATIO
               + INFLATION_SLACK_SEC)


def displacement_check(path, queries, total, ref):
    """BENCH.md record policy: canonical = best qualified committed record.

    When the checked file is a git-modified BENCH_LAST.json, qualify the
    committed HEAD version too and warn (non-fatal) if the working tree
    would displace a better-qualified record. Returns a warning string
    or None."""
    if os.path.basename(path) != "BENCH_LAST.json":
        return None
    try:
        repo_dir = os.path.dirname(os.path.abspath(path)) or "."
        head = subprocess.run(
            ["git", "-C", repo_dir, "show", "HEAD:BENCH_LAST.json"],
            capture_output=True, text=True, timeout=10)
        if head.returncode != 0:
            return None
        if head.stdout.strip() == open(path).read().strip():
            return None  # not modified
    except (OSError, subprocess.SubprocessError):
        return None
    head_total, head_queries = parse_record(head.stdout)
    if head_total is None or not head_queries:
        return None
    new_inf = count_inflated(queries, ref)
    old_inf = count_inflated(head_queries, ref)
    new_lf = total.get("load_factor", 1.0)
    old_lf = head_total.get("load_factor", 1.0)
    # Registry growth outranks the load-factor tiebreak: a fresh record
    # covering strictly more queries at no-worse inflation count is a
    # full-registry freshening (BENCH.md policy / round-9 advice item 1),
    # not a displacement — lf only breaks ties at equal coverage.
    if len(queries) > len(head_queries) and new_inf <= old_inf:
        return None
    if (new_inf, new_lf) > (old_inf, old_lf):
        return (f"DISPLACEMENT WARNING: working-tree BENCH_LAST.json "
                f"(inflated={new_inf}, lf={new_lf:.3f}) is worse-qualified "
                f"than committed HEAD (inflated={old_inf}, lf={old_lf:.3f}) "
                f"— keep the committed record: git checkout BENCH_LAST.json")
    return None


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
    try:
        lines = [l for l in open(path).read().splitlines() if l.strip()]
    except OSError as e:
        print(f"FAIL: cannot read {path}: {e}")
        return 1

    total, queries = None, {}
    for line in lines:
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"FAIL: unparseable line in {path}: {line[:120]}...")
            return 1
        if rec.get("metric") == "total":
            total = rec
        if isinstance(rec.get("queries"), dict):
            queries.update(rec["queries"])
    if total is None:
        print(f"FAIL: no metric=total line in {path}")
        return 1

    problems = []
    value = total.get("value")
    if not isinstance(value, (int, float)) or value <= 0:
        problems.append(f"total value missing/non-positive: {value!r}")

    lf = total.get("load_factor", 1.0)
    if lf > LOAD_FACTOR_MAX:
        problems.append(
            f"load_factor {lf:.3f} > {LOAD_FACTOR_MAX} (CPU-contended box)")

    # Absent on pre-round-10 records (they qualified on probes + the
    # per-query scan alone); -1 = /proc/stat unreadable, advisory only.
    steal = total.get("steal_pct")
    if steal is not None and steal > STEAL_PCT_MAX:
        problems.append(
            f"steal_pct {steal:.4f} > {STEAL_PCT_MAX} (hypervisor stole "
            f"CPU mid-run; bracket probes cannot see this)")

    for key in ("calib_start", "calib_end", "calib_io_start"):
        if total.get(key, -1.0) < 0:
            problems.append(f"{key} failed ({total.get(key)})")
    for key in ("calib_bw_start", "calib_bw_end"):
        bw = total.get(key, -1.0)
        if bw is None or bw <= 0:
            problems.append(f"{key} missing/failed ({bw}) — a qualified "
                            f"record needs its own bandwidth bracket")
        elif bw > BW_MAX:
            problems.append(f"{key} {bw * 1000:.1f}ms > {BW_MAX * 1000:.0f}ms "
                            f"(memory-bandwidth co-tenant resident)")
    io_end = total.get("calib_io_end", -1.0)
    if io_end < 0:
        problems.append(f"calib_io_end failed ({io_end})")
    elif io_end > IO_END_MAX:
        problems.append(f"calib_io_end {io_end:.3f} > {IO_END_MAX} "
                        f"(IO-contended box)")

    failed = [k for k, v in queries.items() if v < 0]
    if failed:
        problems.append(f"{len(failed)} queries failed (-1s): {failed[:5]}")

    # Failure honesty (round 7: 16 analysis-broken queries were logged as
    # ~0.06 s timings and the record still "qualified"): any nfailed > 0
    # or a non-empty errors map disqualifies the record outright.
    nfailed = total.get("nfailed", 0)
    errors = {}
    for line in lines:
        rec = json.loads(line)
        if isinstance(rec.get("errors"), dict):
            errors.update(rec["errors"])
    if nfailed or errors:
        names = sorted(errors) or ["(unnamed)"]
        problems.append(
            f"{max(nfailed, len(errors))} queries THREW during the run: "
            + ", ".join(f"{k}={errors.get(k, '?')}" for k in names[:8]))

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_reference.json")
    inflated = []
    try:
        ref = json.load(open(ref_path))["queries"]
        # key drift kills the scan's coverage silently: a new/renamed
        # query missing from the reference would be excluded from the
        # inflation check exactly when it is most likely to be misread,
        # and stale reference entries hide removed queries. Force the
        # reference update into the same commit that changes the suite.
        missing = sorted(set(queries) - set(ref))
        stale = sorted(set(ref) - set(queries))
        if missing:
            problems.append(
                f"{len(missing)} record queries absent from reference "
                f"(update tools/bench_reference.json): {missing[:5]}")
        if stale:
            problems.append(
                f"{len(stale)} stale reference entries for removed "
                f"queries: {stale[:5]}")
        for k, v in queries.items():
            r = ref.get(k)
            if r and v > r * INFLATION_RATIO + INFLATION_SLACK_SEC:
                inflated.append((k, v, r))
        warn = displacement_check(path, queries, total, ref)
        if warn:
            print(warn)
        if len(inflated) > MAX_INFLATED:
            worst = sorted(inflated, key=lambda t: t[1] / t[2],
                           reverse=True)[:8]
            problems.append(
                f"{len(inflated)} queries >{INFLATION_RATIO}x quiet "
                f"reference (mid-suite contention signature): "
                + ", ".join(f"{k} {v:.2f}s/{r:.2f}s" for k, v, r in worst))
    except (OSError, KeyError, json.JSONDecodeError) as e:
        problems.append(f"cannot scan vs {ref_path}: {e}")

    summary = (f"total={value}s nqueries={total.get('nqueries', 0)} "
               f"load_factor={lf:.3f} "
               f"cpu=({total.get('calib_start')},{total.get('calib_end')}) "
               f"io=({total.get('calib_io_start')},{io_end}) "
               f"inflated_vs_ref={len(inflated)}")
    # Stamp the verdict INTO the artifact (round-16 verdict #5): a
    # refused record must carry "qualified": false in its own total
    # line so it can never be read as a measurement without also
    # reading the refusal. Rewrite only the total line, in place;
    # idempotent (re-running re-stamps the same field), and a
    # read-only file degrades to the printed verdict alone.
    # EXCEPT a git-tracked, unmodified file: the committed BENCH_LAST
    # record predates the bandwidth bracket (grandfathered under the
    # round-12 gates it qualified under) — re-checking it must not
    # dirty the tree with a retroactive refusal.
    def _committed_clean(p):
        try:
            d = os.path.dirname(os.path.abspath(p)) or "."
            b = os.path.basename(p)
            tracked = subprocess.run(
                ["git", "-C", d, "ls-files", "--error-unmatch", b],
                capture_output=True, timeout=10).returncode == 0
            if not tracked:
                return False
            # vs HEAD, not the index (review round-16): a fresh record
            # staged but not yet committed must still be stamped —
            # worktree-vs-index would misread it as the committed one
            return subprocess.run(
                ["git", "-C", d, "diff", "--quiet", "HEAD", "--", b],
                capture_output=True, timeout=10).returncode == 0
        except (OSError, subprocess.SubprocessError):
            return False
    try:
        if _committed_clean(path):
            raise OSError("tracked+clean: stamp skipped")
        # the reasons travel WITH the artifact (the stdout is long gone
        # by the time anyone re-reads the record), not just a count
        total["qualified"] = not problems
        total["unqualified_reasons"] = problems
        stamped = []
        for line in lines:
            rec = json.loads(line)
            stamped.append(json.dumps(total, separators=(",", ":"))
                           if rec.get("metric") == "total" else line)
        with open(path, "w") as g:
            g.write("\n".join(stamped) + "\n")
    except OSError:
        pass
    if problems:
        print(f"UNQUALIFIED: {summary}")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"QUALIFIED: {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
