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
       python3 tools/quietrun.py merge-sf1 <sfDir> <outRecord> [maxMinutes]
       python3 tools/quietrun.py merge-sf01 <sfDir> <outRecord> [maxMinutes]
       python3 tools/quietrun.py check-merge-accept <record> <post_bw_ms>
           <bw_floor_ms> <post_spin_s> <spin_floor_s>
       python3 tools/quietrun.py check-merge-accept-query <record> <query>

`merge-sf01` (round 15) applies the merge-sf1 micro-window machinery to
the sf0.1 RECORD itself: re-measures EVERY registry query on current
code (changed-plan queries first, then shortest-first), identical
acceptance gate, admissions persisted across invocations in
<outRecord>.state.jsonl, composite written incrementally with carried
round-12 levels explicitly marked until each query earns its min-of-3.

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

`merge-sf1` closes a coverage gap WITHOUT a full-suite window (round-12
verdict: seven full-suite sf1 attempts all refused by the gate on the
same roaming memory-bandwidth co-tenant; waiting for a globally quiet
6-minute window failed for four rounds). It keeps every committed
BENCH_sf1.json level untouched and admits ONLY the registry queries the
committed record lacks, each from probe-gated calm MICRO-windows:
batches of <=6 run via SPARK_GRAFT_ONLY, a run is accepted only if its
own brackets are clean (lf <= 1.05, steal <= 0.02, nfailed 0) AND the
bandwidth probe is calm immediately after the run — floor-relative AND
under the ABSOLUTE 40 ms cap, since a session that starts while the
co-tenant is resident would otherwise seed a polluted floor and admit
poisoned levels (the co-tenant catcher the brackets are blind to) —
and each query needs MIN_RUNS accepted runs (min taken). Per-query provenance (window probe readings,
every accepted timing) lands in <outRecord>_provenance.json. Solo
levels are cold-context (each batch pays JVM+codegen start) — an
honest UPPER bound of the suite level; the next qualified full-suite
record supersedes them.
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
    # aggregate cpu line: cpu user nice system idle iowait irq softirq
    # steal ... -> steal is field 8 counting the 'cpu' label (review
    # round-16: this read [6] = irq since round 10, so every python-side
    # "steal 0" gate reading was the irq counter; the Scala probe
    # (procStatCpu, drop(1) then f(7)) always read the correct field)
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


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


def _parse_extras(text):
    """(bw_brackets, errors) from a bench record's detail line —
    bw_brackets maps query -> [bw_pre_ms, bw_post_ms, steal_ticks]
    (round-16 Bench records one probe at every query boundary)."""
    brackets, errors = {}, {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            return {}, {}
        if isinstance(rec.get("bw_brackets"), dict):
            brackets.update(rec["bw_brackets"])
        if isinstance(rec.get("errors"), dict):
            errors.update(rec["errors"])
    return brackets, errors


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
    if total.get("calm_wait") == "timeout":
        # in-JVM wait sentinel (round 15): nothing was measured — the
        # lf/steal fields are absent, so bail before formatting them
        print(f"self-qualify: calm-wait timeout (last bw "
              f"{total.get('last_bw_ms')}ms) -> REJECT", flush=True)
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
    print(f"self-qualify: lf={total.get('load_factor', -1.0):.3f} "
          f"steal={total.get('steal_pct', -1.0):.4f} "
          f"nfailed={total.get('nfailed')} "
          f"regressed={len(regress)} -> {'OK' if ok else 'REJECT'}",
          flush=True)
    return ok


FLOOR_WINDOW = 20  # probes; ~15 min of history
BLIND_EVERY = 18   # non-calm probes between probe-blind attempts

MERGE_BATCH = 6      # queries per SPARK_GRAFT_ONLY solo invocation
MERGE_MIN_RUNS = 3   # accepted runs per query before its min is admitted
MERGE_PROBE_SLEEP = 15  # micro-window cadence (s) — windows are short
# ABSOLUTE bandwidth cap (s) for merge acceptance, on top of the
# floor-relative test: the floor-relative gate self-anchors, so a
# session started while the co-tenant is resident seeds a polluted
# floor (observed 73 ms) and would then admit bandwidth-poisoned solo
# levels with quiet CPU brackets. Quiet-box reference for the 256 MB
# stream probe is ~25 ms (BENCH.md round-12 measurements; co-tenant
# present reads 45-1013 ms) — 40 ms is comfortably above quiet jitter
# and below every co-tenant reading on record.
MERGE_BW_ABS = 0.040


def _git_head(path):
    """Parse a committed two-line bench record from HEAD; ({}, {}) when
    absent (first merge into a repo with no sf1 record yet)."""
    try:
        r = subprocess.run(["git", "show", f"HEAD:{path}"],
                           capture_output=True, text=True, timeout=10)
        if r.returncode != 0:
            return None, {}
        return _parse(r.stdout)
    except (OSError, subprocess.SubprocessError):
        return None, {}


def merge_accept(tot, post_bw, post_p, bw_floor, spin_floor):
    """The merge-sf1 per-run acceptance gate, as a pure function so
    BenchFormatSpec's negative controls can drive every rejection path
    (same hardening discipline as check-sf1): the run's own brackets
    must be clean AND the post-run probes calm — floor-relative and
    under the absolute bandwidth cap. The record's OWN in-run bandwidth
    bracket (calib_bw_start/calib_bw_end, the 256 MB stream inside the
    bench JVM) must ALSO sit under the absolute cap: a co-tenant that
    arrives mid-run and leaves before the post probe is visible only
    there (advisor round-13 — the bracket the Bench change added now
    participates in the gate it motivated). A record missing the
    bracket (pre-round-13 Bench, or a failed probe reading -1) is
    refused — an admission needs its own bandwidth evidence."""
    return (tot is not None and tot.get("nfailed", 1) == 0
            and 0 < tot.get("load_factor", 9) <= 1.05
            and tot.get("steal_pct", 1) <= 0.02
            and 0 < tot.get("calib_bw_start", -1) <= MERGE_BW_ABS
            and 0 < tot.get("calib_bw_end", -1) <= MERGE_BW_ABS
            and post_bw <= bw_floor * BW_TOL
            and post_bw <= MERGE_BW_ABS
            and post_p <= spin_floor * TOL)


def check_merge_accept(argv):
    """CLI: check-merge-accept <record> <post_bw_ms> <bw_floor_ms>
    <post_spin_s> <spin_floor_s> — exit 0 iff the gate accepts."""
    with open(argv[0]) as f:
        tot, _ = _parse(f.read())
    ok = merge_accept(tot, float(argv[1]) / 1000, float(argv[3]),
                      float(argv[2]) / 1000, float(argv[4]))
    print(f"merge-accept: {'ACCEPT' if ok else 'REJECT'}", flush=True)
    return 0 if ok else 1


def merge_accept_query(bracket, errored, lf):
    """Per-QUERY admission gate (round-16 verdict #1): when the batch as
    a whole is refused, a query whose OWN boundary brackets are calm —
    both bandwidth probes under the same 40 ms absolute cap the batch
    gate uses, zero hypervisor steal across the query, and the query
    didn't throw — is still an honest measurement: the co-tenant's ~15 s
    calm gaps cover 1-3 queries mid-run even when the suite-level
    brackets read hot. Pure function so BenchFormatSpec's negative
    controls can drive every rejection path. `bracket` is the record's
    [bw_pre_ms, bw_post_ms, steal_ticks] for the query (None when the
    record predates per-query brackets — refused: an admission needs
    its own bandwidth evidence).

    The run-level load factor (`lf`) must ALSO be quiet (review
    round-16): the bandwidth brackets are blind to a same-guest
    CPU-only co-tenant, and the documented bandwidth thief reads lf
    ~1.0 on every record — so requiring lf <= 1.05 keeps the intended
    harvesting (bw-hot batch, calm per-query gaps) while refusing the
    CPU-hot-but-bandwidth-calm run the batch gate would refuse."""
    if errored or not isinstance(bracket, (list, tuple)) or len(bracket) < 3:
        return False
    if not (lf is not None and 0 < lf <= 1.05):
        return False
    pre, post, steal = bracket[0], bracket[1], bracket[2]
    return (isinstance(pre, (int, float)) and isinstance(post, (int, float))
            and 0 < pre <= MERGE_BW_ABS * 1000
            and 0 < post <= MERGE_BW_ABS * 1000
            and steal == 0)


def check_merge_accept_query(argv):
    """CLI: check-merge-accept-query <record> <query> — exit 0 iff the
    per-query gate admits that query from the record's own brackets."""
    with open(argv[0]) as f:
        text = f.read()
    tot, _ = _parse(text)
    brackets, errors = _parse_extras(text)
    q = argv[1]
    lf = (tot or {}).get("load_factor")
    ok = merge_accept_query(brackets.get(q), q in errors, lf)
    print(f"merge-accept-query {q}: {'ACCEPT' if ok else 'REJECT'} "
          f"(bracket {brackets.get(q)}, errored {q in errors}, lf {lf})",
          flush=True)
    return 0 if ok else 1


def _classes_fingerprint() -> str:
    """Content hash of the compiled classes a measurement runs against.
    merge-sf01 state admissions bind to it (review round-15): an sf0.1
    level is a property of a BINARY, not of a repo — resuming a state
    file across a plan-changing recompile must drop the stale
    admissions, while doc-only commits (same classes) keep them."""
    import hashlib
    h = hashlib.md5()
    root = "target/scala-2.13/classes"
    nclass = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".class"):
                fp = os.path.join(dirpath, fn)
                h.update(fp.encode())
                nclass += 1
                try:
                    with open(fp, "rb") as f:
                        h.update(f.read())
                except OSError:
                    pass
    # loud on an empty tree (advisor round-15): zero class files yields
    # a CONSTANT fingerprint, so the binary-binding guard would keep
    # stale admissions across exactly the recompile it exists to drop
    if nclass == 0:
        raise SystemExit(
            f"classes fingerprint: no .class files under {root} — "
            f"compile first (sbt compile); refusing to bind/resume "
            f"admission state to an empty tree")
    h.update(str(nclass).encode())
    return h.hexdigest()[:12]


def _attempt(attempt, sf_dir, batch, hist, bw_hist, tmp_prefix):
    """One launch-with-in-JVM-wait measurement cycle, shared by both
    merge loops (review round-15: the cycle was duplicated and the
    round-14 floor-ordering fix had to land twice). Probes once for
    floor bookkeeping, launches Bench on the batch with the calm wait
    armed, parses the artifact, gates via merge_accept against the
    PRE-append floors (round-14 advisor), then appends the post-run
    probes. Returns (status, qs, prov_base, brackets, errors): status
    in {'accept', 'reject', 'timeout', 'noartifact'}; brackets/errors
    are the record's per-query boundary brackets and thrown-query map,
    so a refused batch can still admit its bracket-calm subset
    (round-16 verdict #1)."""
    s0 = steal_ticks()
    p = spin()
    bw = bw_probe()
    stole = steal_ticks() - s0
    hist.append(p)
    bw_hist.append(bw)
    floor, bw_floor = min(hist), min(bw_hist)
    print(f"attempt {attempt} (launch bw {bw * 1000:.1f}ms, floor "
          f"{bw_floor * 1000:.1f}, steal {stole}): batch "
          f"{','.join(batch)} — in-JVM calm wait armed", flush=True)
    tmp = f"{tmp_prefix}{attempt}.json"
    # stale-artifact guard (review round-15): attempt counters restart
    # every invocation, so a leftover file from a prior session must
    # never be parsed as THIS attempt's output when the Bench JVM dies
    # before writing — that would re-admit old timings with fabricated
    # probe provenance
    try:
        os.unlink(tmp)
    except OSError:
        pass
    # SPARK_GRAFT_WAIT_EACH (round 16): the JVM parks on its own probe
    # before EVERY query, so one launch harvests every calm gap inside
    # its timeout window instead of needing one gap to span the batch
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=",".join(batch),
               SPARK_GRAFT_BENCH_OUT=tmp,
               SPARK_GRAFT_WAIT_CALM=str(MERGE_BW_ABS * 1000),
               SPARK_GRAFT_WAIT_EACH="on",
               SPARK_GRAFT_WAIT_TIMEOUT="900")
    run_s0 = steal_ticks()
    subprocess.run(["tools/run.sh", "graft.Bench"], env=env,
                   stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL, check=False)
    run_steal = steal_ticks() - run_s0
    post_bw = bw_probe()
    post_p = spin()
    try:
        with open(tmp) as f:
            text = f.read()
        tot, qs = _parse(text)
        brackets, errs = _parse_extras(text)
    except OSError:
        tot, qs, brackets, errs = None, {}, {}, {}
    if tot is not None and tot.get("calm_wait") == "timeout":
        print(f"  in-JVM wait timed out (last bw "
              f"{tot.get('last_bw_ms')}ms) — nothing measured",
              flush=True)
        hist.append(post_p)
        bw_hist.append(post_bw)
        return "timeout", {}, {}, {}, {}
    ok = merge_accept(tot, post_bw, post_p, bw_floor, floor)
    hist.append(post_p)
    bw_hist.append(post_bw)
    if tot is None:
        print("  no artifact written (Bench crashed or never launched) "
              "-> REJECT", flush=True)
        return "noartifact", {}, {}, {}, {}
    print(f"  lf={tot.get('load_factor', -1):.3f} "
          f"steal={tot.get('steal_pct', -1):.4f} "
          f"post_bw {post_bw * 1000:.1f}ms post_spin {post_p:.3f}s "
          f"-> {'ACCEPT' if ok else 'REJECT'}", flush=True)
    prov_base = {"lf": tot.get("load_factor"),
                 "steal_pct": tot.get("steal_pct"),
                 "calib_start": tot.get("calib_start"),
                 "calib_end": tot.get("calib_end"),
                 "calib_bw_start": tot.get("calib_bw_start"),
                 "calib_bw_end": tot.get("calib_bw_end"),
                 "pre_spin_s": p, "pre_bw_ms": bw * 1000,
                 "post_spin_s": post_p, "post_bw_ms": post_bw * 1000,
                 "run_steal_ticks": run_steal,
                 "wall": time.strftime("%Y-%m-%dT%H:%M:%S")}
    return ("accept" if ok else "reject"), qs, prov_base, brackets, errs


def merge_sf1(sf_dir: str, out_record: str, budget_s: float) -> int:
    import collections
    total_sf1, committed = _git_head("BENCH_sf1.json")
    _, registry = _git_head("BENCH_LAST.json")
    if not registry:
        print("merge-sf1: no committed BENCH_LAST.json to read the "
              "registry from", flush=True)
        return 1
    # shortest-first (round-14 verdict #2): order by the sf0.1 committed
    # level as the solo-time proxy, so each calm micro-window admits the
    # maximum query count before the window closes
    missing = sorted(set(registry) - set(committed),
                     key=lambda q: (registry.get(q, 0), q))
    if not missing:
        print("merge-sf1: committed BENCH_sf1.json already covers the "
              "registry — nothing to merge", flush=True)
        return 0
    print(f"merge-sf1: {len(committed)} committed, {len(missing)} to "
          f"admit: {', '.join(missing)}", flush=True)
    batches = [missing[i:i + MERGE_BATCH]
               for i in range(0, len(missing), MERGE_BATCH)]
    accepted = {q: [] for q in missing}
    prov = {q: [] for q in missing}
    noart = {}  # batch-key -> consecutive no-artifact failures
    errcnt = {}  # query -> consecutive thrown-at-runtime attempts
    dead = set()  # queries dropped (repeated runtime failures)
    t_start = time.time()
    hist = collections.deque([min(spin() for _ in range(3))],
                             maxlen=FLOOR_WINDOW)
    bw_hist = collections.deque([min(bw_probe() for _ in range(3))],
                                maxlen=FLOOR_WINDOW)
    attempt = 0
    while time.time() - t_start < budget_s:
        todo = [b for b in batches
                if any(len(accepted[q]) < MERGE_MIN_RUNS
                       and q not in dead for q in b)
                and noart.get(",".join(b), 0) < 2]
        if not todo:
            break
        # a dead query must leave the EXECUTED batch too (review
        # round-16): todo[0] is the fixed partition of `missing`, so a
        # deterministically-throwing query would otherwise re-run every
        # attempt, force nfailed>0, and permanently block batch-accept
        # for its batchmates
        batch = [q for q in todo[0] if q not in dead]
        attempt += 1
        status, qs, prov_base, brackets, errs = _attempt(
            attempt, sf_dir, batch, hist, bw_hist,
            "/tmp/mergesf1_attempt")
        key = ",".join(batch)
        if status == "noartifact":
            # registry-drift guard (review round-15): a query renamed
            # away from SparkEntry makes Bench throw on SPARK_GRAFT_ONLY
            # before writing anything — retrying the same batch forever
            # would burn the whole budget
            noart[key] = noart.get(key, 0) + 1
            if noart[key] >= 2:
                print(f"  batch {key} failed twice with no artifact — "
                      f"dropping it (stale registry entry?)", flush=True)
        elif status in ("accept", "reject"):
            noart.pop(key, None)
            # failing-query wedge guard (advisor round-15, medium): a
            # query that THROWS writes an artifact with nfailed>0, the
            # batch gate rejects, and a deterministic batch order would
            # retry it until the whole budget burned — drop it loudly
            # after two consecutive runtime failures, like the
            # no-artifact path drops stale registry entries
            for q in batch:
                if q in errs:
                    errcnt[q] = errcnt.get(q, 0) + 1
                    if errcnt[q] >= 2 and q not in dead:
                        dead.add(q)
                        print(f"  {q} threw {errs[q]} twice — dropping "
                              f"it (fails at runtime on current code)",
                              flush=True)
                elif q in qs:
                    # only a MEASURED non-throwing run clears the
                    # streak (review round-16): a wait-expired attempt
                    # never ran the query and must not launder a
                    # deterministically-failing one back to zero
                    errcnt.pop(q, None)
            for q in batch:
                if q in qs and q not in errs:
                    # batch-accept admits everything measured; a refused
                    # batch still admits its bracket-calm subset — the
                    # per-query gate (round-16 verdict #1)
                    if status == "accept" or merge_accept_query(
                            brackets.get(q), False,
                            prov_base.get("lf")):
                        admit = "batch" if status == "accept" else "per-query"
                        accepted[q].append(qs[q])
                        prov[q].append(dict(prov_base, t=qs[q],
                                            admit=admit,
                                            bracket=brackets.get(q)))
                        if admit == "per-query":
                            print(f"    per-query admit {q} {qs[q]:.2f}s "
                                  f"(bracket {brackets.get(q)})",
                                  flush=True)
        time.sleep(2)
    short = {q: len(v) for q, v in accepted.items()
             if len(v) < MERGE_MIN_RUNS and q not in dead}
    if short:
        print(f"merge-sf1: budget exhausted with under-measured queries: "
              f"{short}", flush=True)
        return 1
    if dead:
        print(f"merge-sf1: {len(dead)} queries failed at runtime and "
              f"were NOT merged: {sorted(dead)}", flush=True)
        return 1
    merged = dict(committed)
    for q in missing:
        merged[q] = min(accepted[q])
    detail = {"metric": "queries", "queries": merged, "errors": {},
              "sf": sf_dir, "merged": True}
    base = {k: v for k, v in (total_sf1 or {}).items()
            if k not in ("queries",)}
    total = {"metric": "total", "value": sum(merged.values()),
             "unit": "sec", "sf": sf_dir, "nqueries": len(merged),
             "nfailed": 0, "merged": True,
             "merged_base_nqueries": len(committed),
             "merged_added": len(missing),
             "merged_base_load_factor": base.get("load_factor"),
             "provenance": os.path.basename(out_record)
             + "_provenance.json"}
    with open(out_record, "w") as g:
        g.write(json.dumps(detail) + "\n" + json.dumps(total) + "\n")
    with open(out_record + "_provenance.json", "w") as g:
        json.dump({"note": "merge-sf1 solo admissions: cold-context "
                   "min-of-%d from probe-gated calm micro-windows; "
                   "committed full-suite levels untouched"
                   % MERGE_MIN_RUNS,
                   "queries": prov}, g, indent=1)
    print(f"merge-sf1: MERGED {len(missing)} queries -> {out_record} "
          f"({len(merged)} total)", flush=True)
    return 0


# Queries whose PLANS changed in rounds 13-15 (decode family realism
# ratchet, curate_dsir checkpoint fix, the signaturePairs guard family,
# mm_pipeline_e2e's real-decode corpus) — the ones the standing
# round-12 record does not cover. merge-sf01 admits these FIRST.
CHANGED_PLAN_QUERIES = [
    "mm_pipeline_e2e", "mm_decode_meta", "mm_frame_sample", "mm_resize",
    "mm_scene_cut", "mm_features", "curate_dsir", "dedup_simhash",
    "dedup_simhash_md5", "mm_phash_dedup", "mm_phash_dct"]


def merge_sf01(sf_dir: str, out_record: str, budget_s: float) -> int:
    """Per-query micro-window admission for the sf0.1 RECORD (round-14
    verdict #1): two sessions of probe logs (946 + 527 probes, zero
    calm) prove the ~4-minute globally-quiet window a full-suite record
    needs never occurs on this box, but the merge-sf1 gate only needs
    ~15-second calm micro-windows. So re-measure ALL registry queries
    on CURRENT code batch-by-batch under the identical acceptance gate
    (run's own brackets clean incl. the 40 ms bandwidth bracket, calm
    post-run probes, min-of-%d) and assemble a composite record with
    per-admission provenance. The registry is the committed
    BENCH_LAST.json's query set (a query added to SparkEntry since that
    record enters via the next full-suite record; one renamed away is
    dropped after two no-artifact attempts rather than wedging the
    loop). Unlike merge-sf1, admissions PERSIST across invocations
    (<outRecord>.state.jsonl), each bound to the compiled-classes
    fingerprint it measured — a recompile that changes any class drops
    the stale admissions on resume. 180 queries need ~90 accepted batch
    runs, more calm seconds than any one session has offered — sessions
    accumulate. Changed-plan queries run first; within each class
    shortest-first (maximum admissions per window).
    The composite is written incrementally after every accepted batch:
    queries still lacking %d admissions carry the committed round-12
    level, marked `carried` in the record and provenance. A classic
    full-suite qualified record supersedes this composite.
    """ % (MERGE_MIN_RUNS, MERGE_MIN_RUNS)
    import collections
    base_total, committed = _git_head("BENCH_LAST.json")
    if not committed:
        print("merge-sf01: no committed BENCH_LAST.json registry",
              flush=True)
        return 1
    # shortest-first WITHIN each class too (review round-15: the
    # hardcoded list order put the slowest changed-plan query first,
    # so every early window had to fit it before admitting anything)
    prio = sorted((q for q in CHANGED_PLAN_QUERIES if q in committed),
                  key=lambda q: (committed[q], q))
    rest = sorted((q for q in committed if q not in set(prio)),
                  key=lambda q: (committed[q], q))
    order = prio + rest
    state_path = out_record + ".state.jsonl"
    accepted = {q: [] for q in order}
    prov = {q: [] for q in order}
    fp = _classes_fingerprint()
    if os.path.exists(state_path):
        dropped = 0
        with open(state_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                q = rec.get("q")
                if q not in accepted:
                    continue
                # binary binding (review round-15): an admission is a
                # measurement of a particular compiled-classes state;
                # resuming across a recompile that changed any class
                # drops stale admissions instead of reporting old-plan
                # levels as fresh current-code ones
                if rec.get("fp") != fp:
                    dropped += 1
                    continue
                accepted[q].append(rec["t"])
                prov[q].append(rec.get("prov", {}))
        done0 = sum(1 for q in order
                    if len(accepted[q]) >= MERGE_MIN_RUNS)
        print(f"merge-sf01: resumed state — {done0}/{len(order)} queries "
              f"already admitted"
              + (f"; {dropped} stale admissions dropped (classes "
                 f"fingerprint changed)" if dropped else ""), flush=True)

    def write_composite():
        fresh = {q for q in order if len(accepted[q]) >= MERGE_MIN_RUNS}
        merged = {q: (min(accepted[q]) if q in fresh else committed[q])
                  for q in order}
        carried = sorted(set(order) - fresh)
        detail = {"metric": "queries", "queries": merged, "errors": {},
                  "sf": sf_dir, "merged": True}
        total = {"metric": "total", "value": sum(merged.values()),
                 "unit": "sec", "sf": sf_dir, "nqueries": len(merged),
                 "nfailed": 0, "merged": True, "merged_mode": "sf01",
                 "merged_fresh": len(fresh), "merged_carried": len(carried),
                 "carried_queries": carried, "classes_fp": fp,
                 "provenance": os.path.basename(out_record)
                 + "_provenance.json"}
        with open(out_record, "w") as g:
            g.write(json.dumps(detail) + "\n" + json.dumps(total) + "\n")
        with open(out_record + "_provenance.json", "w") as g:
            json.dump({"note": "merge-sf01 composite: per-query solo "
                       "admissions (cold-context min-of-%d, probe-gated "
                       "calm micro-windows, every admission's own "
                       "brackets <= %d ms bandwidth cap); `carried` "
                       "queries still hold the committed round-12 "
                       "full-suite level pending admissions"
                       % (MERGE_MIN_RUNS, int(MERGE_BW_ABS * 1000)),
                       "fresh": sorted(fresh), "carried": carried,
                       "queries": prov}, g, indent=1)
        return len(fresh), len(carried)

    t_start = time.time()
    hist = collections.deque([min(spin() for _ in range(3))],
                             maxlen=FLOOR_WINDOW)
    bw_hist = collections.deque([min(bw_probe() for _ in range(3))],
                                maxlen=FLOOR_WINDOW)
    attempt = 0
    dead = set()  # registry-drift guard: queries Bench cannot run
    noart = {}
    errcnt = {}  # query -> consecutive thrown-at-runtime attempts
    while time.time() - t_start < budget_s:
        todo = [q for q in order
                if len(accepted[q]) < MERGE_MIN_RUNS and q not in dead]
        if not todo:
            break
        # Launch policy (round 15): no pre-probe calm gate — the batch
        # JVM parks ITSELF on the in-JVM bandwidth probe
        # (SPARK_GRAFT_WAIT_CALM) after its warmup and only measures
        # once two consecutive readings clear the absolute cap, so the
        # window a measurement needs no longer has to span JVM startup.
        # Round 16 shrinks the quantum further: the JVM re-parks before
        # EVERY query (SPARK_GRAFT_WAIT_EACH) and records per-query
        # boundary brackets, so a refused batch still admits the
        # bracket-calm subset via merge_accept_query — one ~15 s calm
        # gap lands the 1-3 queries it covered.
        batch = todo[:MERGE_BATCH]
        attempt += 1
        status, qs, prov_base, brackets, errs = _attempt(
            attempt, sf_dir, batch, hist, bw_hist,
            "/tmp/mergesf01_attempt")
        key = ",".join(batch)
        if status == "noartifact":
            # registry-drift guard (review round-15): a committed-record
            # query since renamed in SparkEntry makes Bench throw on the
            # SPARK_GRAFT_ONLY require before writing anything; after
            # two consecutive no-artifact failures drop the batch's
            # queries so the loop cannot wedge on them forever
            noart[key] = noart.get(key, 0) + 1
            if noart[key] >= 2:
                dead.update(batch)
                print(f"  batch {key} failed twice with no artifact — "
                      f"dropping its queries (stale registry entries?)",
                      flush=True)
        elif status in ("accept", "reject"):
            noart.pop(key, None)
            # failing-query wedge guard (advisor round-15, medium): a
            # query that THROWS at runtime writes nfailed>0, the batch
            # gate rejects, and batch = todo[:MERGE_BATCH] is
            # deterministic — the same batch would be retried until the
            # whole budget burned with zero admissions for every query
            # behind it. Two consecutive runtime failures drop the
            # query loudly, exactly like the no-artifact path.
            for q in batch:
                if q in errs:
                    errcnt[q] = errcnt.get(q, 0) + 1
                    if errcnt[q] >= 2 and q not in dead:
                        dead.add(q)
                        print(f"  {q} threw {errs[q]} twice — dropping "
                              f"it (fails at runtime on current code)",
                              flush=True)
                elif q in qs:
                    # only a MEASURED non-throwing run clears the
                    # streak (review round-16): a wait-expired attempt
                    # never ran the query and must not launder a
                    # deterministically-failing one back to zero
                    errcnt.pop(q, None)
            admitted = []
            with open(state_path, "a") as sf:
                for q in batch:
                    if q in qs and q not in errs:
                        if status == "accept" or merge_accept_query(
                                brackets.get(q), False,
                                prov_base.get("lf")):
                            admit = ("batch" if status == "accept"
                                     else "per-query")
                            pr = dict(prov_base, t=qs[q], admit=admit,
                                      bracket=brackets.get(q))
                            accepted[q].append(qs[q])
                            prov[q].append(pr)
                            sf.write(json.dumps({"q": q, "t": qs[q],
                                                 "fp": fp,
                                                 "prov": pr}) + "\n")
                            admitted.append(q)
            if admitted:
                nf, nc = write_composite()
                print(f"  admitted {len(admitted)} ({status}): "
                      f"{','.join(admitted)}; composite: {nf} fresh / "
                      f"{nc} carried -> {out_record}", flush=True)
        time.sleep(2)
    nf, nc = write_composite()
    if dead:
        print(f"merge-sf01: {len(dead)} committed-registry queries could "
              f"not run on current code: {sorted(dead)}", flush=True)
    if nc:
        print(f"merge-sf01: budget exhausted — {nf} fresh, {nc} still "
              f"carried (state persists in {state_path})", flush=True)
        return 1
    print(f"merge-sf01: COMPLETE — all {nf} committed-registry queries "
          f"fresh -> {out_record} (a query added to SparkEntry since the "
          f"committed record enters via the next full-suite record)",
          flush=True)
    return 0


def main() -> int:
    # Stray-watcher registry (round 14): `nohup setsid` survives a kill
    # of the launcher pid, and a forgotten pre-fix watcher fired 12
    # doomed attempts over ~4 h before being found. Every invocation
    # appends its real pid + argv here so the next session can audit
    # and kill leftovers with one read.
    try:
        with open("/tmp/quietrun.pids", "a") as f:
            f.write(f"{os.getpid()} {time.strftime('%FT%T')} "
                    f"{' '.join(sys.argv[1:])}\n")
    except OSError:
        pass
    # arity guard (advisor-caught): a missing arg should print usage,
    # not die with a bare IndexError
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    if sys.argv[1] == "check-sf1":
        return 0 if self_qualified(sys.argv[2]) else 1
    if sys.argv[1] == "check-merge-accept":
        if len(sys.argv) < 7:
            print(__doc__)
            return 2
        return check_merge_accept(sys.argv[2:7])
    if sys.argv[1] == "check-merge-accept-query":
        if len(sys.argv) < 4:
            print(__doc__)
            return 2
        return check_merge_accept_query(sys.argv[2:4])
    if sys.argv[1] == "merge-sf1":
        if len(sys.argv) < 4:
            print(__doc__)
            return 2
        budget = float(sys.argv[4]) * 60 if len(sys.argv) > 4 else 7200
        return merge_sf1(sys.argv[2], sys.argv[3], budget)
    if sys.argv[1] == "merge-sf01":
        if len(sys.argv) < 4:
            print(__doc__)
            return 2
        budget = float(sys.argv[4]) * 60 if len(sys.argv) > 4 else 7200
        return merge_sf01(sys.argv[2], sys.argv[3], budget)
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
        # The ABSOLUTE bandwidth cap applies here too (round 14): the
        # floor-relative test self-anchors, so a session started while
        # the co-tenant is resident seeds a 50-70 ms floor and then
        # fires doomed attempts into exactly the state benchcheck (and
        # now the record's own bracket gate) must refuse.
        calm = (p <= floor * TOL and bw <= bw_floor * BW_TOL
                and bw <= MERGE_BW_ABS and stole == 0)
        calm_streak = calm_streak + 1 if calm else 0
        stale = 0 if calm else stale + 1
        print(f"probe {p:.3f}s floor {floor:.3f} "
              f"bw {bw * 1000:.1f}ms bwfloor {bw_floor * 1000:.1f} "
              f"steal {stole} streak {calm_streak}", flush=True)
        # Probe-blind fallback: on a day with no probe-calm window, an
        # attempt every ~BLIND_EVERY probes costs a few box-minutes and
        # lets benchcheck (the real gate: parallel calib brackets +
        # steal delta + per-query reference scan) judge windows the
        # 1-thread SPIN probe misreads. It bypasses only the CPU floor
        # logic, NOT the absolute bandwidth cap — the stream probe is a
        # direct measurement of the one state every blind attempt on
        # record was refused for (round 13: 946 probes, zero calm,
        # every attempt rejected), so firing into it just burns the box.
        blind = stale >= BLIND_EVERY and bw <= MERGE_BW_ABS
        if calm_streak >= 2 or blind:
            attempt += 1
            stale = 0
            print(f"attempt {attempt}: launching bench"
                  + (" (probe-blind)" if blind else ""), flush=True)
            tmp = f"/tmp/quietrun_attempt{attempt}.json"
            # in-JVM calm wait (round 15): even a probe-blind attempt
            # only STARTS its measurement inside a bracket-calm window;
            # a wait timeout aborts with a sentinel the qualifier
            # refuses (nfailed:-1), so blind attempts stop burning
            # 4-minute hot suites.
            env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                       SPARK_GRAFT_BENCH_OUT=tmp,
                       SPARK_GRAFT_WAIT_CALM=str(MERGE_BW_ABS * 1000),
                       SPARK_GRAFT_WAIT_TIMEOUT="900")
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
