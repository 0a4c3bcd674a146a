#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (BASELINE.md t2).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
views named after the fixture tables, and compares: sort columns by name,
sort rows, exact value compare (with a float-bit report so FP divergence is
visible before the driver sees it).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(
                (v := v.tolist() if isinstance(v, np.ndarray) else v), list) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int8", "int16", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("decimal") or df[c].map(
                lambda v: type(v).__name__ == "Decimal").any():
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # multi-file table layout (GenData filesPerTable>1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # The dump is self-describing: errors.json lists queries that threw
    # (no parquet dir), query_modes.json lists the FULL registry, and
    # subset.json marks a deliberate SPARK_GRAFT_ONLY narrowing. A dump
    # smaller than the registry must never silently qualify as full
    # coverage — it is either PARTIAL (declared subset) or MISSING.
    def load(p, default):
        try:
            return json.load(open(os.path.join(out_dir, p)))
        except Exception:
            return default
    verify_errors = load("errors.json", {})
    subset = load("subset.json", None)
    registry = sorted(load("query_modes.json", oracles).keys())
    for n, exc in verify_errors.items():
        results[n] = f"VERIFY_ERROR: {exc}"
    declared = set(subset["selected"]) if subset else set(registry)
    for n in registry:
        if n in declared and n not in names and n not in verify_errors:
            results[n] = "MISSING_FROM_DUMP"
    for name in names:
        if name in verify_errors:
            # the query THREW this run; any parquet dir under its name is
            # a stale survivor from a prior dump (Verify now deletes it,
            # but belt-and-braces: never let stale data overwrite the
            # VERIFY_ERROR verdict)
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        try:
            s, d = canon(spark_df), canon(duck_df)
        except Exception as e:
            results[name] = f"CANON_ERROR: {e}"
            continue
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
            continue
        if len(s) != len(d):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(d)}"
            continue
        exact = True
        approx = True
        detail = ""
        for c in s.columns:
            a, b = s[c].values, d[c].values
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype("float64"); bf = b.astype("float64")
                both_nan = np.isnan(af) & np.isnan(bf)
                eq = (af == bf) | both_nan
                if not eq.all():
                    exact = False
                    rel = np.abs(af - bf) / np.maximum(np.abs(bf), 1e-12)
                    rel[both_nan] = 0
                    if np.nanmax(rel) > 1e-9:
                        approx = False
                    i = int(np.argmax(~eq))
                    detail += f" [{c}: max_rel={np.nanmax(rel):.2e} e.g. {af[i]!r} vs {bf[i]!r}]"
            else:
                eq = pd.Series(a).eq(pd.Series(b)) | (pd.Series(a).isna() & pd.Series(b).isna())
                if not eq.all():
                    exact = False; approx = False
                    i = int(np.argmax(~eq.values))
                    detail += f" [{c}: e.g. row{i} {a[i]!r} vs {b[i]!r}]"
        if exact:
            results[name] = f"OK rows={len(s)}"
        elif approx:
            results[name] = f"FLOAT_DRIFT rows={len(s)}{detail}"
        else:
            results[name] = f"VALUE_MISMATCH{detail}"
    width = max(len(n) for n in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for n in sorted(results):
        print(f"{n:<{width}}  {results[n]}")
    partial = len(declared) < len(registry)
    label = "PARTIAL (declared subset via SPARK_GRAFT_ONLY)" if partial \
        else "FULL registry"
    print(f"\n{n_ok}/{len(results)} clean — {label}: "
          f"{len(declared)}/{len(registry)} queries")
    # a clean subset run exits 0 but is LABELED partial; a dump that is
    # smaller than it declared (or than the registry, undeclared) fails
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
