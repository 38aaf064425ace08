"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names/order
(after sorting columns by name, like the driver), and cell values (rows
sorted by all columns). Reports exact mismatches and float-only drift
separately so rounding discipline can be judged.

Usage: python tools/check_oracle.py [--driver-cap N] [sf_dir] [query_name ...]

``--driver-cap N`` mirrors the harness's per-round query cap: only the
first N registry entries run, and the rest are listed as CAPPED — so a
local run predicts exactly which queries will get CORRECTNESS rows.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from databricks_etl_pipelines_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def cells_equal(a, b) -> tuple[bool, bool]:
    """(exact_equal, close_enough_for_float)"""
    a, b = normalize(a), normalize(b)
    if a == b:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
            return False, True
    return False, False


def compare(name, sdf, con, sql, verbose=False):
    import pandas as pd

    spdf = sdf.toPandas()
    ddf = con.execute(sql).fetchdf()
    issues = []
    s_cols, d_cols = sorted(spdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        issues.append(f"COLUMN MISMATCH spark={s_cols} duck={d_cols}")
        return issues
    if len(spdf) != len(ddf):
        issues.append(f"ROWCOUNT MISMATCH spark={len(spdf)} duck={len(ddf)}")
        return issues
    spdf = spdf[s_cols]
    ddf = ddf[s_cols]
    # dtype-level report (driver compares schema too)
    for c in s_cols:
        if str(spdf[c].dtype) != str(ddf[c].dtype):
            issues.append(f"dtype diff {c}: spark={spdf[c].dtype} duck={ddf[c].dtype}")
    key = [c for c in s_cols]
    sp = spdf.sort_values(key, kind="mergesort").reset_index(drop=True)
    dd = ddf.sort_values(key, kind="mergesort").reset_index(drop=True)
    exact_bad = 0
    float_drift = 0
    example = None
    for c in s_cols:
        sv, dv = sp[c].tolist(), dd[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            try:
                if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
                    a, b = pd.Timestamp(a), pd.Timestamp(b)
                if a is None and b is None:
                    continue
                exact, close = cells_equal(a, b)
            except Exception:
                exact, close = (str(a) == str(b),) * 2
            if not exact:
                if close:
                    float_drift += 1
                else:
                    exact_bad += 1
                    if example is None:
                        example = (c, i, a, b)
    if exact_bad:
        issues.append(f"VALUE MISMATCH {exact_bad} cells, e.g. {example}")
    if float_drift:
        issues.append(f"float drift (close but not bit-equal): {float_drift} cells")
    return issues


def main():
    args = sys.argv[1:]
    cap = None
    skip: set[str] = set()
    while args and args[0] in ("--driver-cap", "--skip"):
        if args[0] == "--driver-cap":
            cap = int(args[1])
        else:
            skip = set(args[1].split(","))
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if cap is not None:
        names = list(qs)
        for capped in names[cap:]:
            print(f"[CAPPED] {capped} (registry index >= {cap})")
        qs = {n: qs[n] for n in names[:cap]}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"[SKIP] {name} (excluded by --skip)")
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                cnt = sdf.count()
                print(f"[rows-only] {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            issues = compare(name, sdf, con, oracles[name])
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION {type(e).__name__}: {e}"]
        dt = time.time() - t0
        hard = [i for i in issues if not i.startswith("float drift") and not i.startswith("dtype diff")]
        if hard:
            n_fail += 1
            print(f"[FAIL] {name} ({dt:.1f}s)")
            for i in issues:
                print(f"       {i}")
        else:
            n_pass += 1
            soft = "; ".join(issues)
            print(f"[ok]   {name} ({dt:.1f}s)" + (f"  [{soft}]" if soft else ""))
    print(f"\n{n_pass} ok, {n_fail} FAIL, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
