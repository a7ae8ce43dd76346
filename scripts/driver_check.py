#!/usr/bin/env python
"""Simulate the driver's verify pass end-to-end.

Imports ``__spark_entry__`` exactly as the driver would, then:
1. smoke: ``entry(spark)`` at sf0.001 — rows >= 0, stable schema;
2. correctness: for every ``queries()`` entry, run the Spark query at
   sf0.01 and, where an ``oracle_sql()`` twin exists, run it in DuckDB
   over the same parquet and compare row-count + columns +
   order-insensitive values (rows-only check otherwise).

Usage: python scripts/driver_check.py [sf_dir]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ENTRY  # noqa: E402
from sql_engine_triangle_spark.catalog import TABLES, table_path  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def strict_driver_match(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Replicate the external driver's canonicalize+value-hash semantics:
    sort columns by name, sort rows by all columns (this step CRASHES on
    unhashable cells like lists — surfaced here as a failure), then
    compare cell values with NO dtype coercion. A BIGINT 12000 vs DOUBLE
    12000.0 is a mismatch here even though the tolerant pass accepts it,
    because the driver's value hash distinguishes them
    (CORRECTNESS_r02: a_global_stats, f_map_ops)."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            s = df[c]
            if pd.api.types.is_datetime64_any_dtype(s):
                df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
            elif s.dtype == object and s.map(
                lambda v: v is None or isinstance(v, datetime.date)
            ).all() and s.notna().any():
                # Spark DateType -> object(datetime.date) while DuckDB DATE
                # -> datetime64[us]; the real driver matched these in r2
                # (q2_town_month_rollup et al. green), so normalize rather
                # than flag.
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    try:
        ca, cb = canon(a), canon(b)
    except TypeError as e:
        return f"driver canonicalizer would crash: {e}"
    for c in ca.columns:
        ka, kb = ca[c].dtype.kind, cb[c].dtype.kind
        if ka != kb:
            return (
                f"col {c}: dtype skew {ca[c].dtype} vs {cb[c].dtype} — "
                "driver value-hash distinguishes these"
            )
        if ka == "O":
            for i, v in enumerate(ca[c]):
                try:
                    hash(v)
                except TypeError:
                    return f"col {c} row {i}: unhashable cell ({type(v).__name__})"
    sa, sb = ca.astype(str), cb.astype(str)
    if not sa.equals(sb):
        for c in sa.columns:
            neq = sa[c] != sb[c]
            if neq.any():
                i = neq.idxmax()
                return f"col {c} row {i}: strict {sa[c][i]!r} vs {sb[c][i]!r}"
    return None


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"rowcount {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            for i, (x, y) in enumerate(zip(a[c], b[c])):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) or pd.isna(y) or not math.isclose(
                    float(x), float(y), rel_tol=1e-9, abs_tol=1e-9
                ):
                    return f"col {c} row {i}: {x!r} vs {y!r}"
        else:
            if (a[c].astype(str) != b[c].astype(str)).any():
                i = (a[c].astype(str) != b[c].astype(str)).idxmax()
                return f"col {c} row {i}: {a[c][i]!r} vs {b[c][i]!r}"
    return None


def bare_spark():
    """Build the session the way the EXTERNAL driver does: a bare
    ``SparkSession.builder`` with NO repo confs. The repo's tuned
    session (session.get_spark) pins parquet/timezone/AQE settings
    that can mask environment-default skew — round 3 lost three rows
    to exactly that (Spark 4's ``inferTimestampNTZ`` default made the
    driver read events.ts as TIMESTAMP_NTZ while every local check ran
    under the pinned session). Any conf the engine NEEDS must be set
    at use-site (catalog.load_table), not here."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("driver_check_bare")
        .getOrCreate()
    )


def main() -> int:
    spark = bare_spark()

    t0 = time.time()
    res = ENTRY.entry(spark)
    rows = res.collect()
    print(f"[smoke] entry(): {len(rows)} rows, schema={res.columns}, "
          f"{time.time() - t0:.1f}s")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )

    qs, oracles = ENTRY.queries(), ENTRY.oracle_sql()

    # Window audit: the external driver only ingests the FIRST 50
    # entries, so every one of those slots should carry a hash-checkable
    # oracle — a rows-only entry in the window wastes external
    # verification capacity (round-3 lesson; see COVERAGE.md rotation).
    window = list(qs)[:50]
    no_oracle_in_window = [n for n in window if n not in oracles]
    if no_oracle_in_window:
        print(f"[warn] rows-only entries inside the 50-entry driver window: "
              f"{no_oracle_in_window}")

    # Optional subset for fast iteration: DRIVER_CHECK_ONLY=a,b,c runs
    # just those entries (full runs remain the commit gate).
    import os

    only = os.environ.get("DRIVER_CHECK_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        unknown = keep - set(qs)
        if unknown:
            print(f"[warn] DRIVER_CHECK_ONLY names not registered: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in keep}

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
            except Exception as e:  # noqa: BLE001
                print(f"[FAIL] {name}: oracle error: {e}")
                n_fail += 1
                continue
            err = values_match(spark_pdf, oracle_pdf) or strict_driver_match(
                spark_pdf, oracle_pdf
            )
            if err:
                print(f"[FAIL] {name}: {err}")
                n_fail += 1
            else:
                print(f"[ok]   {name}: {len(spark_pdf)} rows match oracle ({dt:.1f}s)")
                n_pass += 1
        else:
            err = strict_driver_match(spark_pdf, spark_pdf)
            if err:
                print(f"[FAIL] {name}: rows-only result not driver-hashable: {err}")
                n_fail += 1
            else:
                print(
                    f"[rows] {name}: {len(spark_pdf)} rows (no oracle, rows-only) ({dt:.1f}s)"
                )
                n_rows_only += 1

    print(f"\n{n_pass} oracle-match, {n_rows_only} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
