"""Bare-session regression guard (the CORRECTNESS_r03 failure class).

The external driver builds a plain ``SparkSession.builder`` with NO
repo confs, so any behavior the engine needs must be established at
use-site (catalog.load_table), never assumed from session.get_spark.
Round 3 lost three driver rows to exactly this: Spark 4 defaults
``spark.sql.parquet.inferTimestampNTZ.enabled=true``, a bare session
read events.ts as TIMESTAMP_NTZ, and every ``unix_micros`` call threw
DATATYPE_MISMATCH while the repo's pinned session stayed green.

These tests run in SUBPROCESSES because the pytest JVM already holds
the tuned session — getOrCreate() would silently reuse it and mask
exactly the skew this file exists to catch. scripts/driver_check.py
is the FULL bare-session gate (all entries, all sfs); this file is
the fast targeted guard that runs in every pytest invocation.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SF = "/root/testdata/sf0.001"


def _run(code: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_events_ts_is_timestamp_under_bare_session():
    """load_table must yield TimestampType ts under env-default confs,
    and the three formerly-red events queries must run and agree on
    row counts with no DATATYPE_MISMATCH."""
    out = _run(f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[4]").appName("bare_guard").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        from sql_engine_triangle_spark.catalog import load_table
        ts_type = dict(load_table(spark, {SF!r}, "events").dtypes)["ts"]
        assert ts_type == "timestamp", f"bare session read ts as {{ts_type}}"
        from sql_engine_triangle_spark.queries import registry
        for name in ("asof_purchase_attribution", "pipeline_funnel_conversion",
                     "j_interval_events", "stream_tumbling_counts"):
            n = registry.get(name).fn(spark, {SF!r}).count()
            print(f"RESULT {{name}} {{n}}")
    """)
    counts = dict(
        line.split()[1:3] for line in out.splitlines() if line.startswith("RESULT")
    )
    assert set(counts) == {
        "asof_purchase_attribution",
        "pipeline_funnel_conversion",
        "j_interval_events",
        "stream_tumbling_counts",
    }
    assert all(int(v) > 0 for v in counts.values()), counts


def test_timezone_invariance_documented_behavior():
    """Session-timezone contract (documented in catalog.py): integer
    timestamp DIFFS (gap_us) are TZ-invariant; raw LTZ timestamp
    columns render in session-local wall clock, so oracle hash-parity
    of ts-emitting queries relies on the driver container being UTC
    (it is: Etc/UTC). This test pins both facts so a regression in
    either direction is loud."""
    out = _run(f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("tz_guard")
                 .config("spark.sql.session.timeZone", "America/New_York")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        from sql_engine_triangle_spark.queries import registry
        df = registry.get("asof_purchase_attribution").fn(spark, {SF!r})
        rows = df.orderBy("event_id").limit(3).collect()
        for r in rows:
            print(f"RESULT {{r.event_id}} {{r.gap_us}}")
    """)
    ny = dict(
        line.split()[1:3] for line in out.splitlines() if line.startswith("RESULT")
    )

    out_utc = _run(f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("tz_guard_utc")
                 .config("spark.sql.session.timeZone", "UTC")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        from sql_engine_triangle_spark.queries import registry
        df = registry.get("asof_purchase_attribution").fn(spark, {SF!r})
        rows = df.orderBy("event_id").limit(3).collect()
        for r in rows:
            print(f"RESULT {{r.event_id}} {{r.gap_us}}")
    """)
    utc = dict(
        line.split()[1:3]
        for line in out_utc.splitlines()
        if line.startswith("RESULT")
    )
    assert ny == utc, f"gap_us must be session-TZ invariant: {ny} vs {utc}"
