"""Multi-column clustering layout: Z-order (Morton) interleaving.

Single-column sorted layouts (``maintenance.compact_table`` with
``sort_cols``) give perfect min/max pruning on ONE key and none on
the others. Z-ordering interleaves the bits of several keys into one
sort value, so every participating column's values are spatially
clustered across files — each file covers a narrow range of EVERY
key, and parquet min/max statistics prune multi-dimensional
predicates (the OPTIMIZE ZORDER BY discipline of lakehouse table
formats, applied here with plain Spark expressions).

Scale notes (100 TB):
- The z-value is a pure per-row JVM expression (shifts/masks inside
  whole-stage codegen) — computing it adds no shuffle; the clustered
  write is the same repartitionByRange + sortWithinPartitions shape
  as single-key compaction, one range exchange.
- Bits per column bound the interleave depth: 16 bits/column over two
  columns is a 32-bit z-value — enough to separate ~65k distinct
  file-range buckets per dimension, far beyond any practical file
  count. Values are first RANK-NORMALIZED into the bit budget via a
  fixed linear mapping of the column's min/max (computed once,
  scalar), so skewed domains still fill the grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, lo: int, hi: int, bits: int) -> Column:
    """Map integer column ``col`` (a column NAME — keeps the
    expression buildable under Spark Connect, where Column carries no
    reachable expression text) in [lo, hi] onto [0, 2^bits - 1]
    linearly. INTEGER floor-division only — a double divide + cast
    would truncate on Spark but round-to-nearest under DuckDB's CAST,
    skewing the oracle by one level at band edges."""
    span = max(1, hi - lo)
    levels = (1 << bits) - 1
    return F.expr(f"((`{col}` - {lo}) * {levels}) div {span}")


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two pre-scaled [0, 2^bits) long columns into
    one z-value: bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Built from shiftright/and/shiftleft expressions —
    codegen-friendly, no UDF."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


def zorder_sql(a: str, b: str, bits: int = 16) -> str:
    """The SAME interleave as ``zorder_value``, emitted as ANSI SQL
    (DuckDB-compatible) over pre-scaled integer expressions — the
    oracle twin is generated from one definition so the engines
    cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_cluster(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` arranged for a z-clustered write: rows
    range-partitioned and sorted by the interleaved z-value of the
    two columns (min/max computed once as scalar bounds). Writing the
    result yields files whose parquet min/max stats are narrow on
    BOTH columns."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    z = zorder_value(
        _scale_expr(col_a, int(lo_a), int(hi_a), bits),
        _scale_expr(col_b, int(lo_b), int(hi_b), bits),
        bits,
    )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
