"""Skew mitigation: salted aggregation and salted broadcast-free
joins (SURVEY.md §4 / 100 TB posture).

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; these operators are the explicit, deterministic form for
the cases AQE can't see — a groupBy where one key holds a large
fraction of all rows, or a shuffle join against a hot key set.

Both are pure plan rewrites: results are identical to the unsalted
form (asserted in tests/test_skew.py); only the shuffle layout
changes (hot keys fan out over `salt_n` reducers before a cheap
merge of `salt_n` partial rows per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: str, salt_n: int) -> Column:
    """Deterministic per-row salt from a unique column (stable across
    retries — important for exactly-once sinks)."""
    return F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt_n)).cast("int")


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: str,
    unique_col: str,
    salt_n: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation: groupBy(keys + salt) partial
    count/sum, then merge partials per key. Algebraic aggregates
    (count/sum/min/max/avg-as-sum+count) merge losslessly; the first
    shuffle spreads a hot key over salt_n reducers."""
    partial = (
        df.withColumn("_salt", _salt(unique_col, salt_n))
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_cnt"), F.sum(sum_col).alias("_sum"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_cnt").alias("cnt"), F.sum("_sum").alias("sum_val"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_unique_col: str,
    salt_n: int = 16,
) -> DataFrame:
    """Salted inner equi-join for a skewed left side: left rows get a
    deterministic salt in [0, salt_n); the (small-ish but not
    broadcastable) right side is replicated salt_n times so every
    (key, salt) pair finds its match. Shuffle cost: right × salt_n,
    in exchange for the hot left key spreading over salt_n tasks."""
    l = left.withColumn("_salt", _salt(left_unique_col, salt_n))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return l.join(r, [on, "_salt"]).drop("_salt")
