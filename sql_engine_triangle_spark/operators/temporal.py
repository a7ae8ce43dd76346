"""Temporal join operators: as-of join (point-in-time lookup).

Spark has no native ASOF JOIN; the naive formulation (range join +
per-left-row max) explodes quadratically per key. This implements the
scalable union-sort form:

  tag right rows 0 and left rows 1, union on (key, time, tag),
  carry the right payload as a struct, and take
  last(payload, ignorenulls) over
    (PARTITION BY key ORDER BY time, tag, tie) ROWS UNBOUNDED PRECEDING
  → for every left row that is exactly the most recent right row with
  right_time <= left_time. One shuffle on the key, one sort — the
  same cost profile as a sort-merge join, no range explosion.

Oracle: DuckDB's native ASOF JOIN (see queries/llm_ops registry
entry), making this one of the few engines where a custom Spark
operator is differentially tested against a first-class SQL
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tie_col: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of
    the latest right row with right_time <= left_time (inclusive),
    matching on `on`. Left rows with no prior right row get NULL
    payload (LEFT ASOF semantics).

    `tie_col` breaks ties among right rows sharing the same
    timestamp deterministically (the max tie_col wins, matching a
    dedup-to-latest pre-pass in the oracle).
    """
    lcols = left.columns
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        (F.col(tie_col) if tie_col else F.lit(0)).alias("_tie"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None)
        .cast(r_tag.schema["_payload"].dataType)
        .alias("_payload"),
        *[F.col(c) for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        r_tag.unionByName(l_tag)
        .withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    out_cols = [F.col(c) for c in lcols] + [
        F.col(f"_asof.{p}").alias(f"{prefix}{p}") for p in right_payload
    ]
    return joined.select(*out_cols)
