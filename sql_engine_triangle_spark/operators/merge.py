"""MERGE INTO / CDC-apply surface: upsert + delete against a base
snapshot, expressed as one full-outer join (no MERGE statement needed
— Spark's join + coalesce composes the same semantics and lets
Catalyst pick broadcast vs shuffle by the update batch's size).

At 100 TB: the base-vs-updates join shuffles on the merge key — the
classic CDC-apply shape. A small update batch broadcasts (AQE decides
from runtime stats); a co-bucketed base table (sources/bucketing.py)
makes the apply shuffle-free on the base side. Deletes are a left-anti
join on the same key, folded into the same stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Apply an update batch to a base snapshot:

    - rows present in ``updates`` replace the base row (matched →
      UPDATE; unmatched → INSERT), column-wise via coalesce;
    - rows whose key appears in ``deletes`` are dropped (matched →
      DELETE).

    ``updates`` must share the base schema, and both ``updates`` and
    ``base`` must be unique on ``key`` — the same precondition ANSI
    MERGE enforces (a duplicate update key would emit one merged row
    per duplicate instead of raising, as MERGE does). Returns the new
    snapshot.

    Matched rows take the update's columns UNCONDITIONALLY (a presence
    flag marks matched keys, not per-column coalesce), so an update
    that explicitly sets a non-key column to NULL nulls it out —
    matching ANSI MERGE ``UPDATE SET col = NULL`` semantics.
    """
    non_key = [c for c in base.columns if c != key]
    upd = updates.select(
        F.col(key),
        F.lit(True).alias("__u_present"),
        *[F.col(c).alias(f"__u_{c}") for c in non_key],
    )
    merged = base.join(upd, key, "full_outer").select(
        F.col(key),
        *[
            F.when(F.col("__u_present"), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in non_key
        ],
    )
    if deletes is not None:
        merged = merged.join(deletes.select(key).distinct(), key, "left_anti")
    return merged
