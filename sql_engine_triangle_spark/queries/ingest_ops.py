"""Registry entry for the ingestion transform surface (S-family +
F5/F7/F9/F10) in an sf_dir-read-only form: round-trip typed columns
through strings and re-derive them — the same cast/parse/decode
operators the CSV ELT pipeline uses (sources/ingest.py holds the
file-level pipeline, exercised in tests/test_ingest.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.functions.scalar import best_effort_date, decode_enum
from sql_engine_triangle_spark.queries.registry import register

STATUS_ENUM = {"O": "open", "F": "finished", "P": "pending"}

INGEST_RT_ORACLE = """
SELECT
  o_orderkey,
  CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price_rt,
  CAST(strptime(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '%Y-%m-%d') AS DATE)
    AS date_rt,
  strftime(o_orderdate, '%Y%m') AS month,
  CASE o_orderstatus
    WHEN 'O' THEN 'open'
    WHEN 'F' THEN 'finished'
    WHEN 'P' THEN 'pending'
    ELSE o_orderstatus
  END AS status_decoded
FROM orders
ORDER BY o_orderkey
"""


@register("ingest_typed_roundtrip", oracle=INGEST_RT_ORACLE, tags=("S4", "F5", "F7", "F9", "F10"))
def ingest_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-projection operators on string-ified inputs: cast
    round-trip (F9/F10), best-effort date parse (F5), toYYYYMM month
    derivation (F4), enum decode (F7) — the ELT surface of
    README.md:142-175 expressed over the fixture."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").cast("string").cast("double").alias("price_rt"),
            best_effort_date(F.col("o_orderdate").cast("date").cast("string")).alias(
                "date_rt"
            ),
            F.date_format("o_orderdate", "yyyyMM").alias("month"),
            decode_enum(F.col("o_orderstatus"), STATUS_ENUM).alias("status_decoded"),
        )
        .orderBy("o_orderkey")
    )
