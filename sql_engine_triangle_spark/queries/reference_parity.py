"""The reference lab's LITERAL benchmark queries over the
reference-shaped `property_sales` fixture (FIXTURES.md §1).

These are the four queries exactly as the lab runs them
(queries/q1..q4 READMEs) — town IN-list, county IS NOT NULL, exact
interpolated percentiles over price — kept OUTSIDE the driver
registry (the driver's sf dirs don't contain property_sales; the
fixture is generated deterministically in tests) and differentially
tested against DuckDB in tests/test_reference_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Q2_TOWNS = ["LONDON", "MANCHESTER", "BRISTOL", "BIRMINGHAM", "NOTTINGHAM"]


def load_property_sales(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# --- Q1: aggregation by type (q1 README.md:50-62) ----------------------------

Q1_SQL = """
SELECT type,
       count(*) AS cnt,
       round(avg(price)) AS avg_price,
       min(price) AS min_price,
       max(price) AS max_price
FROM property_sales
WHERE date >= DATE '2020-01-01'
GROUP BY type
ORDER BY avg_price DESC, type
"""


def q1(spark: SparkSession, path: str) -> DataFrame:
    ps = load_property_sales(spark, path)
    return (
        ps.filter(F.col("date") >= F.lit("2020-01-01").cast("date"))
        .groupBy("type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("price")).alias("avg_price"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
        .orderBy(F.desc("avg_price"), "type")
    )


# --- Q2: town/month rollup (q2 README.md:50-62) ------------------------------

Q2_SQL = f"""
SELECT town,
       CAST(date_trunc('month', date) AS DATE) AS month,
       count(*) AS cnt,
       round(avg(price)) AS avg_price
FROM property_sales
WHERE town IN ({', '.join(repr(t) for t in Q2_TOWNS)})
  AND date >= DATE '2020-01-01'
GROUP BY town, CAST(date_trunc('month', date) AS DATE)
ORDER BY town, month
"""


def q2(spark: SparkSession, path: str) -> DataFrame:
    ps = load_property_sales(spark, path)
    return (
        ps.filter(
            F.col("town").isin(Q2_TOWNS)
            & (F.col("date") >= F.lit("2020-01-01").cast("date"))
        )
        .groupBy(
            "town", F.date_trunc("month", F.col("date")).cast("date").alias("month")
        )
        .agg(F.count("*").alias("cnt"), F.round(F.avg("price")).alias("avg_price"))
        .orderBy("town", "month")
    )


# --- Q3: YoY window (q3 README.md:60-82) -------------------------------------

Q3_SQL = """
WITH yearly AS (
  SELECT type,
         CAST(year(date) AS INTEGER) AS yr,
         round(avg(price)) AS avg_price
  FROM property_sales
  GROUP BY type, CAST(year(date) AS INTEGER)
)
SELECT type, yr, avg_price,
       round(avg_price - lag(avg_price) OVER w) AS yoy_delta,
       round(100.0 * (avg_price - lag(avg_price) OVER w)
             / lag(avg_price) OVER w, 2) AS yoy_pct
FROM yearly
WINDOW w AS (PARTITION BY type ORDER BY yr)
ORDER BY type, yr
"""


def q3(spark: SparkSession, path: str) -> DataFrame:
    ps = load_property_sales(spark, path)
    yearly = ps.groupBy("type", F.year("date").alias("yr")).agg(
        F.round(F.avg("price")).alias("avg_price")
    )
    w = Window.partitionBy("type").orderBy("yr")
    prev = F.lag("avg_price").over(w)
    return (
        yearly.withColumn("yoy_delta", F.round(F.col("avg_price") - prev))
        .withColumn(
            "yoy_pct", F.round(F.lit(100.0) * (F.col("avg_price") - prev) / prev, 2)
        )
        .orderBy("type", "yr")
    )


# --- Q4: top counties + percentiles (q4 README.md:48-73) ---------------------

Q4_SQL = """
WITH top_counties AS (
  SELECT county, count(*) AS cnt
  FROM property_sales
  WHERE county IS NOT NULL AND date >= DATE '2020-01-01'
  GROUP BY county
  ORDER BY cnt DESC, county
  LIMIT 10
)
SELECT p.county,
       count(*) AS cnt,
       CAST(round(CAST(quantile_cont(p.price, 0.25) AS DECIMAL(28,4)), 2) AS DOUBLE) AS p25,
       CAST(round(CAST(quantile_cont(p.price, 0.50) AS DECIMAL(28,4)), 2) AS DOUBLE) AS p50,
       CAST(round(CAST(quantile_cont(p.price, 0.75) AS DECIMAL(28,4)), 2) AS DOUBLE) AS p75,
       CAST(round(CAST(quantile_cont(p.price, 0.95) AS DECIMAL(28,4)), 2) AS DOUBLE) AS p95
FROM property_sales p
JOIN top_counties tc USING (county)
WHERE p.date >= DATE '2020-01-01'
GROUP BY p.county
ORDER BY cnt DESC, p.county
"""


def q4(spark: SparkSession, path: str) -> DataFrame:
    ps = load_property_sales(spark, path).filter(
        F.col("county").isNotNull()
        & (F.col("date") >= F.lit("2020-01-01").cast("date"))
    )
    pcts = F.expr("percentile(price, array(0.25, 0.50, 0.75, 0.95))")

    def pct(i: int):
        # decimal-routed rounding — see core.py Q4_ORACLE comment.
        return F.round(F.element_at("_p", i).cast("decimal(28,4)"), 2).cast("double")

    return (
        ps.groupBy("county")
        .agg(F.count("*").alias("cnt"), pcts.alias("_p"))
        .select(
            "county",
            "cnt",
            pct(1).alias("p25"),
            pct(2).alias("p50"),
            pct(3).alias("p75"),
            pct(4).alias("p95"),
        )
        .orderBy(F.desc("cnt"), "county")
        .limit(10)
    )


REFERENCE_QUERIES = {
    "ref_q1_agg_by_type": (q1, Q1_SQL),
    "ref_q2_town_month": (q2, Q2_SQL),
    "ref_q3_yoy_window": (q3, Q3_SQL),
    "ref_q4_county_percentiles": (q4, Q4_SQL),
}
