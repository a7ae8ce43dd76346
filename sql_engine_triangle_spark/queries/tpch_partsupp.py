"""The four TPC-H shapes blocked on ``partsupp`` — Q2, Q11, Q16, Q20.

The driver fixture does not carry a partsupp table (COVERAGE.md
§2.3), so these run against the deterministic micro-fixture
``fixtures.generate.partsupp`` in pytest only: they are intentionally
NOT registered in the driver registry (the external driver would fail
them for a missing table). Each function takes an explicit
``ps_path`` (a parquet dir the test wrote), keeping the driver
contract untouched while completing 22/22 classic shapes locally.

Reference parity: these follow the canonical TPC-H Q2/Q11/Q16/Q20
semantics (decorrelated Spark-first), adapted to the fixture columns
the same way tpch_like.py adapts (no p_mfgr/s_address/s_comment —
documented per query).

Float discipline (CLAUDE.md): ps_supplycost is DECIMAL(10,2) so
min/compare/sum are exact on both engines; Q11's value sums the
2dp x int product as DECIMAL(18,2) (exact cast); Q20's half-sum
comparison is lifted to ``2*availqty > sum(qty)`` integer-exact form
instead of multiplying by 0.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table


def _ps(spark: SparkSession, ps_path: str) -> DataFrame:
    return spark.read.parquet(ps_path)


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part in a region
# ---------------------------------------------------------------------------

TPCH_Q2_ORACLE = """
WITH eligible AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_suppkey, s.s_acctbal,
         s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
mins AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost
  FROM eligible GROUP BY ps_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name,
       p.p_partkey, p.p_brand,
       CAST(e.ps_supplycost AS DOUBLE) AS supply_cost
FROM part p
JOIN eligible e ON p.p_partkey = e.ps_partkey
JOIN mins m ON e.ps_partkey = m.ps_partkey
           AND e.ps_supplycost = m.min_cost
WHERE p.p_size <= 25 AND p.p_type = 'ECONOMY'
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""


def tpch_q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str, ps_path: str
) -> DataFrame:
    """TPC-H Q2: for ECONOMY parts of size <= 25, the supplier(s)
    offering the regional minimum supply cost in EUROPE. The
    correlated MIN subquery decorrelates into a per-part aggregate
    joined back on (partkey, cost) — at scale one partkey exchange
    shared by the aggregate and the join-back; the dimension chain
    (supplier⋈nation⋈region) broadcasts. Fixture adaptation: output
    p_brand in place of the absent p_mfgr; no s_address/s_phone
    columns exist. Ties on min cost return ALL tied suppliers, as
    the spec's LIMIT-over-ordered-ties does."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "ECONOMY")
    )
    eligible = (
        _ps(spark, ps_path)
        .join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mins = (
        eligible.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .withColumnRenamed("ps_partkey", "mk")
    )
    return (
        part.join(eligible, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            mins,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification
# ---------------------------------------------------------------------------

TPCH_Q11_ORACLE = """
WITH natps AS (
  SELECT ps.ps_partkey,
         CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,2)) AS v
  FROM partsupp ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_15'
),
per_part AS (
  SELECT ps_partkey, sum(v) AS value FROM natps GROUP BY ps_partkey
),
total AS (SELECT sum(v) AS tot FROM natps)
SELECT ps_partkey, CAST(value AS DOUBLE) AS stock_value
FROM per_part, total
WHERE value * 60 > tot
ORDER BY stock_value DESC, ps_partkey
"""


def tpch_q11_important_stock(
    spark: SparkSession, sf_dir: str, ps_path: str
) -> DataFrame:
    """TPC-H Q11: parts whose stock value within one nation exceeds a
    fraction (1/60) of that nation's total. The HAVING-vs-global-
    scalar-subquery decorrelates into a broadcast 1-row total joined
    onto the per-part aggregate (same shape as tpch_q22's average).
    The fraction compare is lifted to ``value*60 > total`` — exact
    decimal arithmetic, no float fraction on either engine. Stock
    value sums DECIMAL(10,2) x INT products as DECIMAL(18,2): exact,
    order-independent."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_15"
    )
    natps = (
        _ps(spark, ps_path)
        .join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty"))
            .cast("decimal(18,2)")
            .alias("v"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("v").alias("value"))
    total = natps.agg(F.sum("v").alias("tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") * 60 > F.col("tot"))
        .select(
            "ps_partkey", F.col("value").cast("double").alias("stock_value")
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship
# ---------------------------------------------------------------------------

TPCH_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 15, 22, 28, 36, 42, 49)
  AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


def tpch_q16_supplier_relationship(
    spark: SparkSession, sf_dir: str, ps_path: str
) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size)
    excluding one brand/type and 'complaint' suppliers. The NOT IN
    subquery becomes a broadcast LeftAnti against the excluded
    supplier keys (safe: s_suppkey is non-null, so NOT IN == anti
    join). Fixture adaptation: the fixture has no s_comment, so the
    complaint predicate is the deterministic stand-in
    ``s_suppkey % 7 = 0`` — the anti-join SHAPE (the thing Q16
    exercises) is unchanged."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 15, 22, 28, 36, 42, 49))
    )
    complaints = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_suppkey") % 7 == 0
    ).select("s_suppkey")
    return (
        _ps(spark, ps_path)
        .join(
            F.broadcast(complaints),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion
# ---------------------------------------------------------------------------

TPCH_Q20_ORACLE = """
WITH wanted_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
),
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN wanted_parts w ON ps.ps_partkey = w.p_partkey
  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                 AND sh.l_suppkey = ps.ps_suppkey
  WHERE 2 * ps.ps_availqty > sh.qty
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN excess e ON s.s_suppkey = e.ps_suppkey
ORDER BY s.s_name
"""


def tpch_q20_part_promotion(
    spark: SparkSession, sf_dir: str, ps_path: str
) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock (availqty > half of
    a year's shipped quantity) of name-matched parts. The nested
    IN + correlated scalar subquery decorrelates into: lineitem
    pre-aggregated by (partkey, suppkey) — the only fact shuffle —
    inner-joined to partsupp (inner join reproduces the spec's
    NULL-comparison exclusion when no lineitems exist), then a
    distinct supplier semi-join. The half compare is lifted to
    ``2*availqty > qty``: integer-left-side exact, no 0.5 float
    factor. Fixture adaptation: no nation filter column dropped —
    the fixture supplier set is small; ordering by s_name as in the
    spec."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    excess = (
        _ps(spark, ps_path)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(excess, F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# name -> (builder, oracle) — consumed by tests/test_tpch_partsupp.py.
PARTSUPP_QUERIES = {
    "tpch_q2_min_cost_supplier": (tpch_q2_min_cost_supplier, TPCH_Q2_ORACLE),
    "tpch_q11_important_stock": (tpch_q11_important_stock, TPCH_Q11_ORACLE),
    "tpch_q16_supplier_relationship": (
        tpch_q16_supplier_relationship,
        TPCH_Q16_ORACLE,
    ),
    "tpch_q20_part_promotion": (tpch_q20_part_promotion, TPCH_Q20_ORACLE),
}
