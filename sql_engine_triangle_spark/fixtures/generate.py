"""Deterministic, Spark-native fixture generation (FIXTURES.md).

Generates the reference-shaped tables (`property_sales` ≙
uk_price_paid, `retail_sales` ≙ sales_data, `user_events`) entirely
as Spark expressions over spark.range(n): every column is a pure
function of (row id, seed) via xxhash64 — deterministic across
partitionings, cluster sizes, and retries, with no driver-side data
generation. At 100 TB-scale generation this matters: spark.range
parallelizes perfectly and nothing is collected.

Distributions follow FIXTURES.md: log-normal price, zipf-ish
categorical skew (pow-transformed uniforms), weighted enums, ~2%
NULL county, the q2 IN-list towns carrying high mass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOWNS = [
    "LONDON", "MANCHESTER", "BRISTOL", "BIRMINGHAM", "NOTTINGHAM",
    "LEEDS", "SHEFFIELD", "LIVERPOOL", "YORK", "OXFORD",
    "CAMBRIDGE", "BRIGHTON", "READING", "NORWICH", "EXETER",
    "DURHAM", "BATH", "CHESTER", "DERBY", "LANCASTER",
]
COUNTIES = [
    "GREATER LONDON", "GREATER MANCHESTER", "WEST MIDLANDS", "WEST YORKSHIRE",
    "MERSEYSIDE", "SOUTH YORKSHIRE", "AVON", "NOTTINGHAMSHIRE",
    "DERBYSHIRE", "KENT", "ESSEX", "SURREY", "HAMPSHIRE", "DEVON",
    "NORFOLK", "OXFORDSHIRE", "CAMBRIDGESHIRE", "LANCASHIRE",
    "DURHAM", "CHESHIRE",
]
TYPES = ["terraced", "semi-detached", "detached", "flat", "other"]
TYPE_W = [0.30, 0.57, 0.79, 0.97, 1.0]  # cumulative .30/.27/.22/.18/.03
DURATIONS = ["freehold", "leasehold", "unknown"]
DURATION_W = [0.75, 0.99, 1.0]


def _u(seed_col: Column, salt: int) -> Column:
    """Deterministic uniform(0,1) from (row, salt)."""
    return (F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(1_000_000)) + 0.5) / 1_000_000.0


def _pick(u: Column, values: list[str], cum_weights: list[float] | None = None) -> Column:
    """Weighted categorical pick from a uniform."""
    if cum_weights is None:
        idx = F.least(F.floor(u * len(values)).cast("int"), F.lit(len(values) - 1))
        arr = F.array(*[F.lit(v) for v in values])
        return F.element_at(arr, idx + 1)
    expr: Column | None = None
    for v, w in zip(values, cum_weights):
        cond = u <= w
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(values[-1])


def property_sales(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """The wide time-series fact table (uk_price_paid shape,
    01-create-table.sql:53-73)."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed)))
    s = F.col("_s")
    u_price, u_date = _u(s, 1), _u(s, 2)
    u_pc1, u_pc2 = _u(s, 3), _u(s, 4)
    u_type, u_new, u_dur = _u(s, 5), _u(s, 6), _u(s, 7)
    u_street, u_town, u_cnty, u_null = _u(s, 8), _u(s, 9), _u(s, 10), _u(s, 11)

    # Log-normal price, median ~250k: exp(ln(250000) + 0.8*z),
    # Box-Muller from two uniforms.
    z = F.sqrt(-2.0 * F.log(u_price)) * F.cos(2.0 * 3.141592653589793 * _u(s, 12))
    price = F.least(
        F.greatest((F.exp(F.lit(12.4292) + 0.8 * z)).cast("long"), F.lit(1000)),
        F.lit(50_000_000),
    )
    # Uniform-ish dates 1995..2025 (11322 days).
    date = F.date_add(F.lit("1995-01-01").cast("date"), F.floor(u_date * 11322).cast("int"))
    # Zipf-ish postcodes (pow-skew) — ~3000/~900 distinct.
    pc1 = F.concat(
        _pick(_u(s, 13), [chr(c) for c in range(65, 91)]),
        _pick(_u(s, 14), [chr(c) for c in range(65, 91)]),
        F.floor(F.pow(u_pc1, 2.5) * 99).cast("int").cast("string"),
    )
    pc2 = F.concat(
        F.floor(F.pow(u_pc2, 1.5) * 9).cast("int").cast("string"),
        _pick(_u(s, 15), [chr(c) for c in range(65, 91)]),
        _pick(_u(s, 16), [chr(c) for c in range(65, 91)]),
    )
    town = _pick(F.pow(u_town, 2.2), TOWNS)  # pow-skew → first towns get high mass
    county = F.when(u_null < 0.02, F.lit(None).cast("string")).otherwise(
        _pick(F.pow(u_cnty, 1.8), COUNTIES)
    )
    return df.select(
        price.alias("price"),
        date.alias("date"),
        pc1.alias("postcode1"),
        pc2.alias("postcode2"),
        _pick(u_type, TYPES, TYPE_W).alias("type"),
        (u_new < 0.10).alias("is_new"),
        _pick(u_dur, DURATIONS, DURATION_W).alias("duration"),
        F.concat(F.lit(""), F.floor(_u(s, 17) * 200).cast("int").cast("string")).alias("addr1"),
        F.lit("").alias("addr2"),
        F.concat(_pick(u_street, TOWNS), F.lit(" ST ")).alias("street"),
        F.lit("").alias("locality"),
        town.alias("town"),
        F.concat(F.lit("D"), F.floor(_u(s, 18) * 400).cast("int").cast("string")).alias(
            "district"
        ),
        county.alias("county"),
    )


def retail_sales(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """sales_data shape (01-create-table.sql:5-17): the model's only
    decimal + timestamp columns."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed + 1)))
    s = F.col("_s")
    sale_date = F.date_add(F.lit("2024-01-01").cast("date"), F.floor(_u(s, 1) * 365).cast("int"))
    return df.select(
        F.col("id"),
        F.concat(F.lit("product_"), F.floor(_u(s, 2) * 500).cast("int").cast("string")).alias(
            "product_name"
        ),
        _pick(_u(s, 3), ["Electronics", "Furniture", "Clothing", "Food", "Sports",
                         "Books", "Toys", "Garden", "Auto", "Health"]).alias("category"),
        (F.round(_u(s, 4) * 999.0 + 1.0, 2)).cast("decimal(10,2)").alias("price"),
        (F.floor(_u(s, 5) * 100).cast("int") + 1).alias("quantity"),
        sale_date.alias("sale_date"),
        (sale_date.cast("timestamp") + F.make_interval(secs=F.floor(_u(s, 6) * 86400))).alias(
            "created_at"
        ),
    )


def user_events(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """user_events shape (01-create-table.sql:31-41) with ~5%
    late/out-of-order events to exercise watermarks."""
    df = spark.range(n_rows).withColumn("_s", F.xxhash64("id", F.lit(seed + 2)))
    s = F.col("_s")
    base_ts = F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
        secs=F.col("id") * 30  # monotone arrival
    )
    late = _u(s, 1) < 0.05
    ts = F.when(
        late, base_ts - F.make_interval(secs=F.floor(_u(s, 2) * 36000))
    ).otherwise(base_ts)
    return df.select(
        F.floor(F.pow(_u(s, 3), 2.0) * 10_000).cast("long").alias("user_id"),
        _pick(_u(s, 4), ["page_view", "click", "scroll", "purchase", "logout"]).alias(
            "event_type"
        ),
        ts.alias("event_time"),
        F.concat(F.lit("/page/"), F.floor(_u(s, 5) * 200).cast("int").cast("string")).alias(
            "page_url"
        ),
        F.floor(_u(s, 6) * 600).cast("int").alias("duration"),
    )


def partsupp(spark: SparkSession, n_parts: int, n_suppliers: int, seed: int = 42) -> DataFrame:
    """TPC-H ``partsupp``-shaped micro-fixture: exactly 4 supplier
    offers per part (the TPC-H multiplicity), deterministic from
    (row id, seed) like every other fixture table — no driver-side
    data. The driver's testdata does not carry partsupp
    (COVERAGE.md §2.3), so the four blocked classic shapes
    (Q2/Q11/Q16/Q20) run against this table in pytest only.

    Supplier assignment uses offsets ``i * (n_suppliers div 4)`` from
    the part key, mod n_suppliers — distinct for i in 0..3 whenever
    n_suppliers >= 4 (3 * floor(n/4) < n), mirroring TPC-H's
    stride-based ps_suppkey formula. ps_supplycost is DECIMAL(10,2)
    (exact min/compare on both engines)."""
    per_part = 4
    if n_suppliers < per_part:
        # With fewer suppliers than offers the stride offsets collapse
        # mod n_suppliers and (ps_partkey, ps_suppkey) stops being a
        # primary key — fail loudly instead of silently emitting a
        # non-PK table (ADVICE r5).
        raise ValueError(
            f"partsupp needs n_suppliers >= {per_part} for the TPC-H "
            f"4-distinct-offers multiplicity; got {n_suppliers}"
        )
    step = max(1, n_suppliers // per_part)
    df = spark.range(n_parts * per_part).withColumn(
        "_s", F.xxhash64("id", F.lit(seed + 7))
    )
    s = F.col("_s")
    partkey = F.expr(f"id div {per_part}")
    i = F.pmod(F.col("id"), F.lit(per_part))
    suppkey = F.pmod(partkey + i * step, F.lit(n_suppliers))
    return df.select(
        partkey.alias("ps_partkey"),
        suppkey.cast("long").alias("ps_suppkey"),
        (F.pmod(s, F.lit(9999)) + 1).cast("int").alias("ps_availqty"),
        (F.round(_u(s, 1) * 999.0 + 1.0, 2)).cast("decimal(10,2)").alias(
            "ps_supplycost"
        ),
    )


def compute_probes(df: DataFrame, date_col: str, distinct_cols: list[str]) -> dict:
    """Ground-truth probes (FIXTURES.md §5, clickhouse/queries.sql):
    row count, date range, distinct cardinalities — one aggregate pass."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min(date_col).alias("min_date"),
        F.max(date_col).alias("max_date"),
    ] + [F.countDistinct(c).alias(f"n_{c}") for c in distinct_cols]
    row = df.agg(*aggs).head()
    return row.asDict()
