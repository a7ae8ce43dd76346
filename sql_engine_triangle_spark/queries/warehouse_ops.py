"""Warehouse-pattern queries added late in round 4: SCD2 history
build, batch sessionization, winsorized aggregates, and the TPC-H Q18
big-order shape.

These round out the classic-warehouse surface next to aux_ops'
merge/latest-per-key/forward-fill family: SCD2 and sessionization are
the two standard "turn an event stream into analysis-ready state"
transforms, winsorization is the robust-aggregate discipline every
metrics pipeline needs, and Q18 adds the HAVING-on-fact-aggregate
semi-join missing from the Q3/Q5/Q10 trio in tpch_like.py.

Timestamp discipline: raw TimestampType outputs are safe to hash
against the oracle under the UTC driver contract (catalog.py); all
DURATIONS are emitted as integer microsecond diffs (unix_micros /
epoch_us), which are session-timezone-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.queries.registry import register

SCD2_ORACLE = """
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS version,
       value,
       ts AS effective_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS effective_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, version
"""


@register("w_scd2_history", oracle=SCD2_ORACLE, tags=("W1", "W3"))
def w_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: each user's purchase
    stream becomes versioned validity intervals — effective_from = the
    event, effective_to = the NEXT event (NULL = current row), the
    standard lead()-closure every warehouse uses to build dimension
    history from a change stream. One exchange keyed user_id; both
    window functions (lead + row_number) share one sort. event_id
    tie-breaks equal timestamps so version numbering is deterministic.
    At 100 TB: dimension history builds are bounded by the entity key
    cardinality, and the single hash exchange on that key is the
    minimum any engine needs; no self-join, no range explosion."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).alias("version"),
            "value",
            F.col("ts").alias("effective_from"),
            F.lead("ts").over(w).alias("effective_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 24 HOUR
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("w_sessionize", oracle=SESSIONIZE_ORACLE, tags=("W1", "A5"))
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 24 h inactivity gap: the classic
    lag-flag + running-sum session_id assignment (the batch twin of
    streaming_ops' session_window aggregation, but emitting the
    row-level session assignment a warehouse joins back to facts).
    Both windows share one user_id exchange and one sort; the closing
    per-session rollup re-keys to (user_id, session_id) — at scale the
    second exchange moves one row per event, already narrow, and
    session counts shrink it ~8x. duration_us is an integer micros
    diff (timezone-invariant, catalog.py contract)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > 24 * 3600 * 1_000_000), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


WINSORIZE_ORACLE = """
WITH pct AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events
  GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       round(avg(e.value), 4) AS avg_raw,
       round(avg(least(greatest(e.value, p.p05), p.p95)), 4) AS avg_winsorized,
       round(p.p05, 4) AS p05,
       round(p.p95, 4) AS p95
FROM events e JOIN pct p ON e.event_type = p.event_type
GROUP BY e.event_type, p.p05, p.p95
ORDER BY e.event_type
"""


@register("f_winsorize", oracle=WINSORIZE_ORACLE, tags=("A9", "F1"))
def f_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clipped) per-group means — the robust
    aggregate a metrics pipeline uses when raw means are outlier-
    hostage. Two-phase: exact interpolated percentiles per group
    (one shuffle, same A9 kernel the oracle's quantile_cont matches),
    BROADCAST the tiny per-group bounds back onto the fact, aggregate
    clipped values (second shuffle on the same key). At 100 TB the
    bounds table stays group-cardinality-sized; nothing quadratic.
    avg over doubles rounds to 4 dp (accumulation-order discipline,
    llm_ops header)."""
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    clipped = ev.join(F.broadcast(pct), "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_raw"),
            F.round(F.avg("wv"), 4).alias("avg_winsorized"),
            F.round(F.first("p05"), 4).alias("p05"),
            F.round(F.first("p95"), 4).alias("p95"),
        )
        .orderBy("event_type")
    )


TPCH_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS odate,
       o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("tpch_q18_big_orders", oracle=TPCH_Q18_ORACLE, tags=("J1", "A4", "A13", "O3"))
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds a threshold, joined back to orders+customer
    for reporting. The defining feature vs Q3/Q5/Q10 is HAVING on a
    FACT-side aggregate — the fact table aggregates FIRST (partial+
    final on l_orderkey), and only the tiny qualifying set joins
    onward, so the join input is post-aggregation — the shape Catalyst
    cannot reorder into and which an engine must get right to avoid
    shuffling the whole fact twice. Quantities sum as DECIMAL (exact,
    order-independent, tpch_like.py discipline). Top-20 via
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey", F.col("_sq").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def _zorder_oracle() -> str:
    from sql_engine_triangle_spark.sources.layout import zorder_sql

    return f"""
WITH src AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
  FROM lineitem WHERE l_orderkey <= 2000
),
b AS (
  SELECT min(l_partkey) AS lo_a, greatest(max(l_partkey) - min(l_partkey), 1) AS sp_a,
         min(l_suppkey) AS lo_b, greatest(max(l_suppkey) - min(l_suppkey), 1) AS sp_b
  FROM src
),
s AS (
  SELECT l_orderkey, l_linenumber,
         ((l_partkey - lo_a) * 255) // sp_a AS sa,
         ((l_suppkey - lo_b) * 255) // sp_b AS sb
  FROM src, b
)
SELECT l_orderkey, l_linenumber,
       {zorder_sql('sa', 'sb', 8)} AS zval
FROM s
ORDER BY l_orderkey, l_linenumber
"""


@register("layout_zorder_key", oracle=_zorder_oracle(), tags=("LAYOUT",))
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) —
    the multi-column layout primitive behind OPTIMIZE ZORDER BY:
    interleaving the bit patterns of both keys into one sort value
    clusters rows so every output file covers a narrow range of BOTH
    columns, making parquet min/max stats prune two-dimensional
    predicates (a single-key sort prunes only its own column; the
    effectiveness delta is measured in tests/test_bucketing.py).

    The z-value is pure codegen'd bit arithmetic (shift/and/or — no
    UDF, no shuffle); domain normalization is integer floor-division
    into an 8-bit grid. The ORACLE SQL is GENERATED from the same
    interleave definition (layout.zorder_sql), so the two engines
    compute structurally identical expressions."""
    from sql_engine_triangle_spark.sources import layout as L

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    lo_a, hi_a, lo_b, hi_b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    z = L.zorder_value(
        L._scale_expr("l_partkey", int(lo_a), int(hi_a), 8),
        L._scale_expr("l_suppkey", int(lo_b), int(hi_b), 8),
        8,
    )
    return (
        li.select("l_orderkey", "l_linenumber", z.alias("zval"))
        .orderBy("l_orderkey", "l_linenumber")
    )


HLL_ROLLUP_ORACLE = """
SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR) AS ym,
       count(DISTINCT o_custkey) AS exact_uniques,
       TRUE AS est_within_5pct
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY ym
ORDER BY ym
"""


@register("a_hll_partial_rollup", oracle=HLL_ROLLUP_ORACLE, tags=("A10", "A11"))
def a_hll_partial_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pre-aggregation pattern that
    makes distinct-counting feasible at 100 TB: per-DAY HLL sketches
    (Apache DataSketches via hll_sketch_agg) are UNIONED up to months
    (hll_union_agg) without touching raw rows again. count(DISTINCT)
    does not decompose over pre-aggregates (distinct counts don't
    add); sketch union is the standard fix — daily tiles are built
    once and every coarser rollup (month/quarter/year, any
    dimension subset) derives by union, exactly the reuse discipline
    of the reference lab's pre-aggregated marts.

    Validation form (q4_approx_percentiles pattern): rows carry the
    EXACT per-month uniques (oracle-computable), plus a deterministic
    ``est_within_5pct`` boolean certifying the union-derived estimate
    against it (HLL lgK=12 standard error ≈0.8%, so 5% is ~6 sigma —
    deterministic given data; the raw estimate is engine-specific and
    cannot itself be the oracle)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    base = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.col("o_orderdate").cast("date").alias("day"),
        "o_custkey",
    )
    daily = base.groupBy("ym", "day").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    monthly_est = daily.groupBy("ym").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = base.groupBy("ym").agg(
        F.count_distinct("o_custkey").alias("exact_uniques")
    )
    return (
        exact.join(monthly_est, "ym")
        .select(
            "ym",
            "exact_uniques",
            (
                F.abs(F.col("est") - F.col("exact_uniques"))
                <= 0.05 * F.col("exact_uniques")
            ).alias("est_within_5pct"),
        )
        .orderBy("ym")
    )


PCTL_ROLLUP_ORACLE = """
WITH c AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR) AS ym,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT ym,
       CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(cents, 0.50) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95_cents,
       TRUE AS p50_est_ok,
       TRUE AS p95_est_ok
FROM c
GROUP BY ym
ORDER BY ym
"""


@register("a_percentile_partial_rollup", oracle=PCTL_ROLLUP_ORACLE, tags=("A9", "A10"))
def a_percentile_partial_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE tiles — the percentile counterpart of
    a_hll_partial_rollup (VERDICT r7 #4), closing the mergeable-sketch
    family (HLL distinct tiles, exact bitmap tiles, now quantile
    tiles): per-DAY KLL sketches (DataSketches via
    kll_sketch_agg_bigint on integer cents) merged up to months
    (kll_merge_agg_bigint) without touching raw rows again. Exact
    percentiles do not decompose over pre-aggregates (a month's p95 is
    not derivable from day p95s); mergeable sketch state is the
    standard fix — daily tiles are built once and every coarser rollup
    (month/quarter/year) derives by merge, the same pre-aggregation
    reuse discipline as the lab's quantileTDigest marts (BASELINE.md
    q4 CH row).

    Validation form (the a_hll_partial_rollup pattern): rows carry the
    EXACT per-month discrete percentiles (oracle-computable on integer
    cents), plus deterministic ``p50_est_ok``/``p95_est_ok`` booleans
    certifying the merge-derived estimate. The sketch's estimated
    quantile VALUE is engine-specific, so certification inverts it:
    read est = get_quantile(merged, p) (literal p — the rank readout
    requires a foldable probe, verified), then count the exact
    inclusive rank of est fact-side and assert the share is within
    5% + 1/n of p — ALL-INTEGER compare (|100*cnt - 100p*n| <=
    5n + 100), no float discipline. The 1/n term covers the discrete
    rank granularity at small months (at sf0.001 a month has ~18
    orders, where ceil(p*n)/n alone deviates by up to 1/n); 5% is
    ~3x the KLL k=200 99%-confidence rank error — deterministic given
    data by the HLL-rollup 6-sigma argument. Measured worst deviation
    on the fixture: 0.53% at sf0.01/sf0.1.

    Scale shape: tile build is one (ym, day) exchange; the merge is a
    month-cardinality aggregation over day-cardinality sketch rows;
    the 12-row estimate frame broadcasts back onto the fact for the
    exact-rank count, which shares ONE aggregation with the exact
    twin (no second fact exchange). At 100 TB only the tile build
    touches raw data — rollups are sketch-sized."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    base = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    daily = base.groupBy("ym", "day").agg(F.kll_sketch_agg_bigint("cents").alias("sk"))
    monthly = (
        daily.groupBy("ym")
        .agg(F.kll_merge_agg_bigint("sk").alias("msk"))
        .select(
            "ym",
            F.kll_sketch_get_quantile_bigint("msk", F.lit(0.5)).alias("est50"),
            F.kll_sketch_get_quantile_bigint("msk", F.lit(0.95)).alias("est95"),
        )
    )
    agg = (
        base.join(F.broadcast(monthly), "ym")
        .groupBy("ym")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY cents)")
            .cast("long")
            .alias("p50_cents"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
            .cast("long")
            .alias("p95_cents"),
            F.sum((F.col("cents") <= F.col("est50")).cast("long")).alias("c50"),
            F.sum((F.col("cents") <= F.col("est95")).cast("long")).alias("c95"),
        )
    )
    return agg.select(
        "ym",
        "n",
        "p50_cents",
        "p95_cents",
        (F.abs(100 * F.col("c50") - 50 * F.col("n")) <= 5 * F.col("n") + 100).alias(
            "p50_est_ok"
        ),
        (F.abs(100 * F.col("c95") - 95 * F.col("n")) <= 5 * F.col("n") + 100).alias(
            "p95_est_ok"
        ),
    ).orderBy("ym")


TWA_ORACLE = """
WITH seg AS (
  SELECT user_id,
         CAST(strftime(CAST(ts AS DATE), '%Y-%m-%d') AS VARCHAR) AS day,
         value,
         epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY epoch_us(ts), event_id) AS next_us
  FROM events
  WHERE user_id <= 50
)
SELECT user_id, day,
       CAST(sum(next_us - us) AS BIGINT) AS span_us,
       round(sum(value * (next_us - us)) / sum(next_us - us), 6) AS twa
FROM seg
WHERE next_us IS NOT NULL
GROUP BY user_id, day
HAVING sum(next_us - us) > 0
ORDER BY user_id, day
"""


@register("w_time_weighted_avg", oracle=TWA_ORACLE, tags=("W1", "A4"))
def w_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over IRREGULAR samples — the hypertable
    rollup primitive (TimescaleDB's time_weight): each reading holds
    its value until the next one, so the day's average weights each
    value by its holding duration, not its sample count (a plain avg
    over-counts bursts). One (user, day) window supplies the
    next-sample timestamp (lead); the weighted aggregation shares the
    same exchange. Weights are integer microsecond spans — exact; the
    final ratio is the only float op, rounded to normalize repr."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    day = F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
    us = F.unix_micros("ts")
    base = ev.select(
        "user_id", day.alias("day"), "value", us.alias("us"), "event_id"
    )
    w = Wnd.partitionBy("user_id", "day").orderBy("us", "event_id")
    seg = base.withColumn("next_us", F.lead("us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.sum(F.col("next_us") - F.col("us")).alias("span_us"),
            F.round(
                F.sum(F.col("value") * (F.col("next_us") - F.col("us")))
                / F.sum(F.col("next_us") - F.col("us")),
                6,
            ).alias("twa"),
        )
        .filter(F.col("span_us") > 0)
        .orderBy("user_id", "day")
    )


OHLC_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         date_trunc('hour', ts) AS bar_ts,
         value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar_ts,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_ticks
FROM ranked
GROUP BY event_type, bar_ts
ORDER BY event_type, bar_ts
"""


@register("a_ohlc_bars", oracle=OHLC_ORACLE, tags=("A2", "A6", "W1"))
def a_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the canonical timeseries downsample
    (open/high/low/close per hour per series): positional endpoints
    (first/last by (ts, event_id)) come from two row_number windows
    over ONE (series, hour) partitioning — Spark evaluates both in a
    single sort pass (ascending rank + descending rank share the
    partition; the second direction is a reversed scan, not a second
    exchange) — folded into the same aggregation that takes high/low.
    Values pass through raw (no float arithmetic), so no rounding is
    needed anywhere."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts"))
    base = ev.select(
        "event_type", bar.alias("bar_ts"), "value", "ts", "event_id"
    )
    wa = Wnd.partitionBy("event_type", "bar_ts").orderBy("ts", "event_id")
    wd = Wnd.partitionBy("event_type", "bar_ts").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        base.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "bar_ts")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .orderBy("event_type", "bar_ts")
    )


GAP_FILL_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h, round(avg(value), 6) AS v
  FROM events WHERE user_id <= 20
  GROUP BY user_id, date_trunc('hour', ts)
),
bounds AS (
  SELECT user_id, min(h) AS h_lo, max(h) AS h_hi FROM hourly GROUP BY user_id
),
grid AS (
  SELECT b.user_id, g.h
  FROM bounds b,
       LATERAL (SELECT unnest(generate_series(b.h_lo, b.h_hi,
                                              INTERVAL 1 HOUR)) AS h) g
),
joined AS (
  SELECT g.user_id, g.h, o.v,
         epoch_us(g.h) // 3600000000 AS hn
  FROM grid g LEFT JOIN hourly o ON o.user_id = g.user_id AND o.h = g.h
),
ctx AS (
  SELECT user_id, h, v, hn,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hn END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY hn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hn
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hn END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY hn
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined
)
SELECT user_id, CAST(hn AS BIGINT) AS hour_num,
       v IS NOT NULL AS observed,
       CASE WHEN v IS NOT NULL
            THEN CAST(CAST(round(v * 1000000) AS BIGINT) AS DOUBLE) / 1000000.0
            ELSE CAST(CAST(round(pv * 1000000) AS BIGINT) * (nh - hn)
                      + CAST(round(nv * 1000000) AS BIGINT) * (hn - ph) AS DOUBLE)
                 / CAST((nh - ph) * 1000000 AS DOUBLE)
       END AS v_interp
FROM ctx
WHERE pv IS NOT NULL AND nv IS NOT NULL
ORDER BY user_id, hour_num
"""


@register("w_gap_fill_interpolate", oracle=GAP_FILL_ORACLE, tags=("W1", "F2"))
def w_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with LINEAR interpolation — with LOCF (w_forward_fill)
    and TWA (w_time_weighted_avg), the third hypertable resampling
    primitive: per-user hourly averages are projected onto each
    user's dense hourly grid, and missing hours interpolate linearly
    between the surrounding observations ((h-hp)/(hn-hp) integer hour
    fractions). The grid is generated per user with sequence/explode
    (a bounded flat map — |hours in range|, not |events|); previous/
    next observations come from two IGNORE-NULLS value windows over
    ONE user ordering (running + reverse frame share the sort). Edge
    rows without both neighbors are excluded (interior interpolation
    only). Rounded 6 dp at the grid aggregation and the final
    expression — the interpolation itself is arithmetic on already-
    rounded inputs with exact integer weights."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h_lo", "h_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").withColumn(
        "hn", F.expr("unix_micros(h) div 3600000000")
    )
    run = (
        Wnd.partitionBy("user_id")
        .orderBy("hn")
        .rowsBetween(Wnd.unboundedPreceding, 0)
    )
    rev = (
        Wnd.partitionBy("user_id")
        .orderBy("hn")
        .rowsBetween(0, Wnd.unboundedFollowing)
    )
    marked_h = F.when(F.col("v").isNotNull(), F.col("hn"))
    ctx = (
        joined.withColumn("pv", F.last("v", ignorenulls=True).over(run))
        .withColumn("ph", F.last(marked_h, ignorenulls=True).over(run))
        .withColumn("nv", F.first("v", ignorenulls=True).over(rev))
        .withColumn("nh", F.first(marked_h, ignorenulls=True).over(rev))
    )
    to_mu = lambda c: F.round(c * 1_000_000).cast("long")  # noqa: E731
    interp = (
        (
            to_mu(F.col("pv")) * (F.col("nh") - F.col("hn"))
            + to_mu(F.col("nv")) * (F.col("hn") - F.col("ph"))
        ).cast("double")
        / ((F.col("nh") - F.col("ph")) * 1_000_000).cast("double")
    )
    observed_v = to_mu(F.col("v")).cast("double") / F.lit(1_000_000.0)
    return (
        ctx.filter(F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            "user_id",
            F.col("hn").cast("long").alias("hour_num"),
            F.col("v").isNotNull().alias("observed"),
            F.when(F.col("v").isNotNull(), observed_v)
            .otherwise(interp)
            .alias("v_interp"),
        )
        .orderBy("user_id", "hour_num")
    )


MAD_OUTLIERS_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
  FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, c.cents, m.med_cents,
         abs(c.cents - m.med_cents) AS adev
  FROM c JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       any_value(d.med_cents) AS med_cents,
       any_value(m2.mad_cents) AS mad_cents,
       CAST(count(*) FILTER (WHERE d.adev > 3 * m2.mad_cents) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m2 USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("a_mad_outliers", oracle=MAD_OUTLIERS_ORACLE, tags=("A9", "A5"))
def a_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation robust outlier detection per group —
    the robust twin of z-score filtering (median and MAD are immune
    to the outliers being hunted, unlike mean/stddev), the standard
    anomaly gate for metric streams. Two exact-percentile passes
    (median, then median of absolute deviations) with the per-group
    scalars riding broadcast joins, then one counting pass — the
    winsorize/f_winsorize shape doubled.

    Float discipline: values are lifted to exact integer CENTS via
    floor(x*100 + 0.5) — Spark's double->long CAST truncates while
    DuckDB's rounds, so the explicit floor is the only
    engine-portable rounding. Interpolated medians of integers are
    exact halves (k or k+0.5 — representable), so |x-med|, 3*MAD and
    the outlier comparison are all EXACT arithmetic on both engines;
    no rounding of the emitted medians is needed.

    At 100 TB: exact MAD is inherently two passes over the fact; the
    approx path swaps percentile -> approx_percentile per pass with
    the same plan shape (the q4_approx_percentiles relationship)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    c = ev.select("event_type", cents.alias("cents"))
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.first("med_cents").alias("med_cents"),
            F.first("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


HEAVY_HITTERS_ORACLE = r"""
WITH t AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents
),
counted AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY term
),
total AS (SELECT sum(cnt) AS tot FROM counted)
SELECT term, cnt,
       CAST(cnt AS DOUBLE) / tot AS share,
       TRUE AS sketch_found_ok
FROM counted, total
WHERE cnt * 50 >= tot
ORDER BY cnt DESC, term
"""


@register("a_heavy_hitters", oracle=HEAVY_HITTERS_ORACLE, tags=("A10", "LLM-text"))
def a_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-term detection with a sketch certification — the
    validation-form pattern of q4_approx_percentiles applied to
    heavy hitters: rows are the EXACT terms with frequency >= 1/50
    of all tokens (oracle-computable; the fraction compare is lifted
    to ``cnt*50 >= tot``, integer-exact), plus ``sketch_found_ok`` —
    whether Spark's freqItems sketch (Karp/Misra-Gries family)
    returned every true heavy hitter. That flag is deterministically
    TRUE by the algorithm's guarantee (the sketch may over-report,
    never under-report at support = the true threshold), making the
    certification hash-stable while actually executing the sketch.

    Scale shape: the exact side is one explode -> groupBy (map-side
    combined) with a broadcast 1-row total; the sketch side is
    single-pass mergeable state, the piece that survives when the
    exact groupBy's term domain no longer fits (the
    a_hll_partial_rollup relationship)."""
    from sql_engine_triangle_spark.operators import textops

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(textops.tokens(F.col("text"))).alias("term")
    )
    counted = terms.groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    total = counted.agg(F.sum("cnt").alias("tot"))
    exact = (
        counted.join(F.broadcast(total))
        .filter(F.col("cnt") * 50 >= F.col("tot"))
        .select(
            "term",
            "cnt",
            (F.col("cnt").cast("double") / F.col("tot")).alias("share"),
        )
    )
    # Sketch pass: freqItems at support slightly BELOW the exact
    # threshold. The no-false-negative guarantee only covers items
    # with frequency strictly GREATER than support, so a term at
    # exactly 1/50 share (cnt*50 == tot, which the exact filter
    # includes) could legally be missed at support=0.02; 0.019 makes
    # the guarantee strictly cover the >= 1/50 exact set (ADVICE r5).
    # Bounded output (<= 1/support items) — a scalar-class driver
    # fetch, like the IVF quantizer seeds.
    sketch_terms = set(
        terms.stat.freqItems(["term"], support=0.019).head()[0]
    )
    exact_terms = {r.term for r in exact.select("term").collect()}
    found = exact_terms.issubset(sketch_terms)
    return (
        exact.withColumn("sketch_found_ok", F.lit(bool(found)))
        .orderBy(F.desc("cnt"), "term")
    )


MAINT_INCR_AGG_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       CAST(max(value) AS DOUBLE) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("maint_incremental_agg", oracle=MAINT_INCR_AGG_ORACLE, tags=("A4", "A5"))
def maint_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the corpus is
    split (deterministic md5 bucket) into a 90% BASE whose aggregate
    snapshot already exists and a 10% DELTA batch; the delta's
    partial aggregate merges into the snapshot WITHOUT touching base
    rows — count/sum/max are mergeable state, so the refresh cost is
    O(|delta| + |groups|), the entire point of incremental view
    maintenance. The oracle recomputes from scratch; equality IS the
    maintenance-correctness claim (same pattern as j_skew_salted's
    plain-join oracle). Sums are decimal-routed; the merge is a
    group-key full-outer join with coalesced partials (a key may
    exist in only one side). At 100 TB the base snapshot is a stored
    table and only the delta is scanned — here both sides derive
    from one fixture scan, which Catalyst shares."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int"),
        F.lit(10),
    )
    ev = ev.withColumn("_bk", bucket)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
            F.max("value").alias("m"),
        )

    base = agg(ev.filter(F.col("_bk") < 9))
    delta = agg(ev.filter(F.col("_bk") >= 9))
    b = base.select(
        "event_type",
        F.col("n").alias("bn"),
        F.col("s").alias("bs"),
        F.col("m").alias("bm"),
    )
    d = delta.select(
        "event_type",
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
        F.col("m").alias("dm"),
    )
    return (
        b.join(d, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce(F.col("bn"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
            .cast("long")
            .alias("n_events"),
            (
                F.coalesce(F.col("bs"), F.lit(0).cast("decimal(12,2)"))
                + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("total_value"),
            F.greatest(
                F.coalesce(F.col("bm"), F.col("dm")),
                F.coalesce(F.col("dm"), F.col("bm")),
            )
            .cast("double")
            .alias("max_value"),
        )
        .orderBy("event_type")
    )


def _pagerank_iter_sql(prev: str, label: str) -> str:
    """One unrolled integer-PageRank iteration as a DuckDB CTE — the
    oracle twin is GENERATED from one definition (the layout.zorder_sql
    discipline) so the engines cannot drift."""
    return f"""{label} AS (
  SELECT n.node, CAST(150000 + COALESCE(s.acc, 0) AS BIGINT) AS mass
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum((m.mass * 85 // 100) // o.deg) AS acc
    FROM {prev} m
    JOIN edges e ON e.src = m.node
    JOIN outd o ON o.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""


PAGERANK_ITERS = 5

PAGERANK_ORACLE = (
    """
WITH seq AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         lead(CAST(json_extract_string(props, '$.k') AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
  FROM events
),
edges AS (
  SELECT DISTINCT k AS src, nk AS dst
  FROM seq WHERE nk IS NOT NULL AND nk <> k
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
"""
    + ",\n".join(
        _pagerank_iter_sql(f"m{i}", f"m{i + 1}") for i in range(PAGERANK_ITERS)
    )
    + f"""
SELECT node, mass AS pr_mass FROM m{PAGERANK_ITERS} ORDER BY node
"""
)


@register("graph_pagerank", oracle=PAGERANK_ORACLE, tags=("graph", "A5"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the content-navigation graph
    (consecutive per-user content ids from the event stream), with
    INTEGER-EXACT arithmetic so five iterations stay bit-identical
    across engines: masses live in micro-units, damping and
    out-degree splits are floor divisions (``mass*85 div 100 div
    deg`` — Spark ``div`` == DuckDB ``//`` on positive BIGINT), the
    teleport term is the integer 150000, and truncation remainders
    deterministically evaporate. Float PageRank cannot be
    differentially tested across engines (per-iteration sum order
    amplifies); the integer lift is what makes an iterative
    fixpoint algorithm externally hash-checkable at all.

    Plan shape: each iteration is one edges⋈mass join keyed src +
    one dst-keyed aggregation — the canonical distributed PageRank
    step; masses localCheckpoint between iterations (the graph.py
    discipline: truncate lineage, no driver-side data). The oracle
    unrolls the same five iterations as generated CTEs from ONE
    shared definition. At 100 TB: |nodes| bounds the mass frame,
    edges partition by src, and AQE handles hub skew — same
    contract as connected_components_star."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", k.alias("k")).withColumn(
        "nk", F.lead("k").over(w)
    )
    edges = (
        seq.filter(F.col("nk").isNotNull() & (F.col("nk") != F.col("k")))
        .select(F.col("k").alias("src"), F.col("nk").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outd = edges.groupBy("src").agg(F.count("*").alias("deg"))
    mass = nodes.withColumn("mass", F.lit(1_000_000).cast("long"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(mass, F.col("src") == F.col("node"))
            .join(outd, "src")
            .select(
                F.col("dst").alias("cnode"),
                F.expr("(mass * 85 div 100) div deg").alias("share"),
            )
            .groupBy("cnode")
            .agg(F.sum("share").alias("acc"))
        )
        mass = (
            nodes.join(contrib, F.col("node") == F.col("cnode"), "left")
            .select(
                "node",
                (F.lit(150000) + F.coalesce(F.col("acc"), F.lit(0)))
                .cast("long")
                .alias("mass"),
            )
            .localCheckpoint()
        )
    return mass.select("node", F.col("mass").alias("pr_mass")).orderBy("node")


TRIANGLE_ORACLE = """
WITH seq AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         lead(CAST(json_extract_string(props, '$.k') AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
  FROM events
),
und AS (
  SELECT DISTINCT least(k, nk) AS a, greatest(k, nk) AS b
  FROM seq WHERE nk IS NOT NULL AND nk <> k
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(count(DISTINCT v) AS BIGINT)
        FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)) AS n_nodes
FROM und e1
JOIN und e2 ON e2.a = e1.b
JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@register("graph_triangle_count", oracle=TRIANGLE_ORACLE, tags=("graph", "J1"))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the undirected content-navigation graph
    — the canonical big-graph analytics kernel (clustering
    coefficient, community density). Edges orient low->high node id,
    so each triangle {a<b<c} is counted exactly once by the two-hop
    join e1=(a,b) ⋈ e2=(b,c) closed by e3=(a,c). Both joins are
    equi-joins keyed on node ids — at 100 TB the standard
    optimization stands: orienting edges toward the higher-DEGREE
    endpoint bounds the two-hop fan-out by sqrt(|E|) per node
    (documented; id-orientation keeps the oracle trivially
    replayable). Pure integer counts, exact on both engines."""
    ev = load_table(spark, sf_dir, "events")
    kcol = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", kcol.alias("k")).withColumn(
        "nk", F.lead("k").over(w)
    )
    und = (
        seq.filter(F.col("nk").isNotNull() & (F.col("nk") != F.col("k")))
        .select(
            F.least("k", "nk").alias("a"), F.greatest("k", "nk").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    e1 = und.select(F.col("a").alias("a1"), F.col("b").alias("b1"))
    e2 = und.select(F.col("a").alias("a2"), F.col("b").alias("b2"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
    tri = (
        e1.join(e2, F.col("a2") == F.col("b1"))
        .join(e3, (F.col("a3") == F.col("a1")) & (F.col("b3") == F.col("b2")))
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    n_edges = und.agg(F.count("*").cast("long").alias("n_edges"))
    n_nodes = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .agg(F.countDistinct("v").cast("long").alias("n_nodes"))
    )
    return tri.join(F.broadcast(n_edges)).join(F.broadcast(n_nodes)).select(
        "n_triangles", "n_edges", "n_nodes"
    )


EMA_INT_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
series AS (
  SELECT user_id, list(cents ORDER BY ts, event_id) AS vals
  FROM c GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       CAST(list_reduce(vals,
                        (acc, x) -> (85 * acc + 15 * x) // 100) AS BIGINT)
         AS ema_cents
FROM series
ORDER BY user_id
"""


@register("w_ema_int", oracle=EMA_INT_ORACLE, tags=("W-free", "F1"))
def w_ema_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average per user, INTEGER-EXACT: values
    lift to cents, the recurrence is ``acc = (85*acc + 15*x) div
    100`` folded over the time-ordered series from its first element
    — a linear recurrence is inherently sequential per key, and the
    integer lift is what lets two engines replay it bit-identically
    (the graph_pagerank discipline applied to a window-class op; a
    float EMA would drift in the last ulp per step). Spark folds
    with ``aggregate(slice(...), vals[1], ...)`` to match DuckDB's
    init-less list_reduce exactly.

    Scale shape: one user_id exchange + per-key ordered fold over
    the collected series — per-key sequential work is intrinsic to
    EMA (each term depends on the previous); the per-key series
    must fit a task, which holds whenever per-entity event counts
    are bounded (the same assumption every stateful-streaming EMA
    makes). The streaming twin is applyInPandasWithState with the
    same integer recurrence."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    series = (
        ev.select("user_id", "ts", "event_id", cents.alias("cents"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, cents))), "
                "x -> x.cents)"
            ).alias("vals")
        )
    )
    return series.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        # element_at is 1-based (like slice); bare vals[1] would be the
        # SECOND element — Spark's [] is 0-based while slice/element_at
        # are 1-based.
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1), "
            "(acc, x) -> (85 * acc + 15 * x) div 100)"
        )
        .cast("long")
        .alias("ema_cents"),
    ).orderBy("user_id")


SNAPSHOT_DIFF_ORACLE = """
WITH b AS (
  SELECT event_id, event_type, value,
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
              AS INTEGER) % 10 AS bk
  FROM events
),
v1 AS (SELECT event_id, event_type, value FROM b WHERE bk <= 8),
v2 AS (
  SELECT event_id, event_type,
         CASE WHEN bk = 5 THEN value * 2 ELSE value END AS value
  FROM b WHERE bk >= 1
)
SELECT COALESCE(v1.event_type, v2.event_type) AS event_type,
       CAST(count(*) FILTER (WHERE v1.event_id IS NULL) AS BIGINT) AS n_added,
       CAST(count(*) FILTER (WHERE v2.event_id IS NULL) AS BIGINT) AS n_removed,
       CAST(count(*) FILTER (WHERE v1.event_id IS NOT NULL
                               AND v2.event_id IS NOT NULL
                               AND v1.value <> v2.value) AS BIGINT) AS n_changed,
       CAST(count(*) FILTER (WHERE v1.event_id IS NOT NULL
                               AND v2.event_id IS NOT NULL
                               AND v1.value = v2.value) AS BIGINT) AS n_unchanged
FROM v1 FULL OUTER JOIN v2 USING (event_id)
GROUP BY 1
ORDER BY 1
"""


@register("maint_snapshot_diff", oracle=SNAPSHOT_DIFF_ORACLE, tags=("J1", "A5"))
def maint_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-feed generation — the INVERSE of
    merge_upsert_snapshot: given two table versions, classify every
    key as added / removed / changed / unchanged via one full-outer
    join on the key (the same single-shuffle shape as the CDC apply,
    run backwards to produce the change feed a downstream consumer
    replays). Versions are deterministic md5-bucket slices of the
    fixture with a deterministic mutation (bucket 5 doubles its
    value), so both engines derive identical snapshots. At 100 TB a
    co-bucketed layout on the diff key makes the join shuffle-free —
    the bucketing.py argument; value comparison is exact (the
    mutation is *2 on a parquet double — exact in IEEE)."""
    ev = load_table(spark, sf_dir, "events")
    bk = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    b = ev.select("event_id", "event_type", "value", bk.alias("bk"))
    # Presence is carried by each side's copy of the KEY (id1/id2),
    # not by value NULLness — the oracle classifies on
    # v1.event_id/v2.event_id, and a matched row with a NULL value
    # payload must count as present on both sides, not as
    # added/removed (ADVICE r5: the two diverge on nullable values).
    v1 = b.filter(F.col("bk") <= 8).select(
        "event_id",
        F.col("event_id").alias("id1"),
        F.col("event_type").alias("t1"),
        F.col("value").alias("val1"),
    )
    v2 = b.filter(F.col("bk") >= 1).select(
        "event_id",
        F.col("event_id").alias("id2"),
        F.col("event_type").alias("t2"),
        F.when(F.col("bk") == 5, F.col("value") * 2)
        .otherwise(F.col("value"))
        .alias("val2"),
    )
    j = v1.join(v2, "event_id", "full_outer")
    added = F.col("id1").isNull()
    removed = F.col("id2").isNull()
    both = F.col("id1").isNotNull() & F.col("id2").isNotNull()
    return (
        j.groupBy(F.coalesce(F.col("t1"), F.col("t2")).alias("event_type"))
        .agg(
            F.sum(F.when(added, 1).otherwise(0)).cast("long").alias("n_added"),
            F.sum(F.when(removed, 1).otherwise(0)).cast("long").alias("n_removed"),
            F.sum(F.when(both & (F.col("val1") != F.col("val2")), 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.sum(F.when(both & (F.col("val1") == F.col("val2")), 1).otherwise(0))
            .cast("long")
            .alias("n_unchanged"),
        )
        .orderBy("event_type")
    )


REACHABILITY_ORACLE = """
WITH seq AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         lead(CAST(json_extract_string(props, '$.k') AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
  FROM events
),
e AS (
  SELECT DISTINCT k AS src, nk AS dst
  FROM seq WHERE nk IS NOT NULL AND nk <> k
),
h1 AS (SELECT DISTINCT src, dst AS n FROM e),
h2 AS (
  SELECT DISTINCT h1.src, e.dst AS n
  FROM h1 JOIN e ON e.src = h1.n
  UNION SELECT src, n FROM h1
),
h3 AS (
  SELECT DISTINCT h2.src, e.dst AS n
  FROM h2 JOIN e ON e.src = h2.n
  UNION SELECT src, n FROM h2
)
SELECT src AS node,
       CAST(count(*) FILTER (WHERE n <> src) AS BIGINT) AS n_reach_3hop
FROM h3
GROUP BY src
ORDER BY node
"""


@register("graph_reachability", oracle=REACHABILITY_ORACLE, tags=("graph", "J1"))
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop neighborhood size per node over the directed navigation
    graph — the bounded-depth reachability feature (k-hop expansion)
    used in graph feature engineering and influence scoring. Each hop
    is one edges-join + distinct, a FIXED 3-deep chain (no fixpoint
    state, unlike connected components — bounded depth means bounded
    plan); the node itself is excluded from its own count. Frontier
    sets stay (src, node) pairs — at 100 TB the k-hop frontier is the
    thing to bound, which fixed k does by construction. Pure integer
    counts, exact on both engines."""
    ev = load_table(spark, sf_dir, "events")
    kcol = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", kcol.alias("k")).withColumn(
        "nk", F.lead("k").over(w)
    )
    edges = (
        seq.filter(F.col("nk").isNotNull() & (F.col("nk") != F.col("k")))
        .select(F.col("k").alias("src"), F.col("nk").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    frontier = edges.select("src", F.col("dst").alias("n")).distinct()
    for _ in range(2):  # hops 2 and 3
        step = (
            frontier.join(
                edges.select(F.col("src").alias("n"), F.col("dst").alias("n2")),
                "n",
            )
            .select("src", F.col("n2").alias("n"))
        )
        frontier = frontier.unionByName(step).distinct()
    return (
        frontier.filter(F.col("n") != F.col("src"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("n_reach_3hop"))
        .orderBy("node")
    )


INTERVAL_COVER_ORACLE = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + CAST(floor(value * 100 + 0.5) AS BIGINT) * 1000000
           AS e_us
  FROM events WHERE event_type = 'view'
),
flagged AS (
  SELECT user_id, s_us, e_us,
         CASE WHEN s_us > max(e_us) OVER (
                PARTITION BY user_id ORDER BY s_us, e_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR max(e_us) OVER (
                PARTITION BY user_id ORDER BY s_us, e_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s_us, e_us,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id,
       CAST(count(DISTINCT island) AS BIGINT) AS n_islands,
       CAST(sum(cover) AS BIGINT) AS covered_us
FROM (
  SELECT user_id, island, max(e_us) - min(s_us) AS cover
  FROM islands GROUP BY user_id, island
)
GROUP BY user_id
ORDER BY user_id
"""


@register("w_interval_coverage", oracle=INTERVAL_COVER_ORACLE, tags=("W1", "A5"))
def w_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval union per user — total COVERED time and
    island count from overlapping [start, end) spans (uptime /
    billing / watch-time dedup: overlapping views must not
    double-count). The classic sweep: order intervals by start, a
    new island begins where start exceeds the running max of prior
    ends (running-max window), islands close by (user, island)
    aggregation of max(end)-min(start). Interval ends derive as
    start + value-in-cents seconds — all integer micros, exact. Two
    windows + one rollup sharing a single user_id exchange; at
    100 TB the per-key sweep is the minimal sequential dependency
    interval union has."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + cents * 1_000_000).alias("e_us"),
    )
    w = Wnd.partitionBy("user_id").orderBy("s_us", "e_us")
    prev_max = F.max("e_us").over(w.rowsBetween(Wnd.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s_us") > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Wnd.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e_us") - F.min("s_us")).alias("cover")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.countDistinct("island").cast("long").alias("n_islands"),
            F.sum("cover").cast("long").alias("covered_us"),
        )
        .orderBy("user_id")
    )


AUTOCORR_TERMS_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
p AS (
  SELECT c AS x,
         lead(c) OVER (ORDER BY day) AS y
  FROM d
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * y) AS BIGINT) AS sum_xy,
       CAST(sum(x * x) AS BIGINT) AS sum_x2,
       CAST(sum(y * y) AS BIGINT) AS sum_y2
FROM p WHERE y IS NOT NULL
"""


@register("a_autocorr_terms", oracle=AUTOCORR_TERMS_ORACLE, tags=("A4", "W1"))
def a_autocorr_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series, emitted
    as the six EXACT integer moment terms (n, Σx, Σy, Σxy, Σx², Σy²)
    rather than the float r — the sqrt/division in Pearson's r is
    engine-divergent, but every moment of an integer series is a
    BIGINT sum, so the driver hashes the full statistical content
    exactly and r is one driver-side formula away. The
    integer-moments trick is the same lift that made MAD and the
    iterative algorithms oracle-able. Shape: one day rollup, one
    1-partition lead over the BOUNDED daily series (|days| rows —
    metadata, not facts), one 1-row rollup."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Wnd.orderBy("day")
    p = d.select(
        F.col("c").alias("x"), F.lead("c").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    return p.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_y2"),
    )


STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
g AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS grp
  FROM d
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM g GROUP BY user_id, grp
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak_days,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY user_id
ORDER BY user_id
"""


@register("w_longest_streak", oracle=STREAK_ORACLE, tags=("W1", "A5"))
def w_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    engagement metric every product warehouse computes, and the
    canonical date-arithmetic gaps-and-islands: distinct active days,
    then `day - row_number` is CONSTANT within a consecutive run (the
    classic trick — no lag/flag chain needed), so one group-by of
    that difference yields the streaks. One user_id exchange; all
    integer day arithmetic."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Wnd.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = g.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak_days"),
            F.count("*").cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


TABLE_CHECKSUM_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(CAST('0x' || substring(
              md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                  CAST(l_linenumber AS VARCHAR) || '|' ||
                  CAST(l_partkey AS VARCHAR) || '|' ||
                  CAST(l_suppkey AS VARCHAR) || '|' ||
                  l_returnflag || '|' || l_linestatus),
              1, 15) AS BIGINT)) AS BIGINT) AS content_checksum
FROM lineitem
"""


@register("maint_table_checksum", oracle=TABLE_CHECKSUM_ORACLE, tags=("A4", "F6"))
def maint_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table content checksum — the
    replication/migration integrity check (same rows on both sides
    regardless of layout => same checksum): md5 each row's canonical
    key string, take a 60-bit integer slice, BIT_XOR — XOR commutes
    and can never overflow (a SUM of 60-bit slices overflows BIGINT
    within 10^5 rows — found the hard way under ANSI mode), so the
    checksum is partition-, order-, and SCALE-invariant; any
    single-row difference flips bits, and duplicate-row cancellation
    cannot occur because the canonical string embeds the unique key.
    Uses only integer/string columns so canonicalization needs no
    float formatting. One map-side-combined aggregation — the
    cheapest possible full-table verification."""
    li = load_table(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    )
    rowhash = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    li = li.withColumn("rh", rowhash)
    return li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr("bit_xor(rh)").cast("long").alias("content_checksum"),
    )


BENFORD_ORACLE = """
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value > 0
)
SELECT substring(CAST(cents AS VARCHAR), 1, 1) AS first_digit,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * 1000 AS BIGINT) // (SELECT count(*) FROM c)
         AS share_permille
FROM c
GROUP BY 1
ORDER BY first_digit
"""


@register("a_benford_digits", oracle=BENFORD_ORACLE, tags=("A5", "F6"))
def a_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit distribution of transaction values — the
    classic fraud / synthetic-data audit (organic magnitudes lean
    logarithmic: ~30% leading 1s; uniform generators flunk it). The
    first digit comes from the STRING form of the integer cents —
    no log10 float anywhere; shares are integer permille via `div`
    against a broadcast 1-row total. One pass, map-side combined."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    c = ev.select(cents.alias("cents"))
    total = c.agg(F.count("*").alias("_tot"))
    return (
        c.select(F.substring(F.col("cents").cast("string"), 1, 1).alias("first_digit"))
        .groupBy("first_digit")
        .agg(F.count("*").cast("long").alias("n"))
        .join(F.broadcast(total))
        .select(
            "first_digit",
            "n",
            F.expr("(n * 1000) div _tot").cast("long").alias("share_permille"),
        )
        .orderBy("first_digit")
    )


LINEAR_TREND_ORACLE = """
WITH d AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events
  GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM d
  GROUP BY 1
)
SELECT event_type, n_days, sx, sy, sxy, sxx,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(n_days * sxy - sx * sy AS DOUBLE)
         / CAST(nullif(n_days * sxx - sx * sx, 0) AS DOUBLE) AS slope_per_day
FROM m
ORDER BY event_type
"""


@register("a_linear_trend", oracle=LINEAR_TREND_ORACLE, tags=("A5", "W2"))
def a_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares TREND: the slope of daily event counts
    over time per event_type — the volume-trend detector behind
    "is this source growing or dying" curation decisions. Same
    discipline as a_autocorr_terms: the regression reduces to five
    EXACT integer moments (n, Σx, Σy, Σxy, Σx²) over (epoch-day,
    daily count) points, so the engine never does float statistics —
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is emitted both as the two
    exact BIGINT terms and as their unrounded IEEE quotient
    (bit-identical across engines). Two cheap aggregations: daily
    rollup (map-side combined), then one bounded moments pass —
    output is |event_type| rows at any corpus size. Epoch-day x
    values keep every product well inside BIGINT (x ~ 2e4, n ~ 4e2:
    n·Σx² ~ 5e13)."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    m = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        "event_type",
        "n_days",
        "sx",
        "sy",
        "sxy",
        "sxx",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        # Single-active-day groups have den == 0: a bare division would
        # throw DIVIDE_BY_ZERO under the driver's bare ANSI session while
        # the oracle returned NULL — guard BOTH sides identically
        # (nullif in the SQL above), so such groups yield NULL everywhere.
        (
            num.cast("double") / F.nullif(den, F.lit(0)).cast("double")
        ).alias("slope_per_day"),
    ).orderBy("event_type")


BLOOM_PREFILTER_ORACLE = """
WITH dim AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1996
),
seeds AS (SELECT unnest([1, 2, 3]) AS i),
hb AS (
  SELECT k,
         CAST('0x' || substring(md5(CAST(k AS VARCHAR) || '#' || i), 1, 8)
              AS BIGINT) % 32256 AS pos
  FROM dim, seeds
),
words AS (
  SELECT pos // 63 AS w_idx,
         bit_or(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS wval
  FROM hb GROUP BY 1
),
pk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
ph AS (
  SELECT k,
         CAST('0x' || substring(md5(CAST(k AS VARCHAR) || '#' || i), 1, 8)
              AS BIGINT) % 32256 AS pos
  FROM pk, seeds
),
cand AS (
  SELECT ph.k
  FROM ph JOIN words ON words.w_idx = ph.pos // 63
  WHERE (wval & (1::BIGINT << CAST(ph.pos % 63 AS INTEGER))) <> 0
  GROUP BY ph.k HAVING count(*) = 3
),
tru AS (SELECT k FROM pk WHERE k IN (SELECT k FROM dim))
SELECT CAST((SELECT count(*) FROM dim) AS BIGINT) AS n_build_keys,
       CAST((SELECT count(*) FROM pk) AS BIGINT) AS n_probe_keys,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM tru) AS BIGINT) AS n_true_match,
       CAST((SELECT count(*) FROM cand) - (SELECT count(*) FROM tru)
            AS BIGINT) AS n_false_pos,
       (SELECT count(*) FROM tru
        WHERE k NOT IN (SELECT k FROM cand)) = 0 AS no_false_negatives
"""


def _bloom_positions(key_col, n_bits: int):
    """Three md5-derived bloom bit positions for a key — portable
    (md5 is bit-identical everywhere), 8 hex chars < 2^32 so the
    BIGINT mod is exact on both engines."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(key_col.cast("string"), F.lit(f"#{i}"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_bits),
        )
        for i in (1, 2, 3)
    ]


@register("j_bloom_prefilter", oracle=BLOOM_PREFILTER_ORACLE, tags=("J1", "J3"))
def j_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast BLOOM-FILTER semi-join prefilter — the runtime-filter
    pattern (Spark's own InjectRuntimeFilter / bloom_filter_agg)
    built explicitly as a validation form: a 32256-bit / 3-hash bloom
    of the urgent-1996 order keys is aggregated into 512 BIGINT words
    (63 usable bits per word — bit 63 stays clear so neither engine
    needs the 1<<63 overflow trap, CLAUDE.md), BROADCAST, and probed
    by every distinct fact key BEFORE the exact semi join. At 100 TB
    this is what turns a shuffle semi join into a map-side drop of
    the ~99% of fact partitions' keys that cannot match, at the cost
    of a few-KB broadcast. The bloom is md5-derived, so BOTH engines
    build bit-identical words: candidate and false-positive COUNTS
    are deterministic and hash-checked, and `no_false_negatives` is
    the filter's correctness guarantee (a bloom may over-admit,
    never under-admit), certified TRUE by construction. One-row
    output; scalar subquery counts ride broadcast 1-row frames."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_bits = 32256  # 512 words x 63 bits
    dim = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1996)
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    hb = dim.select(
        "k", F.explode(F.array(*_bloom_positions(F.col("k"), n_bits))).alias("pos")
    )
    words = hb.groupBy(F.expr("pos div 63").alias("w_idx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
        ).alias("wval")
    )
    pk = li.select(F.col("l_orderkey").alias("k")).distinct()
    ph = pk.select(
        "k", F.explode(F.array(*_bloom_positions(F.col("k"), n_bits))).alias("pos")
    )
    cand = (
        ph.join(F.broadcast(words), F.expr("w_idx = pos div 63"))
        .filter(
            F.expr("wval & shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))") != 0
        )
        .groupBy("k")
        .agg(F.count("*").alias("nhit"))
        .filter(F.col("nhit") == 3)
        .select("k")
    )
    tru = pk.join(dim, "k", "left_semi")
    n_build = dim.agg(F.count("*").cast("long").alias("n_build_keys"))
    n_probe = pk.agg(F.count("*").cast("long").alias("n_probe_keys"))
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_true = tru.agg(F.count("*").cast("long").alias("n_true_match"))
    missed = tru.join(cand, "k", "left_anti").agg(
        (F.count("*") == 0).alias("no_false_negatives")
    )
    return (
        n_build.join(F.broadcast(n_probe))
        .join(F.broadcast(n_cand))
        .join(F.broadcast(n_true))
        .join(F.broadcast(missed))
        .select(
            "n_build_keys",
            "n_probe_keys",
            "n_candidates",
            (F.col("n_candidates") - F.col("n_true_match")).cast("long").alias("n_false_pos"),
            "no_false_negatives",
            "n_true_match",
        )
        .select(
            "n_build_keys",
            "n_probe_keys",
            "n_candidates",
            "n_true_match",
            "n_false_pos",
            "no_false_negatives",
        )
    )


WINDOW_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, ts AS vt FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS ct FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS pt FROM events WHERE event_type = 'purchase'),
l1 AS (SELECT DISTINCT user_id FROM v),
l2 AS (
  SELECT DISTINCT v.user_id
  FROM v JOIN c USING (user_id)
  WHERE ct > vt AND ct <= vt + INTERVAL 1 HOUR
),
l3 AS (
  SELECT DISTINCT v.user_id
  FROM v
  JOIN c USING (user_id)
  JOIN p USING (user_id)
  WHERE ct > vt AND ct <= vt + INTERVAL 1 HOUR
    AND pt > ct AND pt <= vt + INTERVAL 1 HOUR
)
SELECT * FROM (
  SELECT 1 AS funnel_level, CAST((SELECT count(*) FROM l1) AS BIGINT) AS n_users_reaching
  UNION ALL
  SELECT 2, CAST((SELECT count(*) FROM l2) AS BIGINT)
  UNION ALL
  SELECT 3, CAST((SELECT count(*) FROM l3) AS BIGINT)
) ORDER BY funnel_level
"""


@register("w_window_funnel", oracle=WINDOW_FUNNEL_ORACLE, tags=("W1", "J1"))
def w_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-windowFunnel-class ORDERED sequence matching: how
    many users completed view -> click -> purchase IN THAT ORDER with
    the whole chain inside one hour of the first step (strict
    inequalities — exact-timestamp ties do not advance the funnel,
    pinning the boundary semantics). This differs from
    pipeline_funnel_conversion, which counts stage membership without
    order-within-window constraints — the windowFunnel semantic needs
    the cross-event time predicate. Per-level reach counts are
    cumulative-style (a level-3 user is also counted at 1 and 2),
    certified monotone by construction.

    Plan shape: the existence checks ride per-user equi-joins with
    time residuals — the pairwise work is per-user bounded (the
    a_frequent_pairs blocking argument); at 100 TB replace the
    three-way join with a per-view min-next-click as-of fold if
    per-user event counts grow unbounded (operators/temporal.py).
    Timestamps are exact micros; all outputs integer counts."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vt")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ct")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pt")
    )
    in_hour = F.expr("ct > vt AND ct <= vt + INTERVAL 1 HOUR")
    chain = F.expr("pt > ct AND pt <= vt + INTERVAL 1 HOUR")
    l1 = v.select("user_id").distinct()
    l2 = v.join(c, "user_id").filter(in_hour).select("user_id").distinct()
    l3 = (
        v.join(c, "user_id")
        .filter(in_hour)
        .join(p, "user_id")
        .filter(chain)
        .select("user_id")
        .distinct()
    )
    counts = [
        df.agg(F.count("*").cast("long").alias("n_users_reaching")).withColumn(
            "funnel_level", F.lit(i)
        )
        for i, df in ((1, l1), (2, l2), (3, l3))
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.select("funnel_level", "n_users_reaching").orderBy("funnel_level")


EQUIDEPTH_ORACLE = """
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events
),
b AS (
  SELECT CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1,
         CAST(quantile_disc(cents, 0.50) AS BIGINT) AS q2,
         CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3
  FROM c
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM (
  SELECT cents,
         CASE WHEN cents <= (SELECT q1 FROM b) THEN 1
              WHEN cents <= (SELECT q2 FROM b) THEN 2
              WHEN cents <= (SELECT q3 FROM b) THEN 3
              ELSE 4 END AS bucket
  FROM c
)
GROUP BY bucket
ORDER BY bucket
"""


@register("a_equidepth_hist", oracle=EQUIDEPTH_ORACLE, tags=("A9", "A5"))
def a_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram — the CBO-statistics / feature-binning
    counterpart of a_histogram's fixed-WIDTH bins: quartile
    boundaries from exact DISCRETE percentiles (actual data values,
    integer cents — the a_percentile_disc machinery), then one
    bucket-assignment pass with exact per-bucket counts and value
    ranges. Ties at a boundary all land in the lower bucket on both
    engines (<= against the same integer boundary), so counts are
    deterministic even though equi-depth is only approximate under
    ties. Two passes total: one percentile aggregation broadcast as
    a 1-row boundary frame, one map-side-combined bucket rollup —
    at 100 TB swap the exact percentiles for approx_percentile and
    the shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    c = ev.select(cents.alias("cents"))
    b = c.agg(
        *[
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY cents)")
            .cast("long")
            .alias(a)
            for p, a in ((0.25, "q1"), (0.50, "q2"), (0.75, "q3"))
        ]
    )
    bucket = (
        F.when(F.col("cents") <= F.col("q1"), 1)
        .when(F.col("cents") <= F.col("q2"), 2)
        .when(F.col("cents") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        c.join(F.broadcast(b))
        .select("cents", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


SEQUENCE_GAPS_ORACLE = """
WITH s AS (
  SELECT DISTINCT event_id AS id FROM events
  WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
             AS INTEGER) % 10 <> 7
),
g AS (SELECT id, lead(id) OVER (ORDER BY id) AS nid FROM s)
SELECT id + 1 AS gap_start,
       nid - 1 AS gap_end,
       CAST(nid - id - 1 AS BIGINT) AS n_missing
FROM g
WHERE nid > id + 1
ORDER BY gap_start
"""


@register("f_sequence_gaps", oracle=SEQUENCE_GAPS_ORACLE, tags=("W1", "F14"))
def f_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id RANGE detection — the data-integrity scan behind
    'did ingestion drop anything' (maximal runs of absent ids
    between the observed min and max; a deterministic md5 drop of
    ~10% of event_ids makes the fixture non-trivial). The oracle's
    naive form is a GLOBAL lead — an Exchange SinglePartition at
    scale — so the engine runs the TWO-PHASE banded variant: lead
    within id-band partitions finds intra-band gaps, and a second
    lead over the bounded band-summary frame (one row per present
    band: min/max id) finds gaps that cross band boundaries,
    including runs spanning entirely-absent bands. Same discipline
    as pipeline_pack_sequences' banded prefix sum; the only ordered
    window over unbounded data is band-partitioned."""
    from pyspark.sql.window import Window as Wnd

    ev = load_table(spark, sf_dir, "events")
    bk = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    s = (
        ev.select(F.col("event_id").alias("id"))
        .filter(bk != 7)
        .distinct()
        .withColumn("band", F.expr("id div 1000"))
    )
    w_in = Wnd.partitionBy("band").orderBy("id")
    intra = (
        s.withColumn("nid", F.lead("id").over(w_in))
        .filter(F.col("nid") > F.col("id") + 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("nid") - 1).alias("gap_end"),
        )
    )
    bands = s.groupBy("band").agg(
        F.min("id").alias("mn"), F.max("id").alias("mx")
    )
    w_b = Wnd.orderBy("band")  # bounded: one row per PRESENT band
    cross = (
        bands.withColumn("next_mn", F.lead("mn").over(w_b))
        .filter(F.col("next_mn") > F.col("mx") + 1)
        .select(
            (F.col("mx") + 1).alias("gap_start"),
            (F.col("next_mn") - 1).alias("gap_end"),
        )
    )
    return (
        intra.unionByName(cross)
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1).cast("long").alias("n_missing"),
        )
        .orderBy("gap_start")
    )


# One SQL text, both engines: {events} binds to a Spark temp view in
# the entry and to the DuckDB view in the oracle — the same
# portable-construct discipline as sql_entry_cte_chain.
SQL_FUNNEL_TEXT = WINDOW_FUNNEL_ORACLE.replace("FROM events", "FROM {events}")


@register(
    "sql_entry_window_funnel",
    oracle=SQL_FUNNEL_TEXT.replace("{events}", "events"),
    tags=("SQL-API", "W1"),
)
def sql_entry_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w_window_funnel through the spark.sql() ENTRY POINT — the
    ordered-sequence funnel as one SQL text that runs verbatim on
    both engines (CTEs, INTERVAL arithmetic, scalar-subquery counts,
    UNION ALL — all portable constructs), verifying the SQL-API
    surface carries the same semantics as the DataFrame form. The
    planner output is the same as w_window_funnel's (Catalyst
    compiles both to the identical logical plan)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("funnel_events")
    return spark.sql(SQL_FUNNEL_TEXT.replace("{events}", "funnel_events"))


DEGREE_DIST_ORACLE = """
WITH seq AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         lead(CAST(json_extract_string(props, '$.k') AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
  FROM events
),
e AS (
  SELECT DISTINCT k AS src, nk AS dst
  FROM seq WHERE nk IS NOT NULL AND nk <> k
),
deg AS (SELECT src, count(*) AS out_degree FROM e GROUP BY 1)
SELECT CAST(out_degree AS BIGINT) AS out_degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg
GROUP BY 1
ORDER BY 1
"""


@register("graph_degree_distribution", oracle=DEGREE_DIST_ORACLE, tags=("graph",))
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree DISTRIBUTION of the navigation graph — the graph
    observability report behind hub detection and skew planning for
    the heavier graph kernels (a hot node with degree d fans out d²
    wedges in triangle counting; this histogram is how you see it
    coming). Same edge derivation as graph_reachability (per-user
    lead over the event sequence, distinct directed edges), then two
    map-side-combined aggregations; output bounded by the number of
    DISTINCT degrees at any scale. Pure integer counts."""
    ev = load_table(spark, sf_dir, "events")
    kcol = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", kcol.alias("k")).withColumn(
        "nk", F.lead("k").over(w)
    )
    e = (
        seq.filter(F.col("nk").isNotNull() & (F.col("nk") != F.col("k")))
        .select(F.col("k").alias("src"), F.col("nk").alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("out_degree"))
    return (
        deg.groupBy("out_degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .select(F.col("out_degree").cast("long").alias("out_degree"), "n_nodes")
        .orderBy("out_degree")
    )


MULTISET_OPS_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
              AS INTEGER) % 10 AS bk
  FROM events
),
s1 AS (SELECT event_type FROM b WHERE bk < 6),
s2 AS (SELECT event_type FROM b WHERE bk >= 4),
ia AS (SELECT event_type FROM s1 INTERSECT ALL SELECT event_type FROM s2),
ea AS (SELECT event_type FROM s1 EXCEPT ALL SELECT event_type FROM s2)
SELECT op, event_type, CAST(n AS BIGINT) AS n FROM (
  SELECT 'intersect_all' AS op, event_type, count(*) AS n FROM ia GROUP BY 2
  UNION ALL
  SELECT 'except_all', event_type, count(*) FROM ea GROUP BY 2
)
ORDER BY op, event_type
"""


@register("u_multiset_ops", oracle=MULTISET_OPS_ORACLE, tags=("U1",))
def u_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — INTERSECT ALL / EXCEPT ALL complete
    the §2.7 family beyond the DISTINCT-semantics u_intersect /
    u_except: per value, intersect-all keeps min(count_a, count_b)
    copies and except-all keeps max(count_a - count_b, 0) — the bag
    semantics reconciliation counting needs (how many rows does
    slice A have that slice B cannot absorb, with multiplicity).
    The two md5-bucket slices OVERLAP (bk 4-5 in both) so all three
    regimes appear. Spark intersectAll/exceptAll plan as
    count-compare aggregations, one exchange each; counts verified
    per type."""
    ev = load_table(spark, sf_dir, "events")
    bk = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    b = ev.select("event_type", bk.alias("bk"))
    s1 = b.filter(F.col("bk") < 6).select("event_type")
    s2 = b.filter(F.col("bk") >= 4).select("event_type")
    ia = (
        s1.intersectAll(s2)
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    ea = (
        s1.exceptAll(s2)
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(ea).select("op", "event_type", "n").orderBy(
        "op", "event_type"
    )


PARTITION_SKEW_ORACLE = """
WITH b AS (
  SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
              AS INTEGER) % 16 AS part_id
  FROM events
),
c AS (SELECT part_id, CAST(count(*) AS BIGINT) AS n_rows FROM b GROUP BY 1),
t AS (SELECT sum(n_rows) AS total, max(n_rows) AS mx FROM c)
SELECT part_id, n_rows,
       CAST((n_rows * 1000) // (SELECT total FROM t) AS BIGINT) AS share_permille,
       CAST((SELECT (mx * 16000) // total FROM t) AS BIGINT)
         AS max_skew_permille_of_even
FROM c
ORDER BY part_id
"""


@register("maint_partition_skew_report", oracle=PARTITION_SKEW_ORACLE, tags=("S10",))
def maint_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-SKEW report for a prospective partitioning key:
    row counts per hash partition (16 md5 buckets of user_id — the
    same hash-partitioning a shuffle on that key would produce),
    each bucket's integer-permille share, and the hottest bucket's
    size as permille OF THE EVEN SHARE (1000 = perfectly even;
    2000 = the straggler task does 2x the average work — the number
    that decides whether j_skew_salted's salting is needed BEFORE
    running the join). One map-side-combined rollup + a broadcast
    1-row total; all integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    part = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 16
    )
    c = ev.select(part.alias("part_id")).groupBy("part_id").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    t = c.agg(
        F.sum("n_rows").alias("total"), F.max("n_rows").alias("mx")
    )
    return (
        c.join(F.broadcast(t))
        .select(
            "part_id",
            "n_rows",
            F.expr("(n_rows * 1000) div total").cast("long").alias("share_permille"),
            F.expr("(mx * 16000) div total")
            .cast("long")
            .alias("max_skew_permille_of_even"),
        )
        .orderBy("part_id")
    )


CMS_ROLLUP_ORACLE = """
WITH base AS (
  SELECT (CAST(strftime(CAST(ts AS DATE), '%d') AS BIGINT) - 1) // 7 AS week,
         CAST(ts AS DATE) AS day,
         user_id
  FROM events
),
hashes AS (
  SELECT b.week, b.day, b.user_id, i.i,
         CAST('0x' || substring(md5(CAST(i.i AS VARCHAR) || ':'
                || CAST(b.user_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bucket
  FROM base b, (SELECT unnest(generate_series(0, 3)) AS i) i
),
tiles AS (
  SELECT week, day, i, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM hashes GROUP BY week, day, i, bucket
),
merged AS (
  SELECT week, i, bucket, CAST(sum(cnt) AS BIGINT) AS cell
  FROM tiles GROUP BY week, i, bucket
),
exact AS (
  SELECT week, user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM base GROUP BY week, user_id
),
probes AS (
  SELECT e.week, e.user_id, e.exact_cnt, i.i,
         CAST('0x' || substring(md5(CAST(i.i AS VARCHAR) || ':'
                || CAST(e.user_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bucket
  FROM exact e, (SELECT unnest(generate_series(0, 3)) AS i) i
)
SELECT p.week, p.user_id, p.exact_cnt,
       CAST(min(m.cell) AS BIGINT) AS cms_est,
       CAST(min(m.cell) - p.exact_cnt AS BIGINT) AS over_count
FROM probes p
JOIN merged m ON m.week = p.week AND m.i = p.i AND m.bucket = p.bucket
GROUP BY p.week, p.user_id, p.exact_cnt
ORDER BY p.week, p.user_id
"""


@register("a_cms_partial_rollup", oracle=CMS_ROLLUP_ORACLE, tags=("A10", "A11"))
def a_cms_partial_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable COUNT-MIN tiles — the frequency counterpart of the
    HLL (distinct), bitmap (exact distinct) and KLL (quantile) tiles,
    completing the mergeable-sketch family: per-DAY count-min sketches
    (d=4 md5-derived hash rows x w=64 buckets) are merged up to WEEKS
    by elementwise cell addition without touching raw rows again, and
    per-key frequency estimates read min over the d merged cells.
    Per-key counts DO decompose over pre-aggregates, but only at
    full-key cardinality — the CMS tile is the fixed-size (d*w cells)
    state that supports any later point query, the same
    bounded-state reuse discipline as the other tiles.

    Unlike the HLL/KLL entries (engine-private sketch bytes, validated
    via certification booleans), the CMS is DETERMINISTIC given its
    hash functions — both engines build the identical d x w integer
    matrix from the portable md5 recipe (the j_bloom_prefilter /
    pipeline_shard_layout hash), so the ESTIMATE ITSELF hash-checks
    exactly, plus ``over_count`` = est - exact exposes the sketch's
    one-sided error (CMS never underestimates; collisions at w=64 on
    150 keys make real nonzero overestimates the oracle must match).

    Scale shape: ONE fact scan + ONE fact exchange — the raw events
    pre-aggregate to (week, day, user_id) counts once, and that
    bounded intermediate (distinct day x key pairs, localCheckpointed
    per the two-consumer rule: Catalyst shares no exchange across
    different downstream aggs) feeds BOTH the tile build (explode d
    hash rows, sum into <= d*w cells per day, map-side combinable)
    and the exact twin. The week merge touches tile rows only; probes
    join the merged tiles by BROADCAST (tile frames are KB-sized by
    construction). Reference parity: the pre-aggregated mart pattern
    of the lab's rollup rows (BASELINE.md q2/q4), applied to point
    frequencies."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.expr("(day(ts) - 1) div 7").cast("long").alias("week"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    per_day_user = (
        base.groupBy("week", "day", "user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )

    def bucket(icol, keycol):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", icol.cast("string"), keycol.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 64
        )

    icol = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")
    tiles = (
        per_day_user.select("week", "day", "user_id", "cnt", icol)
        .select(
            "week",
            "day",
            "i",
            bucket(F.col("i"), F.col("user_id")).alias("bucket"),
            "cnt",
        )
        .groupBy("week", "day", "i", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    merged = tiles.groupBy("week", "i", "bucket").agg(
        F.sum("cnt").cast("long").alias("cell")
    )
    exact = per_day_user.groupBy("week", "user_id").agg(
        F.sum("cnt").cast("long").alias("exact_cnt")
    )
    probes = exact.select("week", "user_id", "exact_cnt", icol).select(
        "week",
        "user_id",
        "exact_cnt",
        "i",
        bucket(F.col("i"), F.col("user_id")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(merged), ["week", "i", "bucket"])
        .groupBy("week", "user_id", "exact_cnt")
        .agg(F.min("cell").cast("long").alias("cms_est"))
        .select(
            "week",
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("over_count"),
        )
        .orderBy("week", "user_id")
    )


PATTERN_MATCH_ORACLE = """
WITH coded AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
              ELSE 'e' END AS code
  FROM events
),
seq AS (
  SELECT user_id, string_agg(code, '' ORDER BY ts, event_id) AS s
  FROM coded GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n_view_to_buy,
       CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS n_error_bursts,
       CAST(coalesce(list_max(list_transform(regexp_extract_all(s, 'e+'),
                                             x -> len(x))), 0) AS BIGINT)
         AS max_error_run
FROM seq
ORDER BY user_id
"""


@register("w_pattern_match_regex", oracle=PATTERN_MATCH_ORACLE, tags=("W1", "F6"))
def w_pattern_match_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: event-PATTERN matching over per-user
    time-ordered sequences. Each user's events collapse to a code
    string (one char per event, time-ordered with an event_id
    tie-break), and row-pattern queries become regexes over that
    string: 'vc*p' counts view->clicks->purchase conversions (the
    funnel-with-gap shape SQL needs MATCH_RECOGNIZE for), 'ee+'
    counts error bursts, and max run-length of 'e+' is the worst
    burst. Leftmost non-overlapping matching is identical in Java
    regex (Spark) and RE2 (DuckDB) for these patterns — greedy,
    no backrefs — so plain integer counts hash-check.

    Scale shape: one user_id exchange (the same per-entity
    collect-and-fold contract as w_ema_int / w_window_funnel);
    per-key sequences are session-bounded by assumption — the
    regex runs per KEY, not per row, and the code string is
    1 byte/event. At 100 TB this is the standard sessionized
    pattern-mining shape: partition by entity, linear scan per
    entity. Beyond-reference: the reference lab has no row-pattern
    operator; this is the warehouse-native equivalent of
    MATCH_RECOGNIZE (ISO/IEC 9075:2016 part 2, expressed as
    regex-over-codes)."""
    ev = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = (
        ev.select("user_id", "ts", "event_id", code.alias("code"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws('', transform(array_sort("
                "collect_list(struct(ts, event_id, code))), x -> x.code))"
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        F.size(F.regexp_extract_all(F.col("s"), F.lit("vc*p"), 0))
        .cast("long")
        .alias("n_view_to_buy"),
        F.size(F.regexp_extract_all(F.col("s"), F.lit("ee+"), 0))
        .cast("long")
        .alias("n_error_bursts"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.regexp_extract_all(F.col("s"), F.lit("e+"), 0),
                    lambda x: F.length(x),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("max_error_run"),
    ).orderBy("user_id")


JACCARD_NEIGHBORS_ORACLE = """
WITH seq AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         lead(CAST(json_extract_string(props, '$.k') AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
  FROM events
),
und AS (
  SELECT DISTINCT least(k, nk) AS a, greatest(k, nk) AS b
  FROM seq WHERE nk IS NOT NULL AND nk <> k
),
adj0 AS (
  SELECT a AS w, b AS x FROM und
  UNION ALL
  SELECT b AS w, a AS x FROM und
),
adj AS (
  SELECT w, x FROM (
    SELECT w, x, row_number() OVER (PARTITION BY w ORDER BY x) AS rn
    FROM adj0
  ) WHERE rn <= 128
),
deg AS (
  SELECT x AS node, CAST(count(*) AS BIGINT) AS degree
  FROM adj GROUP BY x
),
common AS (
  SELECT a1.x AS a, a2.x AS b, CAST(count(*) AS BIGINT) AS common_nbrs
  FROM adj a1 JOIN adj a2 ON a1.w = a2.w AND a1.x < a2.x
  GROUP BY a1.x, a2.x
)
SELECT c.a, c.b, c.common_nbrs, d1.degree AS deg_a, d2.degree AS deg_b,
       CAST((1000 * c.common_nbrs)
            // (d1.degree + d2.degree - c.common_nbrs) AS BIGINT)
         AS jaccard_permille
FROM common c
JOIN deg d1 ON d1.node = c.a
JOIN deg d2 ON d2.node = c.b
WHERE c.common_nbrs >= 3
ORDER BY jaccard_permille DESC, c.a, c.b
LIMIT 100
"""


#: Per-node neighbor-list cap applied before the wedge self-join (the
#: FUZZY_BLOCK_CAP discipline, graph edition — VERDICT r10 #1): each
#: node keeps its 128 lowest-id neighbors, so wedge fan-out is bounded
#: at V * cap^2 on ANY degree distribution (hub-heavy navigation
#: graphs included). Certified INACTIVE on the driver fixture — the
#: closed k∈[0,100) content domain bounds degree at 99 < 128 by
#: construction (tests/test_warehouse_ops.py pins the sf0.1 max) — so
#: every recorded driver row stands; the oracle applies the identical
#: row_number cut, so capped graphs hash-match too.
JACCARD_HUB_CAP = 128

#: Edges per post-wedge aggregation partition: the (a, b) pair
#: aggregation's hash state is ~one entry per DISTINCT wedge, and in
#: the constant-degree (natural-graph) regime distinct pairs grow ∝ n
#: while spark.sql.shuffle.partitions stays pinned — per-partition
#: agg state ∝ n was the measured superlinear tail (SCALING.json
#: __openk 1.67, 32.8 s at 30x). An explicit-count repartition keyed
#: on the pair spreads the state ∝ data (user partition counts are
#: exempt from AQE byte-coalescing — the r10 fuzzy-match lesson), and
#: because the child then satisfies the aggregation's required
#: distribution, partial+final collapse into one in-partition pass.
JACCARD_EDGES_PER_PARTITION = 16_384


@register("graph_jaccard_neighbors", oracle=JACCARD_NEIGHBORS_ORACLE, tags=("graph", "J1"))
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard node similarity — the classic
    link-prediction / entity-similarity kernel over the same
    undirected content-navigation graph as graph_triangle_count:
    for every node pair sharing >= 3 neighbors, Jaccard =
    |N(a) n N(b)| / |N(a) u N(b)| computed as common /
    (deg_a + deg_b - common), emitted as an integer permille
    (1000*common div union — the integer-lift discipline, exact on
    both engines).

    Common-neighbor counting is the wedge enumeration of triangle
    counting WITHOUT the closing-edge join: adjacency self-joined on
    the MIDDLE node (a1.w = a2.w, x1 < x2 so each unordered pair
    counts once per shared neighbor), then one (a, b) aggregation.
    Degrees join on node id (membership counts — consistent with the
    capped lists: common(a,b) counts middles listing both, so
    common <= min(deg_a, deg_b) holds under the cap too).

    Scale shape (de-weaked r11, VERDICT r10 #1): two in-plan bounds.
    (1) Hub cap — every node keeps its JACCARD_HUB_CAP lowest-id
    neighbors before the self-join (deterministic row_number cut,
    identical in the oracle), so wedge fan-out is V * cap^2 on any
    degree distribution; inactive on the fixture's closed k-domain
    (max degree 99, pinned in tests) AND on the constant-degree
    open-domain corpora (measured max 103), so it guards the
    hub-heavy regime without touching any recorded row. (2) The
    wedge pair aggregation is explicitly repartitioned on the pair
    key at ~JACCARD_EDGES_PER_PARTITION edges per partition — in the
    constant-degree regime distinct pairs grow ∝ n while the
    harness pins 32 shuffle partitions, and the measured __openk
    tail (1.67, 32.8 s at 30x) was per-partition agg-state spill,
    not plan shape. The edge count comes from the already-
    materialized (localCheckpointed) edge frame — one cheap count
    job, the seed_k_for pattern. All joins are equi-joins on node
    ids; output is top-100 with full deterministic tie-break
    (score desc, a, b)."""
    ev = load_table(spark, sf_dir, "events")
    kcol = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", kcol.alias("k")).withColumn(
        "nk", F.lead("k").over(w)
    )
    und = (
        seq.filter(F.col("nk").isNotNull() & (F.col("nk") != F.col("k")))
        .select(F.least("k", "nk").alias("a"), F.greatest("k", "nk").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = und.count()
    n_parts = max(32, n_edges // JACCARD_EDGES_PER_PARTITION)
    adj0 = und.select(F.col("a").alias("w"), F.col("b").alias("x")).unionAll(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    wcap = Window.partitionBy("w").orderBy("x")
    adj = (
        adj0.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= JACCARD_HUB_CAP)
        .drop("rn")
    )
    deg = adj.groupBy(F.col("x").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    a1 = adj.select(F.col("w").alias("w1"), F.col("x").alias("xa"))
    a2 = adj.select(F.col("w").alias("w2"), F.col("x").alias("xb"))
    common = (
        a1.join(a2, (F.col("w1") == F.col("w2")) & (F.col("xa") < F.col("xb")))
        .repartition(n_parts, "xa", "xb")
        .groupBy(F.col("xa").alias("a"), F.col("xb").alias("b"))
        .agg(F.count("*").cast("long").alias("common_nbrs"))
        .filter(F.col("common_nbrs") >= 3)
    )
    d1 = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    d2 = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    return (
        common.join(d1, "a")
        .join(d2, "b")
        .select(
            "a",
            "b",
            "common_nbrs",
            "deg_a",
            "deg_b",
            F.expr("(1000 * common_nbrs) div (deg_a + deg_b - common_nbrs)")
            .cast("long")
            .alias("jaccard_permille"),
        )
        .orderBy(F.desc("jaccard_permille"), "a", "b")
        .limit(100)
    )


DATA_QUALITY_ORACLE = """
WITH ck AS (SELECT DISTINCT c_custkey FROM customer),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_custkey) AS BIGINT) AS nn_cust,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS uq_key,
         CAST(count(DISTINCT (o_custkey, CAST(o_orderdate AS DATE))) AS BIGINT)
           AS uq_cust_day,
         CAST(count(*) FILTER (o_totalprice > 0) AS BIGINT) AS pos_price,
         CAST(count(*) FILTER (o_orderstatus IN ('O', 'F', 'P')) AS BIGINT)
           AS ok_status,
         CAST(count(*) FILTER (o_orderdate >= TIMESTAMP '1995-01-01'
                           AND o_orderdate < TIMESTAMP '2001-01-01') AS BIGINT)
           AS in_range,
         CAST(count(*) FILTER (ck.c_custkey IS NOT NULL) AS BIGINT) AS fk_ok
  FROM orders LEFT JOIN ck ON ck.c_custkey = orders.o_custkey
)
SELECT u.check_name, u.metric_permille,
       u.metric_permille >= u.threshold_permille AS passed,
       u.threshold_permille
FROM agg, LATERAL (
  VALUES ('completeness_custkey', (1000 * nn_cust) // n, 1000),
         ('uniqueness_orderkey', (1000 * uq_key) // n, 1000),
         ('uniqueness_custkey_day', (1000 * uq_cust_day) // n, 900),
         ('validity_price_positive', (1000 * pos_price) // n, 1000),
         ('validity_status_enum', (1000 * ok_status) // n, 1000),
         ('range_orderdate_1995_2000', (1000 * in_range) // n, 1000),
         ('fk_custkey_in_customer', (1000 * fk_ok) // n, 1000)
) AS u(check_name, metric_permille, threshold_permille)
ORDER BY u.check_name
"""


@register("maint_data_quality_checks", oracle=DATA_QUALITY_ORACLE, tags=("A14", "S11"))
def maint_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality suite over the orders
    fact: completeness (non-null), uniqueness (key and business-key),
    validity (domain predicates + enum), referential integrity
    (custkey resolves in customer), and range/freshness — each check
    one row of (check_name, metric_permille, passed, threshold).
    Metrics are integer permille (1000*good div n — exact on both
    engines); thresholds are part of the check definition, so
    ``passed`` is deterministic data-derived truth (the fixture's
    orderdate tail extends past 2000-12-31, so the range check
    genuinely FAILS — the report is not vacuously green).

    Scale shape: ONE scan of the fact computes every metric — all
    eight counters fold into a single aggregation (the two DISTINCT
    counters use Spark's Expand-based multi-distinct, a bounded 3x
    row expansion that stays map-side partial); referential
    integrity folds into the same pass as a BROADCAST left join
    against the distinct dimension keys (no second fact scan, no
    anti-join exchange). The 8-counter 1-row frame then unpivots
    via stack() — report assembly costs nothing. This is the
    constraint-validation pattern every 100 TB ingest gate needs:
    amortize all checks into the scan you were already doing.
    Beyond-reference: the lab validates row counts only
    (BASELINE.md load checks); this generalizes to declarative
    constraints."""
    orders = load_table(spark, sf_dir, "orders")
    ck = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    joined = orders.join(
        F.broadcast(ck), orders.o_custkey == ck.c_custkey, "left"
    )
    agg = joined.agg(
        F.count("*").cast("long").alias("n"),
        F.count("o_custkey").cast("long").alias("nn_cust"),
        F.count_distinct("o_orderkey").cast("long").alias("uq_key"),
        F.count_distinct(
            F.struct("o_custkey", F.col("o_orderdate").cast("date"))
        )
        .cast("long")
        .alias("uq_cust_day"),
        F.sum((F.col("o_totalprice") > 0).cast("long"))
        .cast("long")
        .alias("pos_price"),
        F.sum(F.col("o_orderstatus").isin("O", "F", "P").cast("long"))
        .cast("long")
        .alias("ok_status"),
        F.sum(
            (
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
            ).cast("long")
        )
        .cast("long")
        .alias("in_range"),
        F.sum(F.col("c_custkey").isNotNull().cast("long"))
        .cast("long")
        .alias("fk_ok"),
    )
    checks = agg.select(
        F.expr(
            "stack(7, "
            "'completeness_custkey', (1000 * nn_cust) div n, 1000L, "
            "'uniqueness_orderkey', (1000 * uq_key) div n, 1000L, "
            "'uniqueness_custkey_day', (1000 * uq_cust_day) div n, 900L, "
            "'validity_price_positive', (1000 * pos_price) div n, 1000L, "
            "'validity_status_enum', (1000 * ok_status) div n, 1000L, "
            "'range_orderdate_1995_2000', (1000 * in_range) div n, 1000L, "
            "'fk_custkey_in_customer', (1000 * fk_ok) div n, 1000L"
            ") AS (check_name, metric_permille, threshold_permille)"
        )
    )
    return checks.select(
        "check_name",
        F.col("metric_permille").cast("long").alias("metric_permille"),
        (F.col("metric_permille") >= F.col("threshold_permille")).alias("passed"),
        F.col("threshold_permille").cast("long").alias("threshold_permille"),
    ).orderBy("check_name")


ROLLING_MEDIAN_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
w AS (
  SELECT user_id, ts, event_id, cents,
         list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           AS arr
  FROM c
)
SELECT user_id, ts, event_id, cents,
       CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS med_cents
FROM w
ORDER BY user_id, ts, event_id
"""


@register("w_rolling_median", oracle=ROLLING_MEDIAN_ORACLE, tags=("W1", "A9"))
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over a bounded 7-row frame (6 preceding +
    current) per user — the robust-smoothing counterpart of
    w_moving_avg: a rolling mean chases every spike, the rolling
    median rejects them, which is why monitoring pipelines median
    their latency/amount streams. No engine has a median window
    function over arbitrary frames; both sides materialize the frame
    as a sorted list and read the LOWER median at 1-based position
    (n+1) div 2 — on integer cents (the money lift), so the readout
    is exact and hash-stable (an averaged even-count median would
    reintroduce float midpoints — the round-on-half trap).

    Scale shape: one user_id exchange; the frame is CONSTANT-bounded
    (7 rows), so per-row state is O(frame) and the window never
    degenerates into a per-key collect of the whole series — the
    difference between this and the unbounded-frame class the
    single-partition guard polices. At 100 TB: linear in events,
    shuffle only on the partition key."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("cents").over(w))
    return (
        ev.select("user_id", "ts", "event_id", cents.alias("cents"))
        .select(
            "user_id",
            "ts",
            "event_id",
            "cents",
            F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int")).alias("_m"),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "cents",
            F.col("_m").cast("long").alias("med_cents"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


def _lpa_round_sql(r: int) -> str:
    """One synchronized label-propagation round as SQL — shared
    template so the unrolled oracle CTE chain cannot drift from the
    Spark loop (the graph_pagerank twin-generation discipline).
    argmax(count, then smallest label) is the integer encode
    max(cnt * 131072 - lbl): cnt dominates, smaller label wins ties;
    decode lbl = (131072 - enc % 131072) % 131072."""
    return f"""
l{r} AS MATERIALIZED (
  SELECT node,
         CAST((131072 - (max(cnt * 131072 - lbl) % 131072)) % 131072 AS BIGINT)
           AS lbl
  FROM (
    SELECT a.node AS node, p.lbl AS lbl, CAST(count(*) AS BIGINT) AS cnt
    FROM adj a JOIN l{r - 1} p ON p.node = a.nbr
    GROUP BY a.node, p.lbl
  )
  GROUP BY node
)"""


LPA_ROUNDS = 4


def _lpa_oracle(rounds: int = LPA_ROUNDS) -> str:
    head = """
WITH seq AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         lead(CAST(json_extract_string(props, '$.k') AS INTEGER))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
  FROM events
),
und AS (
  SELECT DISTINCT least(k, nk) AS a, greatest(k, nk) AS b
  FROM seq WHERE nk IS NOT NULL AND nk <> k
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL
  SELECT b AS node, a AS nbr FROM und
),
l0 AS MATERIALIZED (
  SELECT DISTINCT node, CAST(node AS BIGINT) AS lbl FROM adj
)"""
    rounds_sql = ",".join(_lpa_round_sql(r) for r in range(1, rounds + 1))
    return (
        head
        + ","
        + rounds_sql
        + f"""
SELECT l.node, l.lbl AS label, s.n AS community_size
FROM l{rounds} l
JOIN (SELECT lbl, CAST(count(*) AS BIGINT) AS n
      FROM l{rounds} GROUP BY lbl) s ON s.lbl = l.lbl
ORDER BY l.node
"""
    )


@register("graph_label_propagation", oracle=_lpa_oracle(), tags=("graph", "A5"))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronized label propagation (community detection) over the
    content-navigation graph — the deterministic LPA variant: every
    node starts labeled with its own id; each round every node adopts
    the most frequent label among its NEIGHBORS, ties broken by the
    SMALLEST label; a fixed 4 rounds (LPA_ROUNDS — the bounded-round
    iterative discipline of graph_pagerank / ml_kmeans_int). The
    argmax is the pure-integer encode max(cnt * 131072 - lbl) —
    count dominates, smaller label wins ties, decode is modular
    arithmetic — so every round is bit-identical on both engines
    (no floats anywhere; 131072 bounds the label domain, valid here
    because node ids are json props k in [0, 100); at 100 TB the
    base would be a broadcast max(node)+1). Classic async/randomized
    LPA is NOT engine-reproducible; synchronized+deterministic
    tie-break is the form a verification-first pipeline wants.

    Scale shape: per round ONE equi-join (adjacency x labels, both
    partitioned by node id) + two node-keyed aggregations; the label
    frame is node-sized and localCheckpointed per round (the
    F.broadcast-lineage / iterative-plan-growth trap measured on
    ml_power_iteration); adjacency is checkpointed ONCE and reused
    every round. Rounds are a fixed hyperparameter — depth does not
    grow with data. The oracle is GENERATED from the same per-round
    template, unrolled as MATERIALIZED CTEs (DuckDB inlines CTEs by
    default — exponential re-expansion otherwise, the r6 lesson)."""
    ev = load_table(spark, sf_dir, "events")
    kcol = F.get_json_object(F.col("props"), "$.k").cast("int")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", kcol.alias("k")).withColumn(
        "nk", F.lead("k").over(w)
    )
    und = (
        seq.filter(F.col("nk").isNotNull() & (F.col("nk") != F.col("k")))
        .select(F.least("k", "nk").alias("a"), F.greatest("k", "nk").alias("b"))
        .distinct()
    )
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint()
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").cast("long").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        counts = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
            )
            .groupBy("node", "lbl")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        labels = (
            counts.groupBy("node")
            .agg(F.max(F.col("cnt") * 131072 - F.col("lbl")).alias("enc"))
            .select(
                "node",
                ((131072 - (F.col("enc") % 131072)) % 131072)
                .cast("long")
                .alias("lbl"),
            )
            .localCheckpoint()
        )
    sizes = labels.groupBy("lbl").agg(
        F.count("*").cast("long").alias("community_size")
    )
    return (
        labels.join(F.broadcast(sizes), "lbl")
        .select("node", F.col("lbl").alias("label"), "community_size")
        .orderBy("node")
    )


SEASONAL_INDEX_ORACLE = """
WITH m AS (
  SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%m') AS BIGINT) AS month,
         CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS BIGINT) AS yr,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
per AS (
  SELECT month,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(count(DISTINCT yr) AS BIGINT) AS n_periods,
         CAST(sum(cents) AS BIGINT) AS total_cents
  FROM m GROUP BY month
),
tot AS (
  SELECT CAST(sum(total_cents) AS BIGINT) AS g_total,
         CAST(sum(n_periods) AS BIGINT) AS g_periods
  FROM per
)
SELECT month, n_orders, n_periods, total_cents,
       CAST((1000 * total_cents * g_periods)
            // (n_periods * g_total) AS BIGINT) AS seasonal_permille
FROM per, tot
ORDER BY month
"""


@register("a_seasonal_index", oracle=SEASONAL_INDEX_ORACLE, tags=("A5", "F2"))
def a_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year SEASONAL INDEX over order revenue — the
    classical multiplicative seasonal decomposition a demand/revenue
    warehouse publishes (index > 1000 permille = above-trend month):
    index_m = (mean monthly revenue of calendar month m across years)
    / (mean monthly revenue across ALL observed year-months). Both
    means are ratios of integer totals, so the index is the exact
    integer expression (1000 * total_m * g_periods) div
    (n_periods_m * g_total) — no float averaging, hash-identical
    across engines. n_periods counts the distinct YEARS in which the
    calendar month is observed, so partial first/last years don't
    bias the index (the fixture spans 1995-01..2001-08: months 1-8
    have 7 periods, 9-12 have 6).

    Overflow bound: 1000 * total_cents(month) * g_periods at sf0.1
    is ~3e11 * 1000 * 80 = 2.4e16 << 2^63; at 1000x data the lift
    still fits (2.4e19 would not — at that scale drop to per-year
    pre-division or 128-bit decimal, noted here for the audit).

    Scale shape: ONE fact scan -> month-keyed aggregation (12 groups,
    map-side combinable; the distinct-years counter is an Expand at
    12x12 domain cost, trivially bounded); the grand total is a
    1-ROW frame broadcast back onto the 12-row month frame
    (allowlisted 1xN pattern, a_heavy_hitters mold). Report assembly
    is domain-sized end-to-end after the first aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        F.month("o_orderdate").cast("long").alias("month"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per = m.groupBy("month").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.count_distinct("yr").cast("long").alias("n_periods"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    tot = per.agg(
        F.sum("total_cents").cast("long").alias("g_total"),
        F.sum("n_periods").cast("long").alias("g_periods"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "month",
            "n_orders",
            "n_periods",
            "total_cents",
            F.expr("(1000 * total_cents * g_periods) div (n_periods * g_total)")
            .cast("long")
            .alias("seasonal_permille"),
        )
        .orderBy("month")
    )


CUSUM_DRIFT_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
),
series AS (
  SELECT event_type, list(x ORDER BY day) AS vals
  FROM daily GROUP BY event_type
),
p AS (
  SELECT event_type, vals, CAST(len(vals) AS BIGINT) AS n_days,
         CAST(CAST(list_sum(vals) AS BIGINT) // len(vals) AS BIGINT)
           AS target_cents
  FROM series
),
f AS (
  SELECT event_type, n_days, target_cents,
         -- field order is load-bearing: in DuckDB 1.0 a lambda's
         -- struct literal exposes ALREADY-ASSIGNED fields of the
         -- literal under acc.<name> (sequential shadowing), so every
         -- expression here reads only acc fields NOT yet assigned in
         -- this literal — correct under both the shadowing and the
         -- standard semantics. The recursive field s is assigned
         -- AFTER every expression that reads acc.s; the trailing x
         -- reads no acc fields at all.
         list_reduce(
           list_transform(vals, x -> {
             'smax': greatest(0, x - target_cents - target_cents // 50),
             'alarms': CASE WHEN greatest(0, x - target_cents
                                 - target_cents // 50)
                              > target_cents // 8 THEN 1 ELSE 0 END,
             's': greatest(0, x - target_cents - target_cents // 50),
             'x': x}),
           (acc, e) -> {
             'smax': greatest(acc.smax,
                              greatest(0, acc.s + e.x - target_cents
                                          - target_cents // 50)),
             'alarms': acc.alarms
               + CASE WHEN greatest(0, acc.s + e.x - target_cents
                                       - target_cents // 50)
                        > target_cents // 8 THEN 1 ELSE 0 END,
             's': greatest(0, acc.s + e.x - target_cents
                              - target_cents // 50),
             'x': e.x}
         ) AS st
  FROM p
)
SELECT event_type, n_days, target_cents,
       CAST(st.smax AS BIGINT) AS cusum_max,
       CAST(st.alarms AS BIGINT) AS n_alarms
FROM f
ORDER BY event_type
"""


@register("w_cusum_drift", oracle=CUSUM_DRIFT_ORACLE, tags=("W-free", "F1"))
def w_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection (Page's test) over daily
    revenue per event type — the change-point monitor that completes
    the observability family next to autocorrelation, linear trend
    and the seasonal index: S_0 = 0, S_t = max(0, S_{t-1} + x_t - μ
    - k), alarm while S_t > h. Slack k = μ div 50 (2%) and threshold
    h = μ div 8 (12.5%) make both states REAL on the fixture at
    every SF (alarm counts 23-28 at sf0.001, 13-22 at sf0.01, 0-5 at
    sf0.1 — relative daily noise shrinks ~1/√n, so a fixed relative
    threshold naturally goes quieter as data grows; three types are
    alarm-free at sf0.1 while error/signup alarm, so the oracle
    match is not vacuous in either direction; pinned against an
    independent Python fold in tests).

    The recurrence is non-associative (max(0,·) clips), so it folds
    SEQUENTIALLY per key over the day-ordered series — in integer
    cents, making every round bit-identical across engines (the
    w_ema_int discipline). Spark folds aggregate(slice(...,2,...),
    element_at(...,1), f) over per-element structs to match DuckDB's
    init-less list_reduce exactly; μ enters the lambdas as a plain
    column computed in a prior projection (hoist-invariants lesson —
    HOF lambdas are interpreted).

    Scale shape: the fact compresses to (type, day) totals in ONE
    map-side-combinable aggregation; the fold runs over 30-element
    arrays on 5 rows. At 100 TB the sequential part is O(days) per
    monitored series — CUSUM state is exactly what a streaming
    monitor keeps per key; this is the batch replay of it."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            # epoch day, not day-of-month (ADVICE r8): on a stream
            # spanning months, day-of-month would merge every month's
            # day-N into one pseudo-day; epoch day keys each calendar
            # day uniquely and keeps the streaming twin's close-a-day
            # fold equivalent on ANY span (identical on the
            # single-month fixture, where the two keyings are
            # bijective and order-preserving).
            F.unix_date(F.to_date("ts")).cast("long").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("x"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), s -> s.x)"
        ).alias("vals")
    )
    p = series.select(
        "event_type",
        "vals",
        F.size("vals").cast("long").alias("n_days"),
        F.expr("aggregate(vals, 0L, (a, x) -> a + x) div size(vals)")
        .cast("long")
        .alias("target_cents"),
    )
    # field order mirrors the oracle (smax, alarms, s, x): DuckDB 1.0
    # struct-literal lambdas shadow acc.<name> with fields already
    # assigned in the literal, so both forms only read acc fields not
    # yet assigned — identical meaning under either semantics. Spark's
    # named_struct has no such shadowing; the order is for type match.
    structs = (
        "transform(vals, x -> named_struct("
        "  'smax', greatest(0L, x - target_cents - target_cents div 50),"
        "  'alarms', CASE WHEN greatest(0L, x - target_cents"
        "                 - target_cents div 50)"
        "              > target_cents div 8 THEN 1L ELSE 0L END,"
        "  's', greatest(0L, x - target_cents - target_cents div 50),"
        "  'x', x))"
    )
    return (
        p.withColumn("structs", F.expr(structs))
        .select(
            "event_type",
            "n_days",
            "target_cents",
            F.expr(
                "aggregate("
                "  slice(structs, 2, size(structs) - 1),"
                "  element_at(structs, 1),"
                "  (acc, e) -> named_struct("
                "    'smax', greatest(acc.smax,"
                "        greatest(0L, acc.s + e.x - target_cents"
                "                 - target_cents div 50)),"
                "    'alarms', acc.alarms"
                "      + CASE WHEN greatest(0L, acc.s + e.x - target_cents"
                "                   - target_cents div 50)"
                "               > target_cents div 8 THEN 1L ELSE 0L END,"
                "    's', greatest(0L, acc.s + e.x - target_cents"
                "                  - target_cents div 50),"
                "    'x', e.x)"
                ")"
            ).alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            "target_cents",
            F.col("st.smax").cast("long").alias("cusum_max"),
            F.col("st.alarms").cast("long").alias("n_alarms"),
        )
        .orderBy("event_type")
    )


HOLT_LINEAR_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
),
series AS (
  SELECT event_type, list(x ORDER BY day) AS vals
  FROM daily GROUP BY event_type
),
f AS (
  SELECT event_type, CAST(len(vals) AS BIGINT) AS n_days,
         -- LIST accumulator [sae, lvl, trd, x], NOT a struct: Holt is
         -- a coupled 2-state recursion (level and trend each read the
         -- other's PREVIOUS value), and DuckDB 1.0 struct literals in
         -- list_reduce shadow acc.<name> with already-assigned fields
         -- from the SECOND combine onward (the first combine reads
         -- old values) — so neither a shadowing-safe field order nor
         -- a deliberate-shadowing form exists for this recursion.
         -- List-literal elements read only the OLD acc at every
         -- combine (probed at fold lengths 2/3/4, pinned in
         -- tests/test_differential_fuzz.py), making the list form the
         -- portable one. The new level is recomputed inline where the
         -- trend needs it.
         list_reduce(
           list_transform(vals, x ->
             [CAST(0 AS BIGINT), x, CAST(0 AS BIGINT), x]),
           (acc, e) -> [
             acc[1] + abs(e[4] - acc[2] - acc[3]),
             (e[4] + 3 * (acc[2] + acc[3])) // 4,
             (((e[4] + 3 * (acc[2] + acc[3])) // 4) - acc[2]
              + 3 * acc[3]) // 4,
             e[4]]) AS st
  FROM series
)
SELECT event_type, n_days,
       CAST(st[2] AS BIGINT) AS level_cents,
       CAST(st[3] AS BIGINT) AS trend_cents,
       CAST(st[2] + 5 * st[3] AS BIGINT) AS forecast_5d_cents,
       CAST(st[1] AS BIGINT) AS sum_abs_err_cents
FROM f
ORDER BY event_type
"""


@register("w_holt_linear_int", oracle=HOLT_LINEAR_ORACLE, tags=("W-free", "F1"))
def w_holt_linear_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt LINEAR-TREND (double exponential) smoothing over daily
    revenue per event type — the forecasting step past the w_ema_int
    level-only smoother: l_t = alpha*x_t + (1-alpha)*(l_{t-1} +
    t_{t-1}), t_t = beta*(l_t - l_{t-1}) + (1-beta)*t_{t-1} with
    alpha = beta = 1/4 cleared to integer cents — level = (x + 3*(l +
    t)) div 4, trend = ((l_new - l_old) + 3*t_old) div 4 — plus the
    running sum of absolute one-step-ahead forecast errors |x_t -
    (l + t)| (the tracking signal a monitor pairs with the forecast)
    and a 5-day-ahead forecast l + 5*t. Initialization l_1 = x_1,
    t_1 = 0. Integer division truncates toward zero identically in
    Spark (div) and DuckDB (//), negatives included — trend and
    errors DO go negative on this series.

    TWIN-FORM NOTE (revises the r8 struct-fold shadowing lesson):
    Holt is a genuinely COUPLED 2-state recursion — level and trend
    each read the other's PREVIOUS value — so no struct field order
    satisfies the CUSUM discipline (some expression must read a field
    assigned earlier in the literal). Building this entry surfaced
    that DuckDB 1.0's struct shadowing is INCONSISTENT ACROSS
    COMBINES: the first list_reduce application reads OLD values, the
    second onward reads SHADOWED ones (probed minimally: the same
    {'a': acc.a + e.a, 'b': acc.a} fold yields b = old a at length 2
    but b = new a at length 3+) — so a fold that deliberately
    EXPLOITS shadowing is wrong on its first step, and the r8
    discipline (never read an assigned field) remains the only safe
    struct form. For recursions where that discipline cannot apply,
    the portable form is a LIST accumulator: DuckDB list-literal
    elements read only the old acc at every combine (probed and
    pinned in tests/test_differential_fuzz.py). The oracle folds
    [sae, lvl, trd, x] as a list; Spark named_struct has no
    shadowing, so the Spark side keeps the readable struct form with
    the new level recomputed inline. Twins are pinned equivalent by
    prefix-stepping tests against one Python truncated-division
    reference (tests/test_warehouse_ops.py) on top of the three-SF
    full-series hash match.

    Scale shape: identical to w_cusum_drift — the fact compresses to
    (type, day) totals in one map-side-combinable aggregation; the
    sequential fold runs over ~30-element arrays on 5 rows. At 100 TB
    the per-key state is three longs — exactly what the streaming
    twin of a forecasting monitor would keep."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.unix_date(F.to_date("ts")).cast("long").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("x"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), s -> s.x)"
        ).alias("vals")
    )
    structs = (
        "transform(vals, x -> named_struct("
        "  'sae', 0L, 'lvl', x, 'trd', 0L, 'x', x))"
    )
    # Spark named_struct has NO shadowing: every acc.<field> below is
    # the PREVIOUS state, so the new level is recomputed inline where
    # the trend needs it (see the twin-form note in the docstring).
    lvl_new = "((e.x + 3L * (acc.lvl + acc.trd)) div 4L)"
    return (
        series.select(
            "event_type",
            F.size("vals").cast("long").alias("n_days"),
            F.expr(
                "aggregate("
                f"  slice({structs}, 2, size({structs}) - 1),"
                f"  element_at({structs}, 1),"
                "  (acc, e) -> named_struct("
                "    'sae', acc.sae + abs(e.x - acc.lvl - acc.trd),"
                f"   'lvl', {lvl_new},"
                f"   'trd', (({lvl_new} - acc.lvl) + 3L * acc.trd) div 4L,"
                "    'x', e.x)"
                ")"
            ).alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            F.col("st.lvl").cast("long").alias("level_cents"),
            F.col("st.trd").cast("long").alias("trend_cents"),
            (F.col("st.lvl") + 5 * F.col("st.trd"))
            .cast("long")
            .alias("forecast_5d_cents"),
            F.col("st.sae").cast("long").alias("sum_abs_err_cents"),
        )
        .orderBy("event_type")
    )


TREND_MK_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
),
pr AS (
  SELECT a.event_type,
         b.x - a.x AS num, b.day - a.day AS den,
         a.day AS di, b.day AS dj,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
mk AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(sgn) AS BIGINT) AS mk_s
  FROM pr GROUP BY event_type
),
med AS (
  SELECT event_type, CAST(num AS BIGINT) AS ts_num,
         CAST(den AS BIGINT) AS ts_den, num / den AS ts_slope
  FROM (
    SELECT pr.*, row_number() OVER (
      PARTITION BY event_type ORDER BY num / den, di, dj) AS rn,
      count(*) OVER (PARTITION BY event_type) AS cnt
    FROM pr
  ) WHERE rn = (cnt + 1) // 2
)
SELECT m.event_type, d.n_days, m.n_pairs, m.mk_s,
       CAST((1000 * m.mk_s) // m.n_pairs AS BIGINT) AS tau_permille,
       e.ts_num, e.ts_den, e.ts_slope
FROM mk m
JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1) d USING (event_type)
JOIN med e USING (event_type)
ORDER BY m.event_type
"""


@register("a_trend_mann_kendall", oracle=TREND_MK_ORACLE, tags=("A5", "W-free"))
def a_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST trend kit over daily revenue per event type — the
    nonparametric complement of a_linear_trend's OLS and
    w_holt_linear_int's smoother: the Mann-Kendall statistic
    S = sum over day pairs of sign(x_j - x_i) with Kendall's tau as
    integer permille (1000*S div pairs — negative S exercises the
    matched truncating division), and the THEIL-SEN median slope —
    the median over all pairwise slopes (x_j - x_i)/(day_j - day_i),
    emitted BOTH as the median pair's exact integers (ts_num, ts_den
    — hash-stable with no float anywhere) and as the IEEE double
    num/den both engines compute bit-identically (the BM25
    discipline). The median is the lower-middle rank (cnt+1) div 2
    under (slope double, day_i, day_j) ordering — fully
    deterministic, tie-ordered by the pair's days.

    Scale shape: the fact compresses to (type, day) totals in one
    map-side-combinable aggregation; the pairwise stage is
    DAY-BOUNDED (n_days^2/2 rows per monitored series — ~435 at a
    30-day window; a year is ~66k — never corpus-sized), partitioned
    by the series key with no global exchange. This is the classical
    monitoring statistic precisely because it is robust to outliers
    the OLS slope chases."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.unix_date(F.to_date("ts")).cast("long").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("x"))
        .localCheckpoint()  # consumed by both pair sides + n_days
    )
    a = daily.select(
        "event_type", F.col("day").alias("di"), F.col("x").alias("xi")
    )
    b = daily.select(
        "event_type", F.col("day").alias("dj"), F.col("x").alias("xj")
    )
    pr = (
        a.join(b, "event_type")
        .filter(F.col("di") < F.col("dj"))
        .select(
            "event_type",
            (F.col("xj") - F.col("xi")).alias("num"),
            (F.col("dj") - F.col("di")).alias("den"),
            "di",
            "dj",
            F.signum(F.col("xj") - F.col("xi")).cast("long").alias("sgn"),
        )
        .localCheckpoint()  # consumed by mk + med
    )
    mk = pr.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("sgn").cast("long").alias("mk_s"),
    )
    w = Window.partitionBy("event_type").orderBy(
        (F.col("num") / F.col("den")).asc(), "di", "dj"
    )
    wc = Window.partitionBy("event_type")
    med = (
        pr.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(wc))
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(
            "event_type",
            F.col("num").cast("long").alias("ts_num"),
            F.col("den").cast("long").alias("ts_den"),
            (F.col("num") / F.col("den")).alias("ts_slope"),
        )
    )
    n_days = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    return (
        mk.join(n_days, "event_type")
        .join(med, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            "mk_s",
            F.expr("(1000 * mk_s) div n_pairs").cast("long").alias("tau_permille"),
            "ts_num",
            "ts_den",
            "ts_slope",
        )
        .orderBy("event_type")
    )
