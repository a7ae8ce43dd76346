"""Batch-mode registry entries for the streaming window operators.

The SAME builder functions power `readStream` (see
streaming/windows.py and tests/test_streaming.py); registering the
batch form gives each windowed operator a DuckDB oracle
(`time_bucket` / gaps-and-islands SQL), which is exactly the
batch-stream unification Spark's incrementalization model promises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.queries.registry import register
from sql_engine_triangle_spark.streaming import windows as W

TUMBLING_ORACLE = """
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
  event_type,
  count(*) AS cnt,
  round(sum(value), 3) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@register("stream_tumbling_counts", oracle=TUMBLING_ORACLE, tags=("STR-tumbling",))
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows over the event stream (batch surface of
    the streaming operator — identical logical plan under
    readStream + watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return W.tumbling_counts(ev).orderBy("window_start", "event_type")


SLIDING_ORACLE = """
WITH slides AS (
  SELECT e.*,
         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' * s.i
           AS window_start
  FROM events e
  CROSS JOIN (SELECT unnest(range(0, 2)) AS i) s
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS cnt
FROM slides
WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@register("stream_sliding_counts", oracle=SLIDING_ORACLE, tags=("STR-sliding",))
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30min windows (each event lands in 2 windows)."""
    ev = load_table(spark, sf_dir, "events")
    return W.sliding_counts(ev).orderBy("window_start", "event_type")


DEDUP_KEYS_ORACLE = """
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
"""


@register("stream_dedup_keys", oracle=DEDUP_KEYS_ORACLE, tags=("STR-dedup",))
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming key dedup (dropDuplicates), batch surface — the
    exactly-once ingestion pattern; real streaming path tested in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return W.dedup_keys(ev).orderBy("user_id", "event_type")


SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '15 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '15 minutes' AS session_end,
       user_id,
       count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("stream_session_windows", oracle=SESSION_ORACLE, tags=("STR-session",))
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 15-minute-gap session windows (Spark session_window;
    oracle is the classic gaps-and-islands SQL). Session end in both
    is last-event + gap. Boundary semantics (verified empirically,
    locked by test_streaming's exact-gap test): Spark MERGES two
    events exactly `gap` apart into one session — the session extent
    is closed, [ts, ts+gap] — so the oracle's new-session condition
    is strictly `diff > gap`."""
    ev = load_table(spark, sf_dir, "events")
    return W.session_windows(ev).orderBy("user_id", "session_start")


HOURLY_TOPK_ORACLE = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         event_type, count(*) AS n
  FROM events
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n DESC, event_type) AS rn
  FROM hourly
)
SELECT window_start, event_type, n
FROM ranked WHERE rn = 1
ORDER BY window_start
"""


@register("stream_hourly_topk", oracle=HOURLY_TOPK_ORACLE, tags=("STR-topk", "W1"))
def stream_hourly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending composite: top event type per hour — windowed count
    then per-window rank-1 (deterministic event_type tie-break). The
    batch twin of the classic streaming leaderboard; the rn=1 filter
    gets WindowGroupLimit pushdown, so each map task ships one
    candidate per (window, type) group. In streaming form the hourly
    counts come from `windows.tumbling_counts` and the rank runs in
    foreachBatch on the complete-mode sink."""
    from pyspark.sql import Window as Wnd

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("window_start"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    w = Wnd.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_start", "event_type", "n")
        .orderBy("window_start")
    )


CLOSED_SESSIONS_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value
  FROM events
),
marked AS (
  SELECT user_id, us, value,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM e
),
sess AS (
  SELECT user_id, us, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
agg AS (
  SELECT user_id, sid,
         min(us) AS session_start_us,
         max(us) AS session_end_us,
         count(*) AS n_events,
         round(sum(value), 6) AS sum_value
  FROM sess GROUP BY user_id, sid
),
last AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY user_id)
SELECT a.user_id, session_start_us, session_end_us, n_events, sum_value
FROM agg a JOIN last l ON a.user_id = l.user_id AND a.sid < l.last_sid
ORDER BY a.user_id, session_start_us
"""


@register(
    "stream_closed_sessions", oracle=CLOSED_SESSIONS_ORACLE, tags=("STR-stateful", "W1")
)
def stream_closed_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the CUSTOM stateful sessionizer
    (streaming/stateful.py:sessionize_with_timeout): 30-min-gap
    sessions per user EXCLUDING each user's final session — exactly
    the set the streaming operator emits through its gap-closure path
    before any timeout fires (the final session only closes when the
    event-time watermark passes it). The streaming/batch equivalence
    is pinned in tests/test_engine_facade.py over a real readStream;
    this entry gives the stateful operator's semantics an externally
    hash-checkable oracle row.

    Plan: the lag-flag + running-sum islands share ONE user_id
    exchange and one sort (the w_sessionize discipline); the
    last-session exclusion joins the per-user max back — a
    dimension-sized broadcast at any scale. sum_value is rounded at
    6 dp: per-session float sums accumulate in ts order on both
    engines, and the round normalizes the final-digit repr."""
    from pyspark.sql import Window as Wnd

    ev = load_table(spark, sf_dir, "events")
    gap = 30 * 60 * 1_000_000
    w = Wnd.partitionBy("user_id").orderBy("us")
    run = Wnd.partitionBy("user_id").orderBy("us").rowsBetween(
        Wnd.unboundedPreceding, 0
    )
    sess = (
        ev.select("user_id", F.unix_micros("ts").alias("us"), "value")
        .withColumn(
            "new_s",
            F.when(F.col("us") - F.lag("us").over(w) > gap, 1).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(run))
    )
    agg = sess.groupBy("user_id", "sid").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    last = agg.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    return (
        agg.join(F.broadcast(last), "user_id")
        .filter(F.col("sid") < F.col("last_sid"))
        .select(
            "user_id", "session_start_us", "session_end_us", "n_events", "sum_value"
        )
        .orderBy("user_id", "session_start_us")
    )
