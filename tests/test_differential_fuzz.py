"""Property-based differential testing (hypothesis): random
filter→group→agg query specs compiled BOTH to a Spark DataFrame plan
and to ANSI SQL for DuckDB, results compared exactly.

This generalizes the reference lab's premise — identical SQL
semantics across engines (README.md:32-38) — from 4 fixed queries to
a randomized family over the orders table.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from tests.conftest import SF_DIR, assert_frames_match

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
GROUP_KEYS = ["o_orderstatus", "o_orderpriority"]

spec_strategy = st.fixed_dictionaries(
    {
        "priorities": st.lists(
            st.sampled_from(PRIORITIES), min_size=1, max_size=5, unique=True
        ),
        "statuses": st.lists(
            st.sampled_from(STATUSES), min_size=1, max_size=3, unique=True
        ),
        "min_total": st.integers(min_value=0, max_value=400_000),
        "year_lo": st.integers(min_value=1995, max_value=2001),
        "group_key": st.sampled_from(GROUP_KEYS),
        "aggs": st.lists(
            st.sampled_from(["cnt", "min_total_v", "max_total_v", "sum_key"]),
            min_size=1,
            max_size=4,
            unique=True,
        ),
    }
)

# Lazy: Column construction needs an active SparkSession.
AGG_SPARK = {
    "cnt": lambda: F.count("*").alias("cnt"),
    "min_total_v": lambda: F.min("o_totalprice").alias("min_total_v"),
    "max_total_v": lambda: F.max("o_totalprice").alias("max_total_v"),
    "sum_key": lambda: F.sum("o_orderkey").alias("sum_key"),
}
AGG_SQL = {
    "cnt": "count(*) AS cnt",
    "min_total_v": "min(o_totalprice) AS min_total_v",
    "max_total_v": "max(o_totalprice) AS max_total_v",
    "sum_key": "sum(o_orderkey) AS sum_key",
}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=spec_strategy)
def test_random_query_spec_parity(spark, ddb, spec):
    orders = load_table(spark, SF_DIR, "orders")
    in_p = spec["priorities"]
    in_s = spec["statuses"]
    df = (
        orders.filter(
            F.col("o_orderpriority").isin(in_p)
            & F.col("o_orderstatus").isin(in_s)
            & (F.col("o_totalprice") >= float(spec["min_total"]))
            & (F.year("o_orderdate") >= spec["year_lo"])
        )
        .groupBy(spec["group_key"])
        .agg(*[AGG_SPARK[a]() for a in spec["aggs"]])
        .orderBy(spec["group_key"])
    )

    def q(vals):
        return ", ".join(f"'{v}'" for v in vals)

    sql = f"""
    SELECT {spec['group_key']}, {', '.join(AGG_SQL[a] for a in spec['aggs'])}
    FROM orders
    WHERE o_orderpriority IN ({q(in_p)})
      AND o_orderstatus IN ({q(in_s)})
      AND o_totalprice >= {spec['min_total']}
      AND year(o_orderdate) >= {spec['year_lo']}
    GROUP BY {spec['group_key']}
    ORDER BY {spec['group_key']}
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    preceding=st.integers(min_value=0, max_value=10),
    following=st.integers(min_value=0, max_value=10),
    agg=st.sampled_from(["sum", "min", "max", "count"]),
)
def test_random_window_frame_parity(spark, ddb, preceding, following, agg):
    """Random ROWS frame bounds × aggregate over the event stream —
    frame-boundary semantics must agree with DuckDB."""
    from pyspark.sql.window import Window

    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") <= 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-preceding, following)
    )
    spark_agg = {
        "sum": F.round(F.sum("value").over(w), 4),
        "min": F.round(F.min("value").over(w), 4),
        "max": F.round(F.max("value").over(w), 4),
        "count": F.count("*").over(w),
    }[agg]
    df = ev.select("user_id", "event_id", spark_agg.alias("v")).orderBy(
        "user_id", "event_id"
    )
    sql_fn = {"sum": "round(sum(value) OVER w, 4)", "min": "round(min(value) OVER w, 4)",
              "max": "round(max(value) OVER w, 4)", "count": "count(*) OVER w"}[agg]
    sql = f"""
    SELECT user_id, event_id, {sql_fn} AS v
    FROM events
    WHERE user_id <= 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {preceding} PRECEDING AND {following} FOLLOWING)
    ORDER BY user_id, event_id
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


JOIN_TYPES = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "left_semi": None,  # SQL via EXISTS
    "left_anti": None,  # SQL via NOT EXISTS
}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(list(JOIN_TYPES)),
    min_bal=st.integers(min_value=-1000, max_value=9000),
    statuses=st.lists(st.sampled_from(STATUSES), min_size=1, max_size=3, unique=True),
)
def test_random_join_spec_parity(spark, ddb, how, min_bal, statuses):
    """Random join type × filters on customer⋈orders: per-nation
    counts must agree with DuckDB's equivalent (semi/anti expressed
    as EXISTS/NOT EXISTS in SQL)."""
    cust = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_acctbal") >= float(min_bal)
    )
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderstatus").isin(statuses)
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, how)
    df = (
        joined.groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("c_nationkey")
    )

    s_list = ", ".join(f"'{s}'" for s in statuses)
    base = f"SELECT * FROM customer WHERE c_acctbal >= {min_bal}"
    ordsql = f"SELECT * FROM orders WHERE o_orderstatus IN ({s_list})"
    if how in ("inner", "left"):
        sql = f"""
        SELECT c_nationkey, count(*) AS cnt
        FROM ({base}) c {JOIN_TYPES[how]} ({ordsql}) o ON c.c_custkey = o.o_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey
        """
    else:
        op = "EXISTS" if how == "left_semi" else "NOT EXISTS"
        sql = f"""
        SELECT c_nationkey, count(*) AS cnt
        FROM ({base}) c
        WHERE {op} (SELECT 1 FROM ({ordsql}) o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey ORDER BY c_nationkey
        """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


SETOPS = ["union_all", "union", "intersect", "except", "intersect_all", "except_all"]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(SETOPS),
    pri=st.sampled_from(PRIORITIES),
    min_total=st.integers(min_value=0, max_value=300_000),
)
def test_random_setop_parity(spark, ddb, op, pri, min_total):
    """Random set operation between two overlapping filtered
    projections — distinct vs ALL multiplicity semantics must agree
    with DuckDB."""
    orders = load_table(spark, SF_DIR, "orders")
    cols = ["o_custkey", "o_orderstatus"]
    a = orders.filter(F.col("o_orderpriority") == pri).select(*cols)
    b = orders.filter(F.col("o_totalprice") >= float(min_total)).select(*cols)
    df = {
        "union_all": lambda: a.unionAll(b),
        "union": lambda: a.union(b).distinct(),
        "intersect": lambda: a.intersect(b),
        "except": lambda: a.subtract(b),  # EXCEPT DISTINCT semantics
        "intersect_all": lambda: a.intersectAll(b),
        "except_all": lambda: a.exceptAll(b),
    }[op]().agg(
        F.count("*").alias("cnt"),
        F.sum("o_custkey").alias("sum_key"),
        F.count_distinct("o_custkey").alias("uniq_key"),
    )
    sql_op = {
        "union_all": "UNION ALL",
        "union": "UNION",
        "intersect": "INTERSECT",
        "except": "EXCEPT",
        "intersect_all": "INTERSECT ALL",
        "except_all": "EXCEPT ALL",
    }[op]
    sql = f"""
    SELECT count(*) AS cnt, sum(o_custkey) AS sum_key,
           count(DISTINCT o_custkey) AS uniq_key
    FROM (
      SELECT o_custkey, o_orderstatus FROM orders
      WHERE o_orderpriority = '{pri}'
      {sql_op}
      SELECT o_custkey, o_orderstatus FROM orders
      WHERE o_totalprice >= {min_total}
    )
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pos=st.integers(min_value=1, max_value=12),
    ln=st.integers(min_value=0, max_value=15),
    which=st.sampled_from(["upper_sub", "lower_rev", "concat_trim", "split_part"]),
)
def test_random_string_fn_parity(spark, ddb, pos, ln, which):
    """Random string-function pipelines (substring bounds incl.
    overflow, case, reverse, concat, split-index) over part names —
    1-based slicing and out-of-range semantics must agree."""
    part = load_table(spark, SF_DIR, "part").filter(F.col("p_partkey") <= 300)
    spark_expr = {
        "upper_sub": F.upper(F.substring("p_name", pos, ln)),
        "lower_rev": F.reverse(F.lower("p_name")),
        "concat_trim": F.concat_ws("-", F.trim(F.substring("p_name", pos, ln)), F.lit("x")),
        "split_part": F.split("p_name", " ").getItem(0),
    }[which]
    sql_expr = {
        "upper_sub": f"upper(substring(p_name, {pos}, {ln}))",
        "lower_rev": "reverse(lower(p_name))",
        "concat_trim": f"concat_ws('-', trim(substring(p_name, {pos}, {ln})), 'x')",
        "split_part": "string_split(p_name, ' ')[1]",
    }[which]
    df = (
        part.select("p_partkey", spark_expr.alias("s"))
        .orderBy("p_partkey")
    )
    sql = f"""
    SELECT p_partkey, {sql_expr} AS s
    FROM part WHERE p_partkey <= 300
    ORDER BY p_partkey
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.integers(min_value=0, max_value=50),
    hi=st.integers(min_value=0, max_value=50),
    flag=st.sampled_from(["A", "N", "R"]),
)
def test_random_range_filter_parity(spark, ddb, lo, hi, flag):
    """Random BETWEEN bounds (possibly empty/inverted ranges) on
    lineitem quantities — boundary semantics must agree."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.filter(
        F.col("l_quantity").between(float(lo), float(hi))
        & (F.col("l_returnflag") == flag)
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("l_linenumber").alias("sum_ln"),
    )
    sql = f"""
    SELECT count(*) AS cnt, sum(l_linenumber) AS sum_ln
    FROM lineitem
    WHERE l_quantity BETWEEN {lo} AND {hi} AND l_returnflag = '{flag}'
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    # NULL sums (empty input) normalize to NaN on both sides.
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(["row_number", "rank", "dense_rank"]),
    desc=st.booleans(),
    key=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
)
def test_random_ranking_fn_parity(spark, ddb, fn, desc, key):
    """Ranking functions × sort direction × partition key over orders
    — rank-gap (rank) vs gapless (dense_rank) vs positional
    (row_number) tie semantics must agree. The order key includes
    o_orderkey as a unique tie-break ONLY for row_number (positional
    output is otherwise nondeterministic under value ties); rank and
    dense_rank are functions of the VALUE ordering alone, so ties are
    exercised for real there."""
    from pyspark.sql.window import Window

    orders = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderkey") <= 3000)
    direction = "DESC" if desc else "ASC"
    if fn == "row_number":
        order_sql = f"o_totalprice {direction}, o_orderkey"
        order_cols = (
            [F.desc("o_totalprice"), F.asc("o_orderkey")]
            if desc
            else [F.asc("o_totalprice"), F.asc("o_orderkey")]
        )
    else:
        order_sql = f"o_totalprice {direction}"
        order_cols = [F.desc("o_totalprice")] if desc else [F.asc("o_totalprice")]
    w = Window.partitionBy(key).orderBy(*order_cols)
    spark_fn = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
    }[fn]
    df = orders.select(
        key, "o_orderkey", spark_fn().over(w).alias("r")
    ).orderBy(key, "o_orderkey")
    sql = f"""
    SELECT {key}, o_orderkey,
           {fn}() OVER (PARTITION BY {key} ORDER BY {order_sql}) AS r
    FROM orders WHERE o_orderkey <= 3000
    ORDER BY {key}, o_orderkey
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    spec=st.fixed_dictionaries(
        {
            "flag": st.sampled_from(["A", "N", "R"]),
            "qty_lo": st.integers(min_value=0, max_value=40),
            "with_join": st.booleans(),
            "statuses": st.lists(
                st.sampled_from(STATUSES), min_size=1, max_size=3, unique=True
            ),
            "group_key": st.sampled_from(["l_returnflag", "l_linestatus"]),
            "having_min": st.integers(min_value=0, max_value=200),
            "limit": st.integers(min_value=1, max_value=5),
        }
    )
)
def test_random_pipeline_parity(spark, ddb, spec):
    """Composed multi-stage pipelines: filter -> (optional join to a
    filtered orders dim) -> group -> HAVING -> top-k — the
    single-feature fuzzers above each pin one operator, this one pins
    their COMPOSITION (predicate pushdown through joins, having-on-agg,
    limit-after-order) against DuckDB. Aggregates are integer-only
    (count / sum of line numbers) so comparison is exact."""
    li = load_table(spark, SF_DIR, "lineitem").filter(
        (F.col("l_returnflag") == spec["flag"])
        & (F.col("l_quantity") >= float(spec["qty_lo"]))
    )
    if spec["with_join"]:
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderstatus").isin(spec["statuses"])
        )
        li = li.join(orders, li.l_orderkey == orders.o_orderkey)
    gk = spec["group_key"]
    df = (
        li.groupBy(gk)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("l_linenumber").alias("sum_ln"),
        )
        .filter(F.col("cnt") >= spec["having_min"])
        .orderBy(F.desc("cnt"), gk)
        .limit(spec["limit"])
    )
    s_list = ", ".join(f"'{s}'" for s in spec["statuses"])
    join_sql = (
        f"JOIN (SELECT * FROM orders WHERE o_orderstatus IN ({s_list})) o "
        "ON l.l_orderkey = o.o_orderkey"
        if spec["with_join"]
        else ""
    )
    sql = f"""
    SELECT {gk}, count(*) AS cnt, sum(l_linenumber) AS sum_ln
    FROM (SELECT * FROM lineitem
          WHERE l_returnflag = '{spec["flag"]}'
            AND l_quantity >= {spec["qty_lo"]}) l
    {join_sql}
    GROUP BY {gk}
    HAVING count(*) >= {spec["having_min"]}
    ORDER BY cnt DESC, {gk}
    LIMIT {spec["limit"]}
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    unit=st.sampled_from(["year", "quarter", "month", "week", "day", "hour"]),
    days=st.integers(min_value=-400, max_value=400),
)
def test_random_date_fn_parity(spark, ddb, unit, days):
    """date_trunc unit sweep x interval shifts over the event stream —
    truncation boundaries (ISO weeks, quarters) and day arithmetic
    must agree across engines."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") <= 2000)
    df = (
        ev.select(
            "event_id",
            F.date_trunc(unit, F.col("ts")).alias("bucket"),
            F.date_add(F.to_date("ts"), days).alias("shifted"),
        )
        .orderBy("event_id")
    )
    sql = f"""
    SELECT event_id,
           date_trunc('{unit}', ts) AS bucket,
           CAST(CAST(ts AS DATE) + {days} * INTERVAL 1 DAY AS DATE) AS shifted
    FROM events WHERE event_id <= 2000
    ORDER BY event_id
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    join_type=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    nation_lo=st.integers(min_value=0, max_value=24),
    nation_hi=st.integers(min_value=0, max_value=24),
    min_total=st.integers(min_value=0, max_value=300_000),
)
def test_random_join_type_parity(spark, ddb, join_type, nation_lo, nation_hi, min_total):
    """Random JOIN specs (type × dim filter × fact filter) — the
    orders⋈customer join family compiled to both engines. Covers the
    null-extension (left), existence (semi), and absence (anti)
    semantics the fixed entries exercise only at chosen points; the
    count/sum aggregate makes row multiplicity errors visible.

    (r7 fix: this test previously reused the name
    test_random_join_spec_parity, SHADOWING the customer-side fuzzer
    above at module level — pytest collected only this one and the
    first silently never ran. Renamed so both run.)"""
    lo, hi = sorted((nation_lo, nation_hi))
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice") >= float(min_total)
    )
    cust = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_nationkey").between(lo, hi)
    )
    joined = orders.join(
        cust, orders.o_custkey == cust.c_custkey, join_type
    )
    if join_type in ("left_semi", "left_anti"):
        df = joined.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), F.sum("o_orderkey").alias("sk")
        )
    else:
        df = joined.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("sk"),
            F.count("c_custkey").alias("n_matched"),
        )
    df = df.orderBy("o_orderstatus")

    sql_join = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "left_semi": "SEMI JOIN",
        "left_anti": "ANTI JOIN",
    }[join_type]
    extra = (
        ""
        if join_type in ("left_semi", "left_anti")
        else ", count(c_custkey) AS n_matched"
    )
    sql = f"""
    SELECT o_orderstatus, count(*) AS n, sum(o_orderkey) AS sk{extra}
    FROM (SELECT * FROM orders WHERE o_totalprice >= {min_total}) o
    {sql_join} (SELECT * FROM customer WHERE c_nationkey BETWEEN {lo} AND {hi}) c
      ON o.o_custkey = c.c_custkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    preceding=st.integers(min_value=0, max_value=500),
    following=st.integers(min_value=0, max_value=500),
    agg=st.sampled_from(["sum", "min", "max", "count"]),
)
def test_random_range_frame_parity(spark, ddb, preceding, following, agg):
    """Value-based RANGE frames over the integer event-id axis —
    unlike ROWS, a RANGE frame's membership is defined by the ORDER
    key's VALUES (peers at the same key all join the frame; bounds
    are key offsets). The integer aggregate (sum of l-like ids) makes
    off-by-one frame-boundary bugs exact mismatches."""
    from pyspark.sql.window import Window

    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") <= 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id"))
        .rangeBetween(-preceding, following)
    )
    spark_agg = {
        "sum": F.sum("event_id").over(w),
        "min": F.min("event_id").over(w),
        "max": F.max("event_id").over(w),
        "count": F.count("*").over(w),
    }[agg]
    df = ev.select("user_id", "event_id", spark_agg.alias("v")).orderBy(
        "user_id", "event_id"
    )
    sql_fn = {
        "sum": "sum(event_id) OVER w",
        "min": "min(event_id) OVER w",
        "max": "max(event_id) OVER w",
        "count": "count(*) OVER w",
    }[agg]
    sql = f"""
    SELECT user_id, event_id, {sql_fn} AS v
    FROM events WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 RANGE BETWEEN {preceding} PRECEDING AND {following} FOLLOWING)
    ORDER BY user_id, event_id
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offset=st.integers(min_value=1, max_value=5),
    default=st.integers(min_value=-100, max_value=100),
    fn=st.sampled_from(["lag", "lead"]),
    with_default=st.booleans(),
)
def test_random_lag_lead_parity(spark, ddb, offset, default, fn, with_default):
    """lag/lead × offset × (NULL vs literal default) over the event
    stream — partition-edge semantics (rows within `offset` of the
    boundary take the default) must agree across engines."""
    from pyspark.sql.window import Window

    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spark_fn = {"lag": F.lag, "lead": F.lead}[fn]
    col = (
        spark_fn("event_id", offset, default)
        if with_default
        else spark_fn("event_id", offset)
    ).over(w)
    df = ev.select("user_id", "event_id", col.alias("v")).orderBy(
        "user_id", "event_id"
    )
    default_sql = f", {default}" if with_default else ""
    sql = f"""
    SELECT user_id, event_id,
           {fn}(event_id, {offset}{default_sql})
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v
    FROM events WHERE user_id <= 20
    ORDER BY user_id, event_id
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(["rollup", "cube"]),
    flag=st.sampled_from(["A", "N", "R"]),
    qty_hi=st.integers(min_value=5, max_value=50),
)
def test_random_rollup_cube_parity(spark, ddb, op, flag, qty_hi):
    """ROLLUP/CUBE over two keys with random filters — subtotal rows,
    NULL group markers, and grand totals must agree with DuckDB.
    Integer-only aggregates keep the comparison exact; coalesce
    collapses the NULL markers to a printable sentinel identically on
    both engines (the driver-hash discipline for nullable keys)."""
    li = load_table(spark, SF_DIR, "lineitem").filter(
        (F.col("l_returnflag") == flag) & (F.col("l_quantity") <= float(qty_hi))
    )
    grouped = li.rollup if op == "rollup" else li.cube
    df = (
        grouped("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.sum("l_linenumber").alias("sum_ln"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "cnt",
            "sum_ln",
        )
        .orderBy("rf", "ls")
    )
    sql = f"""
    SELECT coalesce(l_returnflag, '<all>') AS rf,
           coalesce(l_linestatus, '<all>') AS ls,
           count(*) AS cnt, sum(l_linenumber) AS sum_ln
    FROM lineitem
    WHERE l_returnflag = '{flag}' AND l_quantity <= {qty_hi}
    GROUP BY {op.upper()} (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    flag=st.sampled_from(["A", "N", "R"]),
    qty_lo=st.integers(min_value=0, max_value=45),
    disc_hi=st.integers(min_value=0, max_value=10),
)
def test_random_decimal_routing_parity(spark, ddb, flag, qty_lo, disc_hi):
    """The money-product decimal discipline (README 'Oracle parity')
    under RANDOM predicates: a 2-dp x 2-dp product summed through an
    exact DECIMAL(18,4) cast must be bit-identical on both engines for
    any filter — the 4-dp scale makes the cast exact, so no
    representable-tie rounding divergence can appear regardless of
    which rows a random predicate selects."""
    li = load_table(spark, SF_DIR, "lineitem").filter(
        (F.col("l_returnflag") == flag)
        & (F.col("l_quantity") >= float(qty_lo))
        & (F.col("l_discount") <= disc_hi / 100.0)
    )
    df = li.groupBy("l_linestatus").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("revenue"),
        F.count("*").alias("cnt"),
    ).orderBy("l_linestatus")
    sql = f"""
    SELECT l_linestatus,
           sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
             AS revenue,
           count(*) AS cnt
    FROM lineitem
    WHERE l_returnflag = '{flag}' AND l_quantity >= {qty_lo}
      AND l_discount <= {disc_hi / 100.0}
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pos=st.integers(min_value=1, max_value=6),
    ln=st.integers(min_value=1, max_value=6),
    idx=st.integers(min_value=1, max_value=8),
)
def test_random_array_fn_parity(spark, ddb, pos, ln, idx):
    """Array-function parity on the documented trap axes (CLAUDE.md):
    Spark slice/element_at are 1-based; Spark's aggregate takes an
    init while DuckDB's list_reduce does not (matched via the
    documented slice(v,2,n-1) + element_at(v,1) equivalence). The
    fuzzer's first run exposed two REAL divergences now encoded as
    the portable forms: (1) a slice START beyond the array is empty
    on Spark but NULL on DuckDB — portable code bounds the start
    (least(pos, n)); tail overflow (start valid, start+len beyond the
    end) truncates identically on both and stays fuzzed; (2) ANSI
    element_at THROWS out-of-range — portable code uses
    try_element_at (NULL, matching DuckDB's subscript)."""
    part = load_table(spark, SF_DIR, "part").filter(F.col("p_partkey") <= 200)
    words = F.split("p_name", " ")
    bpos = F.least(F.lit(pos), F.size(words))
    df = part.select(
        "p_partkey",
        F.size(words).alias("n"),
        F.concat_ws("|", F.slice(words, bpos, ln)).alias("sl"),
        F.try_element_at(words, F.lit(idx)).alias("el"),
        F.aggregate(
            F.expr("slice(split(p_name, ' '), 2, size(split(p_name, ' ')) - 1)"),
            F.length(F.element_at(words, 1)).cast("long"),
            lambda acc, x: acc + F.length(x),
        ).alias("folded_len"),
    ).orderBy("p_partkey")
    sql = f"""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS w,
             least({pos}, len(string_split(p_name, ' '))) AS bp
      FROM part WHERE p_partkey <= 200
    )
    SELECT p_partkey,
           CAST(len(w) AS INTEGER) AS n,
           array_to_string(w[bp:bp + {ln} - 1], '|') AS sl,
           w[{idx}] AS el,
           CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
                            (a, b) -> a + b) AS BIGINT) AS folded_len
    FROM t
    ORDER BY p_partkey
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    agg=st.sampled_from(["avg", "max", "min"]),
    cmp=st.sampled_from([">", "<"]),
    statuses=st.lists(st.sampled_from(STATUSES), min_size=1, max_size=3, unique=True),
)
def test_random_correlated_scalar_subquery_parity(spark, ddb, agg, cmp, statuses):
    """Correlated scalar subqueries (each order vs ITS customer-
    nation's aggregate) — Catalyst decorrelates into an aggregate +
    join-back; DuckDB executes the correlation natively. Random
    aggregate x comparison direction x filters; per-nation counts make
    multiplicity errors visible. avg-on-DECIMAL routes through the
    same decimal average both engines compute exactly."""
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders")
    load_table(spark, SF_DIR, "customer").createOrReplaceTempView("customer")
    s_list = ", ".join(f"'{s}'" for s in statuses)
    # ONE SQL text for both engines — the point is plan-strategy
    # parity: Catalyst decorrelates, DuckDB correlates natively.
    sql = f"""
    SELECT c_nationkey, count(*) AS n
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus IN ({s_list})
      AND o.o_totalprice {cmp} (
        SELECT {agg}(o2.o_totalprice)
        FROM orders o2 JOIN customer c2 ON o2.o_custkey = c2.c_custkey
        WHERE c2.c_nationkey = c.c_nationkey
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    key=st.sampled_from(["k", "missing", "k.nested"]),
    thr=st.integers(min_value=0, max_value=100),
)
def test_random_json_extract_parity(spark, ddb, key, thr):
    """JSON path extraction parity: a present key, a missing key, and
    a path through a scalar must yield the same NULL/value behavior —
    and a numeric filter over the extraction must select identical
    rows (3VL: NULL extractions never pass the predicate)."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") <= 3000)
    ex = F.get_json_object("props", f"$.{key}").cast("int")
    df = (
        ev.filter(ex > thr)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(ex).alias("s"))
        .orderBy("event_type")
    )
    sql = f"""
    SELECT event_type, count(*) AS n,
           sum(CAST(json_extract_string(props, '$.{key}') AS INTEGER)) AS s
    FROM events
    WHERE event_id <= 3000
      AND CAST(json_extract_string(props, '$.{key}') AS INTEGER) > {thr}
    GROUP BY event_type
    ORDER BY event_type
    """
    spark_pdf = df.toPandas()
    oracle_pdf = ddb.execute(sql).fetchdf()
    if len(spark_pdf) == 0 and len(oracle_pdf) == 0:
        return
    assert_frames_match(spark_pdf, oracle_pdf)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    flag=st.sampled_from(["A", "N", "R"]),
    qty=st.integers(min_value=0, max_value=50),
    use_filter_clause=st.booleans(),
)
def test_random_conditional_agg_parity(spark, ddb, flag, qty, use_filter_clause):
    """Conditional aggregation — the TPC-H Q8/Q12/Q14 CASE-ratio
    shape fuzzed: sum/count restricted by an inner predicate that is
    independent of the GROUP BY, expressed both as FILTER (WHERE ...)
    and as sum(CASE WHEN ...). NULL semantics differ subtly (a
    never-matching filter gives NULL sum but 0 count) — both engines
    must agree on every draw, including empty-match groups."""
    li = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") <= 50)
    cond = (F.col("l_returnflag") == flag) & (F.col("l_quantity") >= float(qty))
    if use_filter_clause:
        inner_sum = "sum(l_linenumber) FILTER (WHERE l_returnflag = '{f}' AND l_quantity >= {q})"
        inner_cnt = "count(*) FILTER (WHERE l_returnflag = '{f}' AND l_quantity >= {q})"
    else:
        inner_sum = "sum(CASE WHEN l_returnflag = '{f}' AND l_quantity >= {q} THEN l_linenumber END)"
        inner_cnt = "count(CASE WHEN l_returnflag = '{f}' AND l_quantity >= {q} THEN 1 END)"
    df = (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(cond, F.col("l_linenumber"))).alias("cond_sum"),
            F.count(F.when(cond, F.lit(1))).alias("cond_cnt"),
            F.count("*").alias("n"),
        )
        .orderBy("l_linestatus")
    )
    sql = f"""
    SELECT l_linestatus,
           {inner_sum.format(f=flag, q=qty)} AS cond_sum,
           {inner_cnt.format(f=flag, q=qty)} AS cond_cnt,
           count(*) AS n
    FROM lineitem
    WHERE l_quantity <= 50
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """
    assert_frames_match(df.toPandas(), ddb.execute(sql).fetchdf())


# --- struct-fold fuzzer (r8): random sequential integer folds with
# 2-field struct state, compiled to Spark aggregate(...named_struct...)
# AND DuckDB list_reduce(...{...}...), plus an independent Python fold.
# Pins the portable fold discipline that the w_cusum_drift trap
# motivated: DuckDB 1.0 struct-literal lambdas SHADOW acc.<name> with
# fields already assigned in the same literal, so portable programs
# assign the recursive field LAST and read only pristine acc fields —
# this fuzzer generates programs obeying that rule and asserts all
# three implementations agree bit-for-bit.

def _tdiv(x: int, d: int) -> int:
    """Truncate-toward-zero division — Spark div == DuckDB // (both
    verified incl. negatives; Python // floors, hence this helper)."""
    q = abs(x) // d
    return q if (x >= 0) == (d >= 0) else -q


# (spark/duck template, python fn) per recursive-field variant.
# Templates reference A (acc.a), B (acc.b), X (e.x) and constants.
_FOLD_A = {
    0: (
        "greatest(0{L}, {A} + {X} - {C})",
        lambda a, b, x, c, p, d, t: max(0, a + x - c),
    ),
    1: (
        "({P}{L} * {A} + ({Q}{L}) * {X}) {DIV} 10",
        lambda a, b, x, c, p, d, t: _tdiv(p * a + (10 - p) * x, 10),
    ),
    2: ("greatest({A}, {X})", lambda a, b, x, c, p, d, t: max(a, x)),
    3: ("{A} + {X} {DIV} {D}", lambda a, b, x, c, p, d, t: a + _tdiv(x, d)),
}
_INIT_A = {
    0: ("greatest(0{L}, x - {C})", lambda x, c, p, d, t: max(0, x - c)),
    1: ("(({Q}{L}) * x) {DIV} 10", lambda x, c, p, d, t: _tdiv((10 - p) * x, 10)),
    2: ("x", lambda x, c, p, d, t: x),
    3: ("x {DIV} {D}", lambda x, c, p, d, t: _tdiv(x, d)),
}
_FOLD_B = {
    0: (
        "{B} + (CASE WHEN {A} > {T} THEN 1{L} ELSE 0{L} END)",
        lambda a, b, x, c, p, d, t: b + (1 if a > t else 0),
    ),
    1: (
        "greatest({B}, {A} + {X})",
        lambda a, b, x, c, p, d, t: max(b, a + x),
    ),
    2: ("{B} + {X} {DIV} {D}", lambda a, b, x, c, p, d, t: b + _tdiv(x, d)),
    3: ("least({B}, {X})", lambda a, b, x, c, p, d, t: min(b, x)),
}
_INIT_B = {
    0: ("(CASE WHEN {A0} > {T} THEN 1{L} ELSE 0{L} END)",
        lambda a0, x, c, p, d, t: 1 if a0 > t else 0),
    1: ("{A0}", lambda a0, x, c, p, d, t: a0),
    2: ("x {DIV} {D}", lambda a0, x, c, p, d, t: _tdiv(x, d)),
    3: ("x", lambda a0, x, c, p, d, t: x),
}


def _render(tpl: str, dialect: str, consts: dict, a0_expr: str | None = None) -> str:
    # Spark needs L-suffixed BIGINT literals and `div`; DuckDB reads
    # bare integers as BIGINT-compatible and uses `//`.
    sub = {
        "A": "acc.a",
        "B": "acc.b",
        "X": "e.x",
        "L": "L" if dialect == "spark" else "",
        "DIV": "div" if dialect == "spark" else "//",
        "C": consts["c"],
        "P": consts["p"],
        "Q": 10 - consts["p"],
        "D": consts["d"],
        "T": consts["t"],
    }
    if a0_expr is not None:
        sub["A0"] = a0_expr
    return tpl.format(**sub)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    va=st.integers(min_value=0, max_value=3),
    vb=st.integers(min_value=0, max_value=3),
    c=st.sampled_from([1000, 3000, 5000]),
    p=st.sampled_from([2, 5, 8]),
    d=st.sampled_from([2, 3, 4]),
    t=st.sampled_from([2000, 6000]),
)
def test_random_struct_fold_parity(spark, ddb, va, vb, c, p, d, t):
    import math

    consts = {"c": c, "p": p, "d": d, "t": t}
    fa_tpl, fa_py = _FOLD_A[va]
    ia_tpl, ia_py = _INIT_A[va]
    fb_tpl, fb_py = _FOLD_B[vb]
    ib_tpl, ib_py = _INIT_B[vb]

    # ---- Spark: b first, recursive a LAST (the portable order).
    ia_s = _render(ia_tpl, "spark", consts)
    ib_s = _render(ib_tpl, "spark", consts, a0_expr=f"({ia_s})")
    fa_s = _render(fa_tpl, "spark", consts)
    fb_s = _render(fb_tpl, "spark", consts)
    sdf = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, x))), "
                "s -> s.x)"
            ).alias("vals")
        )
        .withColumn(
            "structs",
            F.expr(
                f"transform(vals, x -> named_struct('b', CAST(({ib_s}) AS BIGINT),"
                f" 'a', CAST(({ia_s}) AS BIGINT), 'x', x))"
            ),
        )
        .select(
            "user_id",
            F.expr(
                "aggregate("
                "  slice(structs, 2, size(structs) - 1),"
                "  element_at(structs, 1),"
                f"  (acc, e) -> named_struct('b', CAST(({fb_s}) AS BIGINT),"
                f" 'a', CAST(({fa_s}) AS BIGINT), 'x', e.x))"
            ).alias("st"),
        )
        .select(
            "user_id",
            F.col("st.a").cast("long").alias("a"),
            F.col("st.b").cast("long").alias("b"),
        )
        .orderBy("user_id")
    )
    got = sdf.toPandas()

    # ---- DuckDB: same program, same field order.
    ia_q = _render(ia_tpl, "duck", consts)
    ib_q = _render(ib_tpl, "duck", consts, a0_expr=f"({ia_q})")
    fa_q = _render(fa_tpl, "duck", consts)
    fb_q = _render(fb_tpl, "duck", consts)
    sql = f"""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase'
    ),
    series AS (
      SELECT user_id, list(x ORDER BY ts, event_id) AS vals
      FROM c GROUP BY user_id
    )
    SELECT user_id,
           CAST(st.a AS BIGINT) AS a, CAST(st.b AS BIGINT) AS b
    FROM (
      SELECT user_id, list_reduce(
        list_transform(vals, x -> {{'b': CAST(({ib_q}) AS BIGINT),
                                    'a': CAST(({ia_q}) AS BIGINT), 'x': x}}),
        (acc, e) -> {{'b': {fb_q}, 'a': {fa_q}, 'x': e.x}}) AS st
      FROM series
    )
    ORDER BY user_id
    """
    want = ddb.execute(sql).fetchdf()
    assert_frames_match(got, want)

    # ---- independent Python fold.
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    ev["x"] = (ev["value"] * 100 + 0.5).apply(math.floor).astype("int64")
    res = got.set_index("user_id")
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        xs = g["x"].tolist()
        a = ia_py(xs[0], c, p, d, t)
        b = ib_py(a, xs[0], c, p, d, t)
        for x in xs[1:]:
            nb = fb_py(a, b, x, c, p, d, t)  # reads pristine a
            a = fa_py(a, b, x, c, p, d, t)
            b = nb
        assert int(res.loc[uid, "a"]) == a, (uid, va, vb, consts)
        assert int(res.loc[uid, "b"]) == b, (uid, va, vb, consts)


def test_duckdb_struct_shadowing_is_combine_dependent(ddb):
    """Pin the EXACT DuckDB struct-literal shadowing semantics the
    Holt entry surfaced (r9, revising the r8 lesson): in a
    list_reduce whose combine assigns 'a' before reading acc.a in
    'b', the FIRST combine reads the OLD a but every later combine
    reads the SHADOWED (new) a. The r8 discipline (never read an
    already-assigned field) is immune to this inconsistency; any
    form that deliberately EXPLOITS shadowing is wrong on its first
    step. If a DuckDB upgrade makes this test fail, re-audit every
    struct fold oracle before trusting either semantics."""
    q = """
    SELECT list_reduce(
      list_transform({lst}::BIGINT[], x -> {{'a': x, 'b': CAST(0 AS BIGINT)}}),
      (acc, e) -> {{'a': acc.a + e.a, 'b': acc.a}}) AS st
    """
    two = ddb.execute(q.format(lst="[10, 20]")).fetchone()[0]
    three = ddb.execute(q.format(lst="[10, 20, 40]")).fetchone()[0]
    four = ddb.execute(q.format(lst="[10, 20, 40, 80]")).fetchone()[0]
    assert two == {"a": 30, "b": 10}  # first combine: OLD acc.a
    assert three == {"a": 70, "b": 70}  # second combine: NEW (shadowed) a
    assert four == {"a": 150, "b": 150}


def test_duckdb_list_fold_reads_old_acc(ddb):
    """Pin the portable escape hatch for COUPLED recursions (r9):
    list-literal elements inside a list_reduce combine read only the
    OLD accumulator at EVERY combine — no first-vs-later
    inconsistency — so state recursions that cannot satisfy the
    struct field-order discipline (each state reading the other's
    previous value, e.g. Holt level/trend) fold portably as lists."""
    q = """
    SELECT list_reduce(
      list_transform({lst}::BIGINT[], x -> [x, CAST(0 AS BIGINT)]),
      (acc, e) -> [acc[1] + e[1], acc[1]]) AS st
    """
    assert ddb.execute(q.format(lst="[10, 20]")).fetchone()[0] == [30, 10]
    assert ddb.execute(q.format(lst="[10, 20, 40]")).fetchone()[0] == [70, 30]
    assert ddb.execute(q.format(lst="[10, 20, 40, 80]")).fetchone()[0] == [
        150,
        70,
    ]
    assert ddb.execute(
        q.format(lst="[10, 20, 40, 80, 160]")
    ).fetchone()[0] == [310, 150]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=3, max_size=24
    ),
    c1=st.sampled_from([1, 2, 3]),
    d1=st.sampled_from([2, 4]),
    c2=st.sampled_from([1, 3]),
    d2=st.sampled_from([2, 4]),
)
def test_random_coupled_fold_parity(spark, ddb, xs, c1, d1, c2, d2):
    """COUPLED 2-state sequential folds (the Holt shape: each state
    reads the other's PREVIOUS value, so the struct field-order
    discipline cannot apply) compiled three ways and asserted
    bit-equal: Spark aggregate over named_struct (no shadowing — all
    old reads, second state recomputes the first inline), DuckDB
    list_reduce over a LIST accumulator (list literals read only the
    old acc at every combine — the portable form pinned by
    test_duckdb_list_fold_reads_old_acc; a struct form here would be
    silently wrong at combine 1 and right afterwards), and a Python
    truncated-division reference. Randomized over series with
    NEGATIVE values (division truncation direction exercised) and
    recursion coefficients.

        p' = (x + c1*(p + q)) div d1
        q' = ((p' - p) + c2*q) div d2
        m' = m + |x - p - q|          (init p = x1, q = 0, m = 0)
    """

    def ref():
        p, q, m = xs[0], 0, 0
        for x in xs[1:]:
            m += abs(x - p - q)
            pn = _tdiv(x + c1 * (p + q), d1)
            q = _tdiv((pn - p) + c2 * q, d2)
            p = pn
        return p, q, m

    arr = "array(" + ",".join(f"{v}L" for v in xs) + ")"
    # wrap the tail elements into structs so the combine reads e.x
    tail = f"transform(slice({arr}, 2, {len(xs) - 1}), v -> named_struct('x', v))"
    pn_expr = f"((e.x + {c1}L * (acc.p + acc.q)) div {d1}L)"
    spark_expr = (
        f"aggregate({tail}, "
        f"named_struct('m', 0L, 'p', element_at({arr}, 1), 'q', 0L, 'x', 0L), "
        "(acc, e) -> named_struct("
        "  'm', acc.m + abs(e.x - acc.p - acc.q), "
        f" 'p', {pn_expr}, "
        f" 'q', (({pn_expr} - acc.p) + {c2}L * acc.q) div {d2}L, "
        "  'x', e.x))"
    )
    row = spark.sql(f"SELECT {spark_expr} AS st").head()
    got_spark = (row.st.p, row.st.q, row.st.m)

    lst = "[" + ",".join(str(v) for v in xs) + "]"
    duck = ddb.execute(
        f"""
        SELECT list_reduce(
          list_transform({lst}::BIGINT[],
                         x -> [CAST(0 AS BIGINT), x, CAST(0 AS BIGINT), x]),
          (acc, e) -> [
            acc[1] + abs(e[4] - acc[2] - acc[3]),
            (e[4] + {c1} * (acc[2] + acc[3])) // {d1},
            (((e[4] + {c1} * (acc[2] + acc[3])) // {d1}) - acc[2]
             + {c2} * acc[3]) // {d2},
            e[4]])
        """
    ).fetchone()[0]
    got_duck = (duck[1], duck[2], duck[0])
    # init: list_reduce seeds with element 1's transform [0, x1, 0, x1]
    assert got_spark == ref()
    assert got_duck == ref()
