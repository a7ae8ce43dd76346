"""Structural invariants for the warehouse ops (SCD2, sessionize,
winsorize, Q18). Oracle parity runs in the generic registry sweep;
these pin the interval/assignment semantics parity can't see."""

from __future__ import annotations

from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR, SF_DIR_SMALL, assert_frames_match


def test_scd2_intervals_are_valid(spark):
    res = registry.get("w_scd2_history").fn(spark, SF_DIR_SMALL).toPandas()
    # exactly one current row per user
    cur = res.groupby("user_id")["is_current"].sum()
    assert (cur == 1).all()
    for _, g in res.groupby("user_id"):
        g = g.sort_values("version")
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # each row's effective_to equals the next row's effective_from
        nxt = g["effective_from"].shift(-1)
        closed = g["effective_to"].notna()
        assert (g.loc[closed, "effective_to"] == nxt[closed]).all()
        # intervals never go backwards
        assert (
            g.loc[closed, "effective_to"] >= g.loc[closed, "effective_from"]
        ).all()


def test_sessionize_gap_semantics(spark):
    res = registry.get("w_sessionize").fn(spark, SF_DIR_SMALL).toPandas()
    ev_total = res["n_events"].sum()
    from sql_engine_triangle_spark.catalog import load_table

    assert ev_total == load_table(spark, SF_DIR_SMALL, "events").count()
    assert (res["duration_us"] >= 0).all()
    for _, g in res.groupby("user_id"):
        g = g.sort_values("session_id")
        assert list(g["session_id"]) == list(range(1, len(g) + 1))
        # consecutive sessions of one user are separated by > 24h
        gap = (
            g["session_start"].shift(-1) - g["session_end"]
        ).dropna().dt.total_seconds()
        assert (gap > 24 * 3600).all()


def test_winsorize_bounds(spark):
    res = registry.get("f_winsorize").fn(spark, SF_DIR_SMALL).toPandas()
    # clipped mean lies within [p05, p95]; raw mean may not
    assert (res["avg_winsorized"] >= res["p05"] - 1e-9).all()
    assert (res["avg_winsorized"] <= res["p95"] + 1e-9).all()


def test_q18_threshold_and_ordering(spark):
    res = registry.get("tpch_q18_big_orders").fn(spark, SF_DIR_SMALL).toPandas()
    assert (res["sum_qty"] > 250).all()
    assert res["o_totalprice"].is_monotonic_decreasing or len(res) <= 1


def test_warehouse_partition_count_independence(spark):
    for name in ("w_scd2_history", "w_sessionize", "f_winsorize"):
        fn = registry.get(name).fn
        base = fn(spark, SF_DIR_SMALL).toPandas()
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            alt = fn(spark, SF_DIR_SMALL).toPandas()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert_frames_match(base, alt)


def _cms_reference(sf_dir: str):
    """Independent pure-Python CMS (hashlib md5, d=4, w=64) over the
    raw events parquet — pins the portable hash recipe and the
    tile-merge semantics against a second implementation."""
    import hashlib

    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    week = (ev["ts"].dt.day - 1) // 7
    cells: dict[tuple[int, int, int], int] = {}
    exact: dict[tuple[int, int], int] = {}
    for w, u in zip(week, ev["user_id"]):
        exact[(w, u)] = exact.get((w, u), 0) + 1
        for i in range(4):
            b = int(hashlib.md5(f"{i}:{u}".encode()).hexdigest()[:8], 16) % 64
            cells[(w, i, b)] = cells.get((w, i, b), 0) + 1
    rows = []
    for (w, u), cnt in exact.items():
        est = min(
            cells[
                (w, i, int(hashlib.md5(f"{i}:{u}".encode()).hexdigest()[:8], 16) % 64)
            ]
            for i in range(4)
        )
        rows.append((w, u, cnt, est, est - cnt))
    return (
        pd.DataFrame(
            rows, columns=["week", "user_id", "exact_cnt", "cms_est", "over_count"]
        )
        .sort_values(["week", "user_id"])
        .reset_index(drop=True)
    )


def test_cms_rollup_matches_python_reference(spark):
    res = (
        registry.get("a_cms_partial_rollup")
        .fn(spark, SF_DIR_SMALL)
        .toPandas()
        .sort_values(["week", "user_id"])
        .reset_index(drop=True)
    )
    ref = _cms_reference(SF_DIR_SMALL)
    assert res.astype("int64").equals(ref.astype("int64"))
    # CMS is one-sided: never underestimates
    assert (res["over_count"] >= 0).all()


def test_cms_rollup_has_real_collisions(spark):
    # at w=64 over 150 keys, collisions must produce genuine
    # overestimates — the oracle match is not vacuous
    res = registry.get("a_cms_partial_rollup").fn(spark, SF_DIR).toPandas()
    assert (res["over_count"] > 0).any()
    assert (res["over_count"] >= 0).all()


def test_pattern_match_matches_python_re(spark):
    import re

    import pandas as pd

    res = (
        registry.get("w_pattern_match_regex")
        .fn(spark, SF_DIR_SMALL)
        .toPandas()
        .set_index("user_id")
    )
    ev = pd.read_parquet(f"{SF_DIR_SMALL}/events.parquet")
    code = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        s = "".join(code.get(t, "e") for t in g["event_type"])
        row = res.loc[uid]
        assert row["n_events"] == len(s)
        assert row["n_view_to_buy"] == len(re.findall("vc*p", s))
        assert row["n_error_bursts"] == len(re.findall("ee+", s))
        runs = re.findall("e+", s)
        assert row["max_error_run"] == (max(len(r) for r in runs) if runs else 0)


def test_jaccard_neighbors_bounds(spark):
    res = registry.get("graph_jaccard_neighbors").fn(spark, SF_DIR_SMALL).toPandas()
    # Jaccard is a [0,1] similarity; permille integer-lift stays in range
    assert (res["jaccard_permille"] >= 0).all()
    assert (res["jaccard_permille"] <= 1000).all()
    # common neighbors can never exceed either endpoint's degree
    assert (res["common_nbrs"] <= res[["deg_a", "deg_b"]].min(axis=1)).all()
    assert (res["common_nbrs"] >= 3).all()
    # canonical pair orientation and deterministic ordering
    assert (res["a"] < res["b"]).all()
    assert res["jaccard_permille"].is_monotonic_decreasing


def test_data_quality_report_not_vacuous(spark):
    res = (
        registry.get("maint_data_quality_checks")
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("check_name")
    )
    assert len(res) == 7
    assert res["metric_permille"].between(0, 1000).all()
    # the fixture's orderdate tail extends past 2000 — range check FAILS
    assert not res.loc["range_orderdate_1995_2000", "passed"]
    # structural checks the generator guarantees
    for name in (
        "completeness_custkey",
        "uniqueness_orderkey",
        "validity_price_positive",
        "validity_status_enum",
        "fk_custkey_in_customer",
    ):
        assert res.loc[name, "passed"], name


def test_rolling_median_matches_pandas(spark):
    import pandas as pd

    res = (
        registry.get("w_rolling_median")
        .fn(spark, SF_DIR_SMALL)
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_DIR_SMALL}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    ev["cents"] = (ev["value"] * 100 + 0.5).apply(__import__("math").floor)
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)

    def lower_median(s):
        v = sorted(s)
        return v[(len(v) + 1) // 2 - 1]

    ref = (
        ev.groupby("user_id")["cents"]
        .rolling(7, min_periods=1)
        .apply(lambda s: lower_median(s.tolist()), raw=False)
        .reset_index(drop=True)
        .astype("int64")
    )
    assert (res["med_cents"].to_numpy() == ref.to_numpy()).all()
    assert (res["cents"].to_numpy() == ev["cents"].to_numpy()).all()


def _lpa_reference(sf_dir: str, rounds: int = 4):
    """Independent pure-Python synchronized LPA with min-label
    tie-break over the same edge derivation."""
    import collections
    import json

    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["k"] = ev["props"].map(lambda p: int(json.loads(p)["k"]))
    edges = set()
    for _, g in ev.groupby("user_id"):
        ks = g["k"].tolist()
        for x, y in zip(ks, ks[1:]):
            if x != y:
                edges.add((min(x, y), max(x, y)))
    nbrs = collections.defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lbl = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            cnt = collections.Counter(lbl[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lbl = new
    return lbl


def test_label_propagation_matches_python_reference(spark):
    res = (
        registry.get("graph_label_propagation")
        .fn(spark, SF_DIR_SMALL)
        .toPandas()
        .set_index("node")
    )
    ref = _lpa_reference(SF_DIR_SMALL)
    assert len(res) == len(ref)
    for node, want in ref.items():
        assert int(res.loc[node, "label"]) == want, node
    # community sizes partition the node set
    sizes = res.groupby("label")["community_size"].first()
    assert sizes.sum() == len(res)
    assert (res.groupby("label").size() == sizes).all()


def test_quantified_anyall_empty_set_semantics(spark):
    import pandas as pd

    res = registry.get("sub_quantified_anyall").fn(spark, SF_DIR_SMALL).toPandas()
    part = pd.read_parquet(f"{SF_DIR_SMALL}/part.parquet")
    li = pd.read_parquet(f"{SF_DIR_SMALL}/lineitem.parquet")
    assert res["n_parts"].sum() == len(part)
    late = li[li["l_shipdate"] >= "2001-06-01"]
    no_late = set(part["p_partkey"]) - set(late["l_partkey"])
    # the ALL-over-empty-set branch is genuinely exercised
    assert no_late
    # independent recompute for one brand
    brand = part["p_brand"].iloc[0]
    bp = part[part["p_brand"] == brand]
    mx = late.groupby("l_partkey")["l_quantity"].max()
    n_all_small = sum(
        (pk not in mx.index) or (mx[pk] < 25.0) for pk in bp["p_partkey"]
    )
    got = res.set_index("p_brand").loc[brand, "n_all_small_late"]
    assert int(got) == n_all_small


def test_seasonal_index_invariants(spark):
    import numpy as np
    import pandas as pd

    res = (
        registry.get("a_seasonal_index")
        .fn(spark, SF_DIR_SMALL)
        .toPandas()
        .set_index("month")
    )
    orders = pd.read_parquet(f"{SF_DIR_SMALL}/orders.parquet")
    assert res["n_orders"].sum() == len(orders)
    assert sorted(res.index) == list(range(1, 13))
    # independent recompute of one month's index
    od = orders.copy()
    od["month"] = od["o_orderdate"].dt.month
    od["yr"] = od["o_orderdate"].dt.year
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    per = od.groupby("month").agg(
        n_periods=("yr", "nunique"), total=("cents", "sum")
    )
    g_total, g_periods = int(per["total"].sum()), int(per["n_periods"].sum())
    for m in (1, 12):
        want = (1000 * int(per.loc[m, "total"]) * g_periods) // (
            int(per.loc[m, "n_periods"]) * g_total
        )
        assert int(res.loc[m, "seasonal_permille"]) == want
    # partial-year awareness: fixture spans 1995-01..2001-08
    assert (res.loc[1:8, "n_periods"] > res.loc[9:12, "n_periods"].max() - 2).all()
    # weighted mean of indices reconstructs ~1000 permille
    w_mean = (res["seasonal_permille"] * res["n_periods"]).sum() / g_periods
    assert abs(w_mean - 1000) <= 2


def test_cusum_drift_matches_python_fold(spark):
    import math

    import pandas as pd

    for sf_dir in (SF_DIR_SMALL, SF_DIR):
        res = (
            registry.get("w_cusum_drift")
            .fn(spark, sf_dir)
            .toPandas()
            .set_index("event_type")
        )
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["cents"] = (ev["value"] * 100 + 0.5).apply(math.floor)
        ev["day"] = ev["ts"].dt.day
        daily = ev.groupby(["event_type", "day"])["cents"].sum()
        for et in res.index:
            vals = daily.loc[et].sort_index().tolist()
            target = sum(vals) // len(vals)
            k, h = target // 50, target // 8
            s = smax = alarms = 0
            for x in vals:
                s = max(0, s + x - target - k)
                smax = max(smax, s)
                alarms += s > h
            row = res.loc[et]
            assert row["target_cents"] == target
            assert row["cusum_max"] == smax, et
            assert row["n_alarms"] == alarms, et
        # alarm state is genuinely exercised at both SFs
        assert (res["n_alarms"] > 0).any()


def _holt_ref(vals):
    """Python truncated-division Holt fold (Spark div == DuckDB //
    truncate toward zero; Python // floors, hence tdiv)."""

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    lvl, trd, sae = vals[0], 0, 0
    for x in vals[1:]:
        sae += abs(x - lvl - trd)
        l_new = tdiv(x + 3 * (lvl + trd), 4)
        trd = tdiv((l_new - lvl) + 3 * trd, 4)
        lvl = l_new
    return lvl, trd, sae


def test_holt_linear_matches_python_fold(spark):
    """w_holt_linear_int vs an independent Python truncated-division
    fold at two SFs, including the non-vacuity of the signed states
    (trend goes negative somewhere; errors accumulate)."""
    import math

    import pandas as pd

    saw_negative_trend = False
    for sf_dir in (SF_DIR_SMALL, SF_DIR):
        res = (
            registry.get("w_holt_linear_int")
            .fn(spark, sf_dir)
            .toPandas()
            .set_index("event_type")
        )
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["cents"] = (ev["value"] * 100 + 0.5).apply(math.floor)
        ev["day"] = ev["ts"].dt.normalize()
        daily = ev.groupby(["event_type", "day"])["cents"].sum()
        for et in res.index:
            vals = daily.loc[et].sort_index().tolist()
            lvl, trd, sae = _holt_ref(vals)
            row = res.loc[et]
            assert row["n_days"] == len(vals), et
            assert row["level_cents"] == lvl, et
            assert row["trend_cents"] == trd, et
            assert row["forecast_5d_cents"] == lvl + 5 * trd, et
            assert row["sum_abs_err_cents"] == sae, et
            saw_negative_trend |= trd < 0
        assert (res["sum_abs_err_cents"] > 0).all()
    assert saw_negative_trend  # signed division paths are exercised


def test_holt_duckdb_fold_prefix_steps(ddb):
    """The DuckDB LIST-accumulator fold equals the Python reference
    at EVERY prefix length, not just the full series — the
    prefix-stepping check that caught the CUSUM shadowing trap (r8)
    and the first-combine shadowing inconsistency (r9). A struct
    form that exploited shadowing passes full-series comparisons on
    some series while being wrong at step 1; prefix-stepping cannot
    miss that."""
    vals = ddb.execute(
        """
        SELECT list(x ORDER BY day) FROM (
          SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS x
          FROM events WHERE event_type = 'click' GROUP BY day)
        """
    ).fetchone()[0]
    assert len(vals) >= 5
    for n in range(2, len(vals) + 1):
        pre = vals[:n]
        st = ddb.execute(
            f"""
            SELECT list_reduce(
              list_transform({pre}::BIGINT[],
                             x -> [CAST(0 AS BIGINT), x, CAST(0 AS BIGINT), x]),
              (acc, e) -> [
                acc[1] + abs(e[4] - acc[2] - acc[3]),
                (e[4] + 3 * (acc[2] + acc[3])) // 4,
                (((e[4] + 3 * (acc[2] + acc[3])) // 4) - acc[2]
                 + 3 * acc[3]) // 4,
                e[4]])
            """
        ).fetchone()[0]
        lvl, trd, sae = _holt_ref(pre)
        # st is a fetched Python list here — 0-based, unlike the
        # 1-based SQL subscripts above
        assert (st[0], st[1], st[2]) == (sae, lvl, trd), n


def test_mann_kendall_matches_python_reference(spark):
    """a_trend_mann_kendall vs an independent Python computation of
    S, tau, and the Theil-Sen median pair (Fraction-exact slope
    comparison — no float ordering anywhere in the reference), at
    two SFs; both trend signs must occur so the signed integer
    division path is exercised."""
    import math
    from fractions import Fraction

    import pandas as pd

    saw_pos = saw_neg = False
    for sf_dir in (SF_DIR_SMALL, SF_DIR):
        res = (
            registry.get("a_trend_mann_kendall")
            .fn(spark, sf_dir)
            .toPandas()
            .set_index("event_type")
        )
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["cents"] = (ev["value"] * 100 + 0.5).apply(math.floor)
        ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        daily = ev.groupby(["event_type", "day"])["cents"].sum()
        for et in res.index:
            s = daily.loc[et].sort_index()
            days, xs = list(s.index), list(s.values)
            n = len(days)
            pairs = [
                (int(xs[j] - xs[i]), int(days[j] - days[i]), days[i], days[j])
                for i in range(n)
                for j in range(i + 1, n)
            ]
            mk_s = sum((num > 0) - (num < 0) for num, *_ in pairs)
            # Rank by the IEEE-double num/den with (di, dj) tie-break
            # — MIRRORING the shipped entry/oracle ordering (ADVICE
            # r9: two distinct rationals that collapse to the same
            # double near the median must order the same way here as
            # in both engines, else this reference is a latent flake
            # on other fixtures). The Fraction check below still pins
            # that no such collapse occurs adjacent to the median on
            # THIS fixture, keeping the exact-rational guarantee.
            pairs.sort(key=lambda p: (p[0] / p[1], p[2], p[3]))
            mid = (len(pairs) + 1) // 2 - 1
            if 0 < mid < len(pairs) - 1:
                lo, md, hi = pairs[mid - 1], pairs[mid], pairs[mid + 1]
                assert (
                    Fraction(lo[0], lo[1])
                    <= Fraction(md[0], md[1])
                    <= Fraction(hi[0], hi[1])
                ), (lo, md, hi)
            ts = pairs[(len(pairs) + 1) // 2 - 1]
            row = res.loc[et]
            assert row["n_days"] == n and row["n_pairs"] == len(pairs), et
            assert row["mk_s"] == mk_s, et
            q = abs(1000 * mk_s) // len(pairs)
            assert row["tau_permille"] == (q if mk_s >= 0 else -q), et
            assert (row["ts_num"], row["ts_den"]) == (ts[0], ts[1]), et
            assert row["ts_slope"] == ts[0] / ts[1], et
            saw_pos |= mk_s > 0
            saw_neg |= mk_s < 0
    assert saw_pos and saw_neg


def test_jaccard_hub_cap_inactive_on_fixture(spark):
    """The r11 per-node neighbor cap (JACCARD_HUB_CAP lowest-id
    neighbors before the wedge self-join) bounds wedge fan-out at
    V * cap^2 on any degree distribution. Certify it is INACTIVE on
    the driver fixture at the largest SF — the closed k∈[0,100)
    content domain bounds degree at 99 — so every recorded driver
    row stands unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from sql_engine_triangle_spark.catalog import load_table
    from sql_engine_triangle_spark.queries.warehouse_ops import JACCARD_HUB_CAP

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
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
    adj = und.select(F.col("a").alias("w")).unionAll(
        und.select(F.col("b").alias("w"))
    )
    mx = adj.groupBy("w").count().agg(F.max("count").alias("mx")).collect()[0]["mx"]
    assert mx < JACCARD_HUB_CAP, (mx, JACCARD_HUB_CAP)


def test_jaccard_hub_cap_active_matches_oracle(spark, tmp_path):
    """Cap-ACTIVE certification on a synthetic 3-hub star graph whose
    hubs have degree 201 > JACCARD_HUB_CAP: the Spark entry and the
    DuckDB oracle must agree bit-for-bit under the identical
    deterministic row_number cut (leaves above the cap boundary drop
    out of every hub's capped list on BOTH engines)."""
    import duckdb
    import pandas as pd

    from sql_engine_triangle_spark.queries.warehouse_ops import (
        JACCARD_HUB_CAP,
        JACCARD_NEIGHBORS_ORACLE,
    )
    from sql_engine_triangle_spark.queries import registry as reg

    # Hubs 0,1,2; leaves 10..210. Per-leaf visit block [0,i,1,i,2,i]
    # yields star edges {0,i},{1,i},{2,i} only — hub degree 201.
    rows = []
    eid = 0
    for i in range(10, 211):
        for node in (0, i, 1, i, 2, i):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=eid),
                    "user_id": 1,
                    "event_type": "view",
                    "value": 1.0,
                    "props": '{"k": %d}' % node,
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    d = tmp_path / "hubgraph"
    (d / "events.parquet").mkdir(parents=True)
    pdf.to_parquet(d / "events.parquet" / "part-0.parquet", index=False)

    res = reg.get("graph_jaccard_neighbors").fn(spark, str(d)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    ora = con.execute(JACCARD_NEIGHBORS_ORACLE).fetchdf()
    assert len(res) == len(ora) > 0
    a = res.sort_values(list(res.columns)).reset_index(drop=True)
    b = ora[res.columns].sort_values(list(res.columns)).reset_index(drop=True)
    assert (a.astype(str) == b.astype(str)).all().all()
    # the cut is genuinely active: hubs keep only JACCARD_HUB_CAP
    # members, so every surviving leaf pair sits below the boundary
    hub_pair = res[(res["a"] == 0) & (res["b"] == 1)]
    assert len(hub_pair) == 1 and hub_pair.iloc[0]["deg_a"] == 201
    leaves = res[res["a"] >= 10]
    assert (leaves["b"] < 10 + JACCARD_HUB_CAP).all()
