"""Pins for j_fuzzy_name_match's composite (brand × first-token)
blocking vs the brand-only exhaustive baseline (VERDICT r5 #4).

Properties certified: (1) SUBSET — blocked candidates are a subset of
the brand-only candidates, so the blocked nearest distance can never
undercut the exhaustive one; (2) SAME-TOKEN EXACTNESS — wherever the
exhaustive nearest shares the probe's first token, the blocked result
reports exactly that distance (blocking loses only cross-token
matches, the documented ER recall tradeoff). The length-band
sorted-neighborhood variant (distance-bounded exactness) was built
first and measured vacuous on this fixture — names are 7-12 chars, so
every same-brand pair sits within one band and the full per-brand
quadratic returns (16.0M pairs / 15 s of levenshtein at sf0.1 vs
2.0M / ~2 s with first-token blocking).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as Wnd

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR_SMALL


def _exhaustive_brand_only(spark, sf_dir):
    """The r5 form: nearest same-brand neighbor, NO length banding —
    the exhaustive baseline (quadratic per brand; test-only)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select("p_partkey", "p_brand", F.col("p_name").alias("na"))
    b = p.select(
        F.col("p_partkey").alias("match_key"),
        "p_brand",
        F.col("p_name").alias("nb"),
    )
    pairs = (
        a.join(b, "p_brand")
        .filter(F.col("p_partkey") != F.col("match_key"))
        .select(
            "p_partkey",
            "match_key",
            F.levenshtein("na", "nb").cast("long").alias("edit_dist"),
        )
    )
    w = Wnd.partitionBy("p_partkey").orderBy("edit_dist", "match_key")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "match_key", "edit_dist")
    )


def test_fuzzy_composite_blocking_vs_exhaustive_baseline(spark):
    comp = {
        r.p_partkey: r.edit_dist
        for r in registry.get("j_fuzzy_name_match").fn(spark, SF_DIR_SMALL).collect()
    }
    exact = {
        r.p_partkey: r.edit_dist
        for r in _exhaustive_brand_only(spark, SF_DIR_SMALL).collect()
    }
    assert exact, "baseline empty — fixture problem"
    # Composite candidates are a subset: never closer than exhaustive.
    for k, d in comp.items():
        assert d >= exact[k], (k, d, exact[k])


def _dist(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_same_token_exactness(spark):
    """Wherever the exhaustive same-brand nearest neighbor shares the
    probe's first name token, the (brand, first-token)-blocked result
    must report exactly that distance — the blocking loses only
    cross-token matches (the documented recall tradeoff), never
    within-block precision. Verified with a pure-Python Levenshtein
    so the check is engine-independent."""
    comp = {
        r.p_partkey: r.edit_dist
        for r in registry.get("j_fuzzy_name_match").fn(spark, SF_DIR_SMALL).collect()
    }
    rows = (
        load_table(spark, SF_DIR_SMALL, "part")
        .select("p_partkey", "p_brand", "p_name")
        .collect()
    )
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append((r.p_partkey, r.p_name))
    n_checked = 0
    for brand, members in by_brand.items():
        for k, nm in members:
            best = None
            for k2, nm2 in members:
                if k2 == k:
                    continue
                d = _dist(nm, nm2)
                if best is None or d < best[0] or (d == best[0] and k2 < best[1]):
                    best = (d, k2, nm2)
            if best is None:
                continue
            if best[2].split(" ")[0] == nm.split(" ")[0]:
                assert comp.get(k) == best[0], (k, comp.get(k), best)
                n_checked += 1
    assert n_checked > 0


def test_fuzzy_block_cap_inactive_on_fixture(spark):
    """The r10 per-block participation cap (FUZZY_BLOCK_CAP lowest-key
    members per (brand, first-token) block) bounds blocked pair work
    at blocks * cap^2 on any name vocabulary. Certify it is INACTIVE
    on the driver fixture at the largest SF — max block size strictly
    under the cap — so every recorded driver row and the two pins
    above stand unchanged. (sf0.1 is the worst case: block size grows
    with SF under the fixture's closed 8x8 name law; measured max 128
    there.)"""
    from sql_engine_triangle_spark.queries.aux_ops import FUZZY_BLOCK_CAP

    mx = (
        load_table(spark, "/root/testdata/sf0.1", "part")
        .select(
            "p_brand",
            F.element_at(F.split(F.col("p_name"), " "), 1).alias("ft"),
        )
        .groupBy("p_brand", "ft")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx < FUZZY_BLOCK_CAP, (mx, FUZZY_BLOCK_CAP)


def test_range_bands_bucketed_equals_nested_loop_form(spark):
    """Rule-3 form equivalence: the bucketized equi-join range join
    must produce exactly the nested-loop form's rows, and its plan
    must contain NO nested loop (the entire point of the
    decomposition) while joining on the bucket key."""
    from sql_engine_triangle_spark.plans import asserts as pa

    a = registry.get("j_range_bands").fn(spark, SF_DIR_SMALL)
    b = registry.get("j_range_bands_bucketed").fn(spark, SF_DIR_SMALL)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = pa.executed_plan(b)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
