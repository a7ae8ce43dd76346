"""Pin for j_fuzzy_name_match's composite (brand × length-band)
blocking vs the brand-only exhaustive baseline (VERDICT r5 #4).

The sorted-neighborhood bound: Levenshtein(a,b) >= |len(a)-len(b)|,
and |len diff| <= 7 forces band diff <= 1 at band width 8 — so the
composite-blocked nearest MUST equal the exhaustive nearest wherever
the exhaustive nearest is within 7 edits, and can never be closer
than it (candidate subset). The brand-only form stays here as the
oracle baseline the production blocking is certified against.
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
    # The sorted-neighborhood guarantee: exhaustive nearest within 7
    # edits is always found exactly.
    near = {k: d for k, d in exact.items() if d <= 7}
    for k, d in near.items():
        assert comp.get(k) == d, (k, comp.get(k), d)
    # Coverage stays meaningful (blocking prunes pairs, not entities):
    # every entity with any same-(brand, band±1) peer appears; on the
    # fixture that should be nearly all parts with a same-brand peer.
    assert len(comp) >= 0.9 * len(exact), (len(comp), len(exact))
