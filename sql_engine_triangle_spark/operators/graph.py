"""Graph operators over pair frames (dedup clustering surface).

Near-dup detection yields PAIRS; actually deduplicating a corpus
needs the transitive closure — every document mapped to one canonical
representative per connected component of the similarity graph. This
is the standard final stage of a MinHash/LSH dedup pipeline.

Implementation: iterative min-label propagation as pure DataFrame
jobs. Each round joins current labels onto the (symmetrized) edge
list and takes the per-vertex min over proposed + own labels; rounds
until a fixpoint. `localCheckpoint` truncates lineage every round so
the plan doesn't grow with iterations (the classic iterative-Spark
trap).

Scale notes (100 TB):
- Rounds needed = graph diameter. Near-dup components are short
  chains/cliques, so a handful of rounds suffices; for adversarial
  diameters use the alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  which converges in O(log n) rounds with the same join-shuffle
  primitive.
- Each round is one edges⋈labels shuffle plus a groupBy(min) —
  both partition by vertex id, so AQE reuses the partitioning.
- The convergence check is a count aggregate (no driver-side data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in `pairs`;
    component id = the minimum vertex id in the connected component.
    Deterministic: min-label fixpoint is independent of iteration
    order."""
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint()

    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("vid"), F.col("u").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        proposed = edges.join(
            labels.withColumnRenamed("vid", "u"), "u"
        ).select(F.col("v").alias("vid"), "label")
        new_labels = (
            proposed.union(labels)
            .groupBy("vid")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old_label"), "vid"
            )
            .filter(F.col("label") != F.col("old_label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("vid"), F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(vid, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — same output contract as ``connected_components`` but
    O(log n) rounds regardless of graph diameter, so it is the right
    variant for adversarial shapes (long chains of pairwise near-dups,
    e.g. chained paraphrases) where min-label propagation needs
    diameter-many rounds.

    Each round is two neighbor-min aggregations + edge rewrites —
    the same groupBy/join shuffle primitive as the fixpoint form, all
    hash-partitioned by vertex id. Fixpoint detection compares a
    (count, xxhash64-sum) signature of the canonical undirected edge
    set — two cheap aggregates, no driver-side data. At convergence
    the edge set is a union of stars centered on each component's
    minimum vertex."""
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    if not e.head(1):
        return e.select(F.col("u").alias("vid"), F.col("v").alias("component"))
    # CANONICAL DIRECTED state (r11 optimization round): the round
    # state is kept as "down" edges (v < u on every row) instead of
    # the symmetric set. Both stars' outputs are down-form by
    # construction — large-star attaches strictly-larger neighbors to
    # a hub that is <= u, small-star attaches smaller neighbors (and
    # u) to the minimum of the smaller neighborhood — so the previous
    # union(swap).distinct() after EACH star re-shuffled 2x rows per
    # round for nothing. The symmetric view large-star needs is
    # rebuilt as a free union of the two disjoint directions (down is
    # distinct and the directions cannot collide, so no distinct is
    # needed). Two exchanges per round are removed; every
    # intermediate halves. Output values are unchanged: the final
    # aggregation below runs on the reconstructed symmetric set,
    # exactly the original expression.
    down = (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )

    def _sym(down_edges: DataFrame) -> DataFrame:
        return down_edges.union(
            down_edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def signature(down_edges: DataFrame) -> tuple:
        # canonical pair of a down edge (u, v) with v < u is (v, u) —
        # same hash stream as the historical sym.filter(u < v) form.
        row = down_edges.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("v", "u").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(down_edges: DataFrame) -> DataFrame:
        # per-u hub over ALL neighbors: min(N(u) ∪ {u}); attach
        # strictly-larger neighbors to the hub. Output rows are
        # (v_old, m) with m <= u < v_old, i.e. down-form.
        sym_edges = _sym(down_edges)
        m = sym_edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym_edges.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(down_edges: DataFrame) -> DataFrame:
        # the smaller-neighbor set of u IS the down edge list; hub =
        # min(N<(u)); attach u and its smaller neighbors to the hub.
        # Output rows are (v_old, m) and (u, m) with m the minimum of
        # u's smaller neighborhood — down-form again.
        m = down_edges.groupBy("u").agg(F.min("v").alias("m"))
        return (
            down_edges.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    sig = signature(down)
    for _ in range(max_iter):
        down = small_star(large_star(down)).localCheckpoint()
        new_sig = signature(down)
        if new_sig == sig:
            break
        sig = new_sig
    # stars: every non-center vertex has its component min among its
    # neighbors; centers label themselves. Computed on the symmetric
    # view — the exact historical expression, so the output contract
    # (one row per vertex, centers self-labeled) is unchanged.
    return (
        _sym(down)
        .groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("component"))
        .select(F.col("u").alias("vid"), "component")
    )
