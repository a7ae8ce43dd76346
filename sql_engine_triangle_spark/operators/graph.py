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
    # symmetric representation: both directions present
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.localCheckpoint()

    def signature(sym_edges: DataFrame) -> tuple:
        canon = sym_edges.filter(F.col("u") < F.col("v"))
        row = canon.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(sym_edges: DataFrame) -> DataFrame:
        # per-u hub: min(neighbors ∪ {u}); attach strictly-larger
        # neighbors to the hub
        m = sym_edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        out = (
            sym_edges.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return out.union(
            out.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    def small_star(sym_edges: DataFrame) -> DataFrame:
        # per-u over smaller neighbors only: hub = min(N<(u) ∪ {u});
        # attach u and its smaller neighbors to the hub
        smaller = sym_edges.filter(F.col("v") < F.col("u"))
        m = smaller.groupBy("u").agg(F.min("v").alias("m"))
        to_hub = (
            smaller.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return to_hub.union(
            to_hub.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    sig = signature(sym)
    for _ in range(max_iter):
        sym = small_star(large_star(sym)).localCheckpoint()
        new_sig = signature(sym)
        if new_sig == sig:
            break
        sig = new_sig
    # stars: every non-center vertex has its component min among its
    # neighbors; centers label themselves
    return (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("component"))
        .select(F.col("u").alias("vid"), "component")
    )
