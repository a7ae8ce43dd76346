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
