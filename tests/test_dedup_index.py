"""Persisted MinHash-LSH corpus index: the production ingest shape.

The inline asymmetric operator (minhash_lsh_pairs_against) recomputes
the corpus's signatures per call; write/probe_minhash_index persist
them once and probe per batch. These tests lock the two contracts the
docstrings promise: (1) index-backed probe ≡ inline operator, and
(2) the append-only index lifecycle reproduces the multi-batch
admission pipeline's externally-verified result exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.operators import dedup
from sql_engine_triangle_spark.queries import registry
from tests.conftest import SF_DIR


def _bucket():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )


def _pairs(df):
    return {(r.doc_new, r.doc_corpus, round(r.jaccard, 9)) for r in df.collect()}


def test_index_probe_equals_inline_operator(spark, tmp_path):
    """probe_minhash_index must emit exactly the pairs of
    minhash_lsh_pairs_against at both the equality (0.9) and
    production (0.5) thresholds."""
    docs = load_table(spark, SF_DIR, "documents")
    incoming = docs.filter(_bucket() >= 80)
    corpus = docs.filter(_bucket() < 80)

    path = str(tmp_path / "lsh_index")
    dedup.write_minhash_index(corpus, path)

    for thr in (0.9, 0.5):
        inline = dedup.minhash_lsh_pairs_against(incoming, corpus, threshold=thr)
        probed = dedup.probe_minhash_index(spark, incoming, path, threshold=thr)
        assert _pairs(probed) == _pairs(inline), f"divergence at threshold {thr}"


def test_append_lifecycle_reproduces_admission_pipeline(spark, tmp_path):
    """Index lifecycle (build seed → probe batch1 → append survivors →
    probe batch2) must admit exactly the doc_ids the one-plan
    pipeline_incremental_admission entry admits (which is itself
    checked against a DuckDB replay oracle)."""
    docs = load_table(spark, SF_DIR, "documents")
    bk = _bucket()
    seed = docs.filter(bk < 50)
    batch1 = docs.filter((bk >= 50) & (bk < 75))
    batch2 = docs.filter(bk >= 75)

    path = str(tmp_path / "lsh_index")
    dedup.write_minhash_index(seed, path)

    dup1 = {
        r.doc_new
        for r in dedup.probe_minhash_index(
            spark, batch1, path, threshold=0.9
        ).collect()
    }
    admitted1 = batch1.filter(~F.col("doc_id").isin(list(dup1) or [-1]))
    dedup.write_minhash_index(admitted1, path, mode="append")

    dup2 = {
        r.doc_new
        for r in dedup.probe_minhash_index(
            spark, batch2, path, threshold=0.9
        ).collect()
    }

    got = (
        {r.doc_id for r in seed.select("doc_id").collect()}
        | {r.doc_id for r in admitted1.select("doc_id").collect()}
        | {
            r.doc_id
            for r in batch2.filter(
                ~F.col("doc_id").isin(list(dup2) or [-1])
            ).select("doc_id").collect()
        }
    )
    want = {
        r.doc_id
        for r in registry.get("pipeline_incremental_admission")
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == want
