"""Multimodal plumbing: feature extraction + frame sampling through
mapInPandas (deterministic stand-in kernels, real batch contracts)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.operators import multimodal as MM
from tests.conftest import SF_DIR_SMALL


def _assets(spark):
    return MM.docs_as_assets(load_table(spark, SF_DIR_SMALL, "documents"))


def test_extract_features_contract(spark):
    feats = MM.extract_features(_assets(spark)).collect()
    assert len(feats) == 500
    for r in feats[:20]:
        assert len(r.feature) == MM.FEATURE_DIM
        v = np.array(r.feature)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5  # unit-normalized
    # Determinism across runs.
    again = MM.extract_features(_assets(spark)).collect()
    assert [r.feature for r in feats] == [r.feature for r in again]


def test_sample_frames_fanout(spark):
    frames = MM.sample_frames(_assets(spark), n_frames=4)
    pdf = frames.toPandas()
    per_doc = pdf.groupby("doc_id").size()
    assert (per_doc <= 4).all() and (per_doc >= 1).all()
    assert (pdf["n_bytes"] > 0).all()
    # Frame bytes must reassemble a prefix of the source payload.
    one = pdf[pdf.doc_id == pdf.doc_id.iloc[0]].sort_values("frame_idx")
    src = _assets(spark).filter(F.col("doc_id") == int(one.doc_id.iloc[0])).head().content
    joined = b"".join(bytes(b) for b in one.frame_bytes)
    assert bytes(src).startswith(joined[: len(joined) // 2])


def test_feature_similarity_composes_with_ann(spark):
    """The extracted features are a valid embedding column: feed them
    through the brute-force cosine top-k operator (composition of the
    multimodal and similarity surfaces)."""
    from sql_engine_triangle_spark.operators import similarity

    feats = MM.extract_features(_assets(spark)).withColumnRenamed(
        "doc_id", "vec_id"
    ).withColumn("label", F.lit(0))
    q = [float(x) for x in feats.filter(F.col("vec_id") == 0).head().feature]
    top = similarity.brute_force_topk(feats.withColumnRenamed("feature", "embedding"), q, k=5)
    rows = top.collect()
    assert len(rows) == 5
    assert all(-1.0 <= r.cos_sim <= 1.0001 for r in rows)
