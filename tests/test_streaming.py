"""Real Structured Streaming path: file source → watermark →
stateful windowed aggregation → availableNow trigger → memory sink,
cross-checked against the batch twin (which itself is oracle-checked
in the registry sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_triangle_spark.streaming import windows as W
from tests.conftest import SF_DIR_SMALL, assert_frames_match


def test_stream_tumbling_matches_batch(spark):
    from sql_engine_triangle_spark.catalog import load_table

    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    agg = W.tumbling_counts(stream.withWatermark("ts", W.WATERMARK))
    got = W.run_stream_to_memory(spark, agg, "t_tumbling", output_mode="complete")

    batch = W.tumbling_counts(load_table(spark, SF_DIR_SMALL, "events"))
    assert_frames_match(
        got.orderBy("window_start", "event_type").toPandas(),
        batch.orderBy("window_start", "event_type").toPandas(),
    )


def test_stream_session_windows_matches_batch(spark):
    from sql_engine_triangle_spark.catalog import load_table

    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    agg = W.session_windows(stream.withWatermark("ts", W.WATERMARK))
    got = W.run_stream_to_memory(spark, agg, "t_session", output_mode="complete")

    batch = W.session_windows(load_table(spark, SF_DIR_SMALL, "events"))
    assert_frames_match(
        got.orderBy("user_id", "session_start").toPandas(),
        batch.orderBy("user_id", "session_start").toPandas(),
    )


def test_stream_sliding_matches_batch(spark):
    from sql_engine_triangle_spark.catalog import load_table

    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    agg = W.sliding_counts(stream.withWatermark("ts", W.WATERMARK))
    got = W.run_stream_to_memory(spark, agg, "t_sliding", output_mode="complete")

    batch = W.sliding_counts(load_table(spark, SF_DIR_SMALL, "events"))
    assert_frames_match(
        got.orderBy("window_start", "event_type").toPandas(),
        batch.orderBy("window_start", "event_type").toPandas(),
    )


def test_stream_dedup_matches_batch_distinct(spark):
    """Streaming dropDuplicates (append mode, per-key state) must
    emit exactly the batch-distinct key set."""
    from sql_engine_triangle_spark.catalog import load_table

    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    got = W.run_stream_to_memory(
        spark, W.dedup_keys(stream), "t_dedup", output_mode="append"
    )
    batch = W.dedup_keys(load_table(spark, SF_DIR_SMALL, "events"))
    got_keys = {(r.user_id, r.event_type) for r in got.collect()}
    batch_keys = {(r.user_id, r.event_type) for r in batch.collect()}
    assert got_keys == batch_keys
    assert got.count() == len(got_keys)  # no duplicate emissions


def test_stream_dedup_checkpoint_resume(spark, tmp_path):
    """Exactly-once across restarts: run the streaming dedup with a
    checkpoint, stop, land a second batch of files, resume with the
    SAME checkpoint — the second run must process only the new files
    and the dedup state must survive the restart (no key emitted
    twice across the two runs)."""
    from sql_engine_triangle_spark.catalog import load_table

    batch = load_table(spark, SF_DIR_SMALL, "events")
    half1 = batch.filter(F.col("event_id") % 2 == 0)
    half2 = batch.filter(F.col("event_id") % 2 == 1)
    stage, out, ckpt = (str(tmp_path / d) for d in ("stage", "out", "ckpt"))
    half1.coalesce(1).write.mode("overwrite").parquet(stage)

    def run_once():
        stream = spark.readStream.schema(batch.schema).parquet(stage)
        q = (
            W.dedup_keys(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    half2.coalesce(1).write.mode("append").parquet(stage)
    run_once()

    rows = spark.read.parquet(out).collect()
    got_keys = {(r.user_id, r.event_type) for r in rows}
    batch_keys = {(r.user_id, r.event_type) for r in W.dedup_keys(batch).collect()}
    assert got_keys == batch_keys
    assert len(rows) == len(got_keys), "a key was re-emitted across the restart"
    assert n_first <= len(rows)


def test_session_window_exact_gap_boundary(spark):
    """Boundary semantics the SESSION_ORACLE depends on: Spark's
    session_window MERGES two events exactly `gap` apart (closed
    session extent [ts, ts+gap]), so a new session starts only on a
    strictly-greater gap. The fixture has no exact-gap pairs, so this
    synthetic case is the only guard — if a Spark upgrade flips to
    half-open windows, this fails and the oracle's `>` must become
    `>=`."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=15), 2.0),  # exactly gap: merge
        (2, t0, 1.0),
        (2, t0 + dt.timedelta(minutes=15, seconds=1), 2.0),  # > gap: split
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = {
        r.user_id: r.n
        for r in W.session_windows(df)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {1: 1, 2: 2}


def test_watermark_bounds_state(spark):
    """The watermarked streaming agg in append mode only emits
    finalized windows — state is bounded, late data beyond the
    watermark is dropped (the 100 TB safety property)."""
    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    agg = W.tumbling_counts(stream.withWatermark("ts", W.WATERMARK))
    got = W.run_stream_to_memory(spark, agg, "t_append", output_mode="append")
    # All but the final (unclosed) windows must be emitted.
    n_batch_windows = (
        W.tumbling_counts(
            __import__(
                "sql_engine_triangle_spark.catalog", fromlist=["load_table"]
            ).load_table(spark, SF_DIR_SMALL, "events")
        )
        .select("window_start")
        .distinct()
        .count()
    )
    n_emitted = got.select("window_start").distinct().count()
    assert n_emitted >= n_batch_windows - 2
    assert got.filter(F.col("cnt") <= 0).count() == 0


def test_stream_cdc_apply_foreachbatch(spark, tmp_path):
    """Streaming CDC apply: update batches arrive as a file stream;
    each micro-batch is merged into a parquet snapshot via
    foreachBatch + operators/merge.merge_upsert. The final snapshot
    must equal applying all updates in one batch merge."""
    import os

    from sql_engine_triangle_spark.catalog import load_table
    from sql_engine_triangle_spark.operators.merge import merge_upsert

    base = (
        load_table(spark, SF_DIR_SMALL, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .cache()
    )
    updates = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1).alias("o_totalprice"),
        F.lit("updated").alias("o_orderstatus"),
    )

    upd_dir = str(tmp_path / "updates")
    updates.repartition(3).write.parquet(upd_dir)  # 3 files → ≥1 micro-batch each
    snap_dir = str(tmp_path / "snapshot")

    stream = (
        spark.readStream.schema(updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(upd_dir)
    )

    def apply_batch(batch_df, batch_id):
        if os.path.exists(os.path.join(snap_dir, "_SUCCESS")):
            snap = batch_df.sparkSession.read.parquet(snap_dir)
        else:
            snap = base
        out = merge_upsert(snap, batch_df, "o_orderkey")
        # rewrite-snapshot sink (a table format with MERGE support
        # replaces this rewrite at scale); collect-then-write avoids
        # reading and overwriting the same files in one job
        rows = out.collect()
        batch_df.sparkSession.createDataFrame(rows, out.schema).write.mode(
            "overwrite"
        ).parquet(snap_dir)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(snap_dir).orderBy("o_orderkey").toPandas()
    want = (
        merge_upsert(base, updates, "o_orderkey").orderBy("o_orderkey").toPandas()
    )
    assert_frames_match(got, want)


def test_streaming_ingest_dedup_pipeline(spark, tmp_path):
    """The production training-data ingest loop end-to-end: document
    batches arrive as a file stream; each micro-batch is near-dup
    checked against the accumulated corpus snapshot with the
    asymmetric LSH operator (dedup.minhash_lsh_pairs_against), only
    novel documents are admitted, and the snapshot grows. The final
    corpus must equal a batch-by-batch replay of the SAME admission
    rule over the micro-batch composition the stream actually
    processed (logged per batch, so the check is independent of the
    file-listing order Spark happens to pick)."""
    import os

    from sql_engine_triangle_spark.catalog import load_table
    from sql_engine_triangle_spark.operators import dedup

    docs = load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    seed = docs.filter(bucket < 50).cache()
    incoming = docs.filter(bucket >= 50)

    in_dir = str(tmp_path / "incoming")
    incoming.repartition(2).write.parquet(in_dir)  # 2 files → 2 micro-batches
    corpus_dir = str(tmp_path / "corpus")
    log_dir = str(tmp_path / "batchlog")
    seed.write.parquet(corpus_dir)

    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def admit(batch_df, batch_id):
        s = batch_df.sparkSession
        batch_rows = batch_df.collect()
        b = s.createDataFrame(batch_rows, batch_df.schema)
        b.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            log_dir
        )
        snap = s.read.parquet(corpus_dir)
        dup_ids = (
            dedup.minhash_lsh_pairs_against(b, snap, threshold=0.9)
            .select(F.col("doc_new").alias("doc_id"))
            .distinct()
        )
        novel = b.join(dup_ids, "doc_id", "left_anti")
        rows = novel.collect()
        if rows:
            s.createDataFrame(rows, novel.schema).write.mode("append").parquet(
                corpus_dir
            )

    q = (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    got_ids = {
        r.doc_id for r in spark.read.parquet(corpus_dir).select("doc_id").collect()
    }

    # Replay the admission rule batch-at-a-time in the logged order.
    log = spark.read.parquet(log_dir)
    batch_ids = sorted(r.batch_id for r in log.select("batch_id").distinct().collect())
    corpus = seed
    for bid in batch_ids:
        b = log.filter(F.col("batch_id") == bid).select("doc_id", "text")
        dup_ids = (
            dedup.minhash_lsh_pairs_against(b, corpus, threshold=0.9)
            .select(F.col("doc_new").alias("doc_id"))
            .distinct()
        )
        corpus = corpus.unionByName(b.join(dup_ids, "doc_id", "left_anti")).cache()
    want_ids = {r.doc_id for r in corpus.select("doc_id").collect()}

    assert got_ids == want_ids
    seed_ids = {r.doc_id for r in seed.select("doc_id").collect()}
    assert seed_ids <= got_ids
    admitted = got_ids - seed_ids
    all_incoming = {r.doc_id for r in incoming.select("doc_id").collect()}
    rejected = all_incoming - admitted
    assert rejected, "fixture should contain cross-split near-dups to reject"


def test_stream_stream_interval_join_matches_batch(spark):
    """Real stream-stream interval join: purchases joined to views
    within [p.ts - 30min, p.ts] per user, both sides watermarked
    (the condition Spark requires to bound join state). Must emit
    exactly the batch interval-join pairs (j_interval_events twin)."""
    from sql_engine_triangle_spark.queries import registry

    src = W.stream_from_parquet(spark, SF_DIR_SMALL)
    p = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    v = (
        W.stream_from_parquet(spark, SF_DIR_SMALL)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )
    got = W.run_stream_to_memory(spark, joined, "t_ssij", output_mode="append")
    want = registry.get("j_interval_events").fn(spark, SF_DIR_SMALL)
    assert_frames_match(
        got.orderBy("purchase_id", "view_id").toPandas(),
        want.toPandas(),
    )


def test_stream_static_broadcast_enrichment(spark):
    """Stream-static join: a readStream of events enriched against a
    STATIC dimension (the per-user event-type profile computed in
    batch) must produce exactly the batch join's rows. The static
    side needs no watermark and no state — Spark re-plans it per
    micro-batch with the usual broadcast strategy, which is how
    dimension enrichment works in a streaming ingest pipeline."""
    from pyspark.sql import functions as F

    from sql_engine_triangle_spark.catalog import load_table
    from sql_engine_triangle_spark.streaming import windows as W
    from tests.conftest import SF_DIR_SMALL

    batch_ev = load_table(spark, SF_DIR_SMALL, "events")
    dim = (
        batch_ev.groupBy("user_id")
        .agg(F.count("*").alias("user_total"))
    )

    stream = W.stream_from_parquet(spark, SF_DIR_SMALL)
    enriched = (
        stream.select("event_id", "user_id")
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "user_total")
    )
    got = (
        W.run_stream_to_memory(spark, enriched, "t_enrich", output_mode="append")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        batch_ev.select("event_id", "user_id")
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "user_total")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["event_id"].values == want["event_id"].values).all()
    assert (got["user_total"].values == want["user_total"].values).all()
