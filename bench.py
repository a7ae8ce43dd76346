#!/usr/bin/env python
"""Headline-query benchmark (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE COMPACT JSON line as the very last stdout line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

where ``queries`` carries the 5 headline entries + the 10 heaviest
others (the full per-entry dict goes to the committed
``BENCH_FULL.json``). Round 5's 91-entry single-line record was
truncated by the driver's tail capture (`parsed: null` — VERDICT r5
#2); the compact-line + full-file split makes the external record
survive any tail window.

Entries run in COHORTS, each in a FRESH JVM (subprocess): round 5
measured +23.7% like-for-like drift purely from battery growth in one
shared session (GC/codegen-cache pressure inflating later entries —
VERDICT r5 "What's wrong" #2; pipeline_corpus_build 13.0 s in-battery
vs 9.68 s solo). Cohort isolation keeps round-over-round deltas
meaningful at ~6-10 s JVM startup per cohort, excluded from timings.

Per-query wall-clock is measured on a warmed session (JVM startup and
first-parquet-footer reads excluded via a warmup pass), matching how
the reference lab reports steady-state per-query timings
(BASELINE.md — single-query wall-clock, not cold start).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_engine_triangle_spark.queries import registry  # noqa: E402
from sql_engine_triangle_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_agg_by_type",
    "q2_town_month_rollup",
    "q3_yoy_window",
    "q4_top_nations_percentiles",
    "q4_approx_sketch",
]
# Optional extras benched when present (filled in as rounds add ops).
EXTRA = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality_scores",
    "pipeline_corpus_prep",
    "j_star_revenue",
    "asof_purchase_attribution",
    "w_moving_avg",
    "stream_tumbling_counts",
    "sim_ivf_topk",
    "pipeline_funnel_conversion",
    "tpch_q5_local_supplier_volume",
    "text_boilerplate_strip",
    "dedup_incremental",
    # dedup_containment intentionally NOT benched: it is the quadratic
    # correctness baseline (same class as dedup_ngram_jaccard); the
    # benched scale path for pair generation is dedup_minhash_lsh.
    "emb_l2_normalize",
    "text_compression_ratio",
    "j_interval_events",
    "pipeline_cohort_retention",
    "pipeline_incremental_admission",
    "sample_weighted_mix",
    "dedup_minhash_lsh_mid",
    "pipeline_decontaminate",
    "multimodal_decode_stats",
    "text_bigram_logprob",
    "text_tfidf_topterms",
    "pipeline_chunk_documents",
    "pipeline_pack_sequences",
    # JVM-fold vs Arrow comparison carrier: dedup_semantic stays benched
    # next to dedup_semantic_arrow so the fold-vs-matmul signal is
    # re-measured every round. Its family twins sim_knn_join and
    # sim_hard_negatives (JVM forms) are dropped from the battery
    # (VERDICT r6 #5 — ~10 s of redundant wall): their like-for-like
    # numbers are carried by the SAME comparison pair (identical
    # cluster-bounded pair-join plan shape, only the scoring fold
    # differs) plus their benched Arrow twins below. Both stay in the
    # full-registry oracle sweep and the bit-equality pins.
    "dedup_semantic",
    "pipeline_shard_layout",
    "w_sessionize",
    "w_scd2_history",
    "tpch_q18_big_orders",
    "tpch_q7_volume_shipping",
    "tpch_q19_disjunctive_join",
    "dedup_common_spans",
    "sim_hybrid_rrf",
    "pipeline_token_budget",
    "curation_domain_cap",
    "pipeline_corpus_build",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "tpch_q21_waiting_supplier",
    # r5: first bench rows BEFORE their first driver window round, so
    # their first correctness round has a perf baseline (VERDICT r4 §5).
    # (sim_hard_negatives JVM form dropped r7 — see dedup_semantic note.)
    "emb_label_centroids",
    "sim_centroid_classify",
    # late-r5 additions (r6 rotation queue) — same pre-baseline rule.
    "pipeline_corpus_build_cc",
    "text_gopher_rules",
    "a_mad_outliers",
    "a_heavy_hitters",
    "j_skew_salted",
    "asof_tolerance_attribution",
    "sim_quantized_topk",
    "maint_incremental_agg",
    # Arrow throughput forms of the cluster-bounded cosine family —
    # benched next to their JVM twins (measured 2.6-3.2x at sf0.1).
    "sim_knn_join_arrow",
    "dedup_semantic_arrow",
    "sim_hard_negatives_arrow",
    "graph_pagerank",
    "ml_kmeans_int",
    "a_bitmap_distinct",
    "graph_triangle_count",
    "w_ema_int",
    "a_bitmap_rolling_distinct",
    "maint_snapshot_diff",
    "dedup_pair_histogram",
    "a_frequent_pairs",
    "a_percentile_disc",
    "u_union_by_name",
    "graph_reachability",
    "w_running_distinct",
    "w_interval_coverage",
    "a_weighted_median",
    "dedup_drop_witness",
    "text_vocab_coverage",
    "curation_domain_concentration",
    "pipeline_contamination_report",
    "pipeline_dataset_card",
    "a_autocorr_terms",
    "dedup_cluster_size_hist",
    "pipeline_repeat_factors",
    "w_longest_streak",
    "maint_table_checksum",
    "a_benford_digits",
    "j_fuzzy_name_match",
    "pipeline_attribution_split",
    # r6: contamination-aware capstone (first bench row BEFORE its
    # first driver round, per the pre-baseline rule).
    "pipeline_corpus_build_decontam",
    # r6-built r7-queue entries (same pre-baseline rule).
    "a_linear_trend",
    "sim_sparse_cosine_pairs",
    "text_inverted_index",
    "j_bloom_prefilter",
    "ml_power_iteration",
    "w_window_funnel",
    "multimodal_patch_stats",
    "a_equidepth_hist",
    "f_sequence_gaps",
    "emb_pq_codebook",
    "sim_pq_adc_topk",
    "sql_entry_window_funnel",
    "asof_nearest_attribution",
    "graph_degree_distribution",
    "u_multiset_ops",
    "maint_partition_skew_report",
    "pipeline_quality_dup_calibration",
    "pipeline_token_lorenz",
    # r7: real-tokenizer tier + maximal repeated-passage merge
    # (pre-baseline rule — benched the same round they enter the
    # window).
    "text_tokenize_bpe",
    "pipeline_token_budget_bpe",
    "dedup_repeated_passages",
    # r7: the 10 never-rowed entries rotated in for full rule-1
    # compliance — bench rows land the same round as their first
    # driver rows (those not already in the battery above).
    "tpch_q3_shipping_priority",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_late_shipments",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "f_winsorize",
    # r7: the bucketized range-join scale form, benched next to its
    # nested-loop twin j_range_bands' family (form equivalence pinned).
    "j_range_bands_bucketed",
    # r8: mergeable quantile tiles (first bench row the round they
    # enter the window, per the pre-baseline rule).
    "a_percentile_partial_rollup",
    # r8: true iterative pair-merge BPE trainer (VERDICT r7 #5),
    # benched next to the one-pass wordpiece trainer it extends.
    "text_bpe_train_merges",
    # r8: governance/quality/pattern tier (pre-baseline rule — benched
    # AND rotated into the window the round they are built): count-min
    # tiles complete the mergeable-sketch family; MATCH_RECOGNIZE-lite
    # row-pattern regex; neighborhood-Jaccard link prediction;
    # Deequ-style one-scan constraint suite; k-anonymity audit.
    "a_cms_partial_rollup",
    "w_pattern_match_regex",
    "graph_jaccard_neighbors",
    "maint_data_quality_checks",
    "curation_k_anonymity",
    # r8 batch 2 (same pre-baseline rule): quantified ALL/ANY
    # decorrelation; per-dimension embedding QA; bounded-frame exact
    # rolling median; deterministic synchronized label propagation.
    "sub_quantified_anyall",
    "emb_dim_stats",
    "w_rolling_median",
    "graph_label_propagation",
    # r8 batch 3: exact mid-rank ROC-AUC (rank arithmetic on the
    # score histogram) and the month-of-year seasonal index.
    "ml_auc_exact",
    "a_seasonal_index",
    # r8 batch 4: CUSUM change-point monitor (Page's test, integer
    # fold — the entry that surfaced the DuckDB struct-shadowing trap).
    "w_cusum_drift",
    # r9 (pre-baseline rule — benched AND rotated the round they are
    # built): BM25 retrieval scoring on the bigram index (index USE
    # next to text_inverted_index's index BUILD) and perceptual-hash
    # image dedup (real PPM decode -> pooled dHash -> Hamming-banded
    # pairs).
    "text_bm25_topk",
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    # r9 session-2 tier: video scene detection + keyframe dedup (the
    # four-modality completion), MMR re-rank, Holt forecasting,
    # l-diversity governance.
    "multimodal_video_scenes",
    "dedup_video_keyframes",
    "sim_mmr_diversified",
    "w_holt_linear_int",
    "curation_l_diversity",
    "pipeline_multimodal_corpus_build",
    "sim_ivfpq_adc_topk",
    "a_trend_mann_kendall",
    # r10 tier: the third governance gate and the retrieval-quality
    # eval (shares the IVF-PQ training chain with sim_ivfpq_adc_topk).
    "curation_t_closeness",
    "eval_ivfpq_mrr_recall",
    "eval_bm25_mrr_recall",
    "ml_calibration_ece",
    # r11 tier (pre-baseline rule — benched AND rotated the round they
    # are built): the stupid-backoff LM quality filter (VERDICT r10
    # #6), benched in the text cohort next to its MLE precursor
    # text_bigram_logprob; and the cross-modal link consistency eval
    # (VERDICT r10 #7), benched next to the fingerprint stacks it
    # composes.
    "text_lm_stupid_backoff",
    "eval_crossmodal_consistency",
    # r11: dedup-quality eval against the dup-marker ground truth.
    "eval_dedup_precision_recall",
    # r11 session-2 tier (pre-baseline rule — benched AND rotated the
    # round they are built): temperature mixture allocation, DSIR
    # importance selection, the trained odds-ratio quality filter,
    # and the midrank-Spearman signal-agreement eval.
    "sample_temperature_mixture",
    "curation_dsir_importance",
    "ml_odds_ratio_classifier",
    "eval_rank_agreement",
    # dedup_keep_best_quality intentionally NOT benched: it is
    # dedup_clusters_lsh (iterative CC, also unbenched) + one window;
    # bench tracks the pair-generation scale path instead.
    # dedup_clusters_lsh's like-for-like number is carried by its
    # named bench proxies: pipeline_corpus_build_cc (the same LSH
    # pairs -> large/small-star CC machinery inside the capstone) and
    # dedup_cluster_size_hist (same machinery + a bounded rollup) —
    # both benched above (VERDICT r5 #6 linkage rule, the
    # dedup_containment-exclusion pattern).
]


def _ivf_bare(spark, sf_dir):
    """The bare IVF top-k operator (build-or-probe + rerank), without
    the brute-force exact twin + certification the registry's
    ``sim_ivf_topk`` validation form runs alongside it. Benched under
    its own id so round-over-round comparisons stay like-for-like:
    the r4 `sim_ivf_topk` number jumped +77% when the entry's
    SEMANTICS changed to the validation form (roughly double the work
    by construction), not because the operator regressed (VERDICT r4
    "watch item")."""
    from pyspark.sql import functions as F

    from sql_engine_triangle_spark.catalog import load_table
    from sql_engine_triangle_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = similarity.query_vector(emb, 0)
    return similarity.ivf_topk(emb, qvec, k=10, exclude_id=0, cache_key=sf_dir)


# Benched operator forms that are not registry entries (bare operators
# whose registry twin is a validation form with extra by-construction
# work). Keys MUST not collide with registry names — asserted at
# startup in main() (ADVICE r5: BARE_OPS.get(name) wins silently over
# a same-named registry entry, so a collision would quietly bench the
# wrong function).
BARE_OPS = {
    "sim_ivf_topk_bare": _ivf_bare,
}


def _cohort_of(name: str) -> str:
    """Assign every benched entry to a fresh-JVM cohort by family.
    Prefix rules (not hand lists) so new entries land in a cohort
    automatically; the partition is total by construction."""
    if name in HEADLINE:
        return "core"
    if name == "text_bpe_train_merges":
        # Solo cohort (VERDICT r9 #3): inside the text cohort this
        # entry read 12.9 s vs 3.4 s solo — 12 argmax-collect rounds
        # are uniquely sensitive to cohort-accumulated JVM state, and
        # the battery number was pure contamination (solo_baseline
        # carried the truth). A fresh JVM of its own makes the
        # battery row equal the solo truth.
        return "bpe"
    if name.startswith("tpch_"):
        return "tpch"
    if name.startswith("eval_"):
        # Split out of dedup_sim (r12, VERDICT r11 #1 cohort audit):
        # the r11 build session appended ~14 s of checkpoint-heavy
        # eval_* entries to the dedup_sim battery — the r7/r8
        # battery-size contamination class — and the driver's 32-core
        # dedup_sim rows inflated 1.3-3.5x while the same code read
        # clean solo. The composed evals get their own fresh JVM.
        return "evals"
    if name.startswith(("dedup_", "sim_", "emb_")):
        return "dedup_sim"
    if name.startswith(("pipeline_", "curation_", "sample_")):
        return "pipeline"
    if name.startswith(("text_", "multimodal_")):
        return "text"
    return "misc"  # windows/agg/join/maint/graph/stream tier


COHORT_ORDER = [
    "core", "tpch", "dedup_sim", "evals", "pipeline", "text", "bpe", "misc"
]


def _bench_names() -> list[str]:
    names = [n for n in HEADLINE + EXTRA if n in registry.names()]
    return names + list(BARE_OPS)


def _release_persisted(spark) -> None:
    """UNTIMED hygiene between runs (r12 measurement fix, declared in
    OPTIMIZATION_r12.md): drop every persisted block the previous run
    left behind. fn() is rebuilt inside every timed run, so each run
    materializes its own localCheckpoints — but the PREVIOUS run's
    checkpoint blocks stay pinned in the BlockManager until the
    driver-side DataFrames are GC'd and the ContextCleaner catches
    up. Over a battery they accumulate (dozens of frames x runs), and
    at high core counts the resulting memory/GC pressure inflates
    later runs: the r11 driver's 32-core dedup_sim cohort read
    1.3-3.5x its own 8-core and solo numbers on identical code
    (VERDICT r11 "What's wrong" #1), and this session reproduced the
    same inflation in miniature (battery 2.48/4.61/5.33 vs solo
    2.05/3.50/3.86 on the lsh/lsh_mid/semantic trio). Blocking
    unpersist so no removal work bleeds into the next timed run.
    Nothing a run needs can be released here: no frame survives
    between runs by construction (the no-cross-run-caching
    contract). Deliberately NO gc.collect(): poking the Python GC
    also feeds the JVM ContextCleaner a burst of broadcast/shuffle
    cleanups that its single thread then processes DURING the next
    timed run (measured on the iterative trainer entries:
    sim_ivfpq_adc_topk 3.1 -> 4.4-5.5 s with a gc poke here); the
    explicit unpersist below needs no Python GC — it enumerates the
    JVM-side persisted-RDD registry directly and removes the blocks
    synchronously."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in jmap.values():
            jrdd.unpersist(True)
    except Exception:  # noqa: BLE001 - hygiene must never fail a bench
        pass


def _run_cohort(cohort: str) -> None:
    """Child-process mode: bench one cohort in this (fresh) JVM and
    print its timings dict as the last stdout line."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"bench-{cohort}")
    names = [n for n in _bench_names() if _cohort_of(n) == cohort]

    # Warmup: touch every input table once (footer/schema reads, JVM
    # JIT) without executing the benchmark queries themselves.
    from sql_engine_triangle_spark.catalog import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001
            pass

    timings: dict[str, float] = {}
    for name in names:
        fn = BARE_OPS.get(name) or registry.get(name).fn

        def run() -> None:
            # noop sink: full evaluation of EVERY output column on the
            # JVM (a bare .count() lets Catalyst prune computed columns,
            # so projection-heavy entries would time a row-count scan
            # instead of the operator under test).
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        n = fn(spark, sf_dir).count()  # row count for the log only
        _release_persisted(spark)
        run()  # warmup: steady-state per-query wall-clock, matching
        # how the reference lab reports warm timings (BASELINE.md).
        # Min of two timed runs: even a cohort-sized sweep has GC/JIT
        # contention spikes (j_star_revenue measured 2.06 s in-sweep
        # vs 1.33 s solo); the min is the steady-state number the
        # per-query lab timings correspond to.
        ts = []
        for _ in range(2):
            _release_persisted(spark)  # untimed, before the clock
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        dt = min(ts)
        _release_persisted(spark)
        timings[name] = round(dt, 3)
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    print("COHORT_RESULT " + json.dumps(timings))


def _run_solo(name: str, n_runs: int = 3) -> None:
    """Solo drift-reconciliation mode (CLAUDE.md r6/r7 discipline):
    bench ONE entry in this fresh JVM — warmed noop-sink runs,
    min-of-n — and print a one-line JSON. Use when the cohort
    battery's prev_common block flags an entry past noise: a solo
    number matching the prior round's solo number means battery
    variance, not a plan regression."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"bench-solo-{name}")
    from sql_engine_triangle_spark.catalog import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001
            pass
    fn = BARE_OPS.get(name) or registry.get(name).fn

    def run() -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()
    ts = []
    for _ in range(n_runs):
        _release_persisted(spark)  # untimed, before the clock
        t0 = time.time()
        run()
        ts.append(round(time.time() - t0, 3))
    print(json.dumps({"entry": name, "solo_min": min(ts), "runs": ts, "sf_dir": sf_dir}))


# Reconciliation trigger (VERDICT r7 #2): an entry must exceed BOTH
# bounds to flag — the relative bound alone fires on sub-second noise
# (a 0.2 s entry drifting 0.1 s), the absolute bound alone fires on
# slow entries' normal variance (the capstones swing ±1 s at ~5%).
SOLO_RECONCILE_REL = 0.30
SOLO_RECONCILE_ABS_SEC = 0.5


def _drift_flagged(prev: dict[str, float], cur: dict[str, float]) -> list[str]:
    """Entries (short names) whose battery time moved past BOTH
    reconciliation bounds vs the prior committed record."""
    return [
        k
        for k in sorted(set(cur) & set(prev))
        if abs(cur[k] - prev[k]) > SOLO_RECONCILE_ABS_SEC
        and abs(cur[k] - prev[k]) > SOLO_RECONCILE_REL * prev[k]
    ]


def main() -> None:
    assert not set(BARE_OPS) & set(registry.names()), (
        "BARE_OPS keys collide with registry names: "
        f"{set(BARE_OPS) & set(registry.names())}"
    )
    if len(sys.argv) >= 3 and sys.argv[1] == "--cohort":
        _run_cohort(sys.argv[2])
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--solo":
        _run_solo(sys.argv[2])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    all_names = _bench_names()
    cohorts = [c for c in COHORT_ORDER if any(_cohort_of(n) == c for n in all_names)]
    assert {_cohort_of(n) for n in all_names} <= set(COHORT_ORDER)

    timings: dict[str, float] = {}
    failed_cohorts: list[str] = []
    here = os.path.dirname(os.path.abspath(__file__))

    # Prior record (read BEFORE overwriting): enables the mechanical
    # like-for-like drift block below (VERDICT r6 #6).
    prev_queries: dict[str, float] = {}
    try:
        with open(os.path.join(here, "BENCH_FULL.json")) as f:
            prev_queries = json.load(f).get("queries", {})
    except Exception:  # noqa: BLE001 - first run / malformed prior record
        pass
    # The last COMMITTED record (git HEAD), distinct from whatever an
    # intra-session bench run left on disk: the round-over-round
    # comparison must be vs the prior ROUND (VERDICT r8 #3 — BENCH_r08's
    # prev_common compared against an intra-session battery and the
    # r7-vs-r8 cross-round signal existed only in prose).
    committed_queries: dict[str, float] = {}
    try:
        proc = subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"],
            capture_output=True, text=True, cwd=here,
        )
        if proc.returncode == 0:
            committed_queries = json.loads(proc.stdout).get("queries", {})
    except Exception:  # noqa: BLE001 - not a git checkout
        pass

    for cohort in cohorts:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cohort", cohort],
            capture_output=True,
            text=True,
            cwd=here,
        )
        sys.stderr.write(proc.stderr)
        result_lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("COHORT_RESULT ")
        ]
        if proc.returncode != 0 or not result_lines:
            # Recorded in the emitted JSON too (ADVICE r6): a silent
            # stderr-only drop makes round totals incomparable.
            print(f"# cohort {cohort} FAILED rc={proc.returncode}", file=sys.stderr)
            sys.stderr.write(proc.stdout[-2000:])
            failed_cohorts.append(cohort)
            continue
        timings.update(json.loads(result_lines[-1][len("COHORT_RESULT "):]))

    total = round(sum(timings.values()), 3)
    short = {
        "q1_agg_by_type": "q1",
        "q2_town_month_rollup": "q2",
        "q3_yoy_window": "q3",
        "q4_top_nations_percentiles": "q4",
        "q4_approx_sketch": "q4a",
    }
    # Full per-entry record -> committed file (survives any stdout
    # tail window); compact line -> stdout last.
    cur_queries = {short.get(k, k): v for k, v in timings.items()}
    # Like-for-like drift vs the prior round's committed record over
    # shared entries (stable fresh-JVM cohort methodology from r6 on):
    # drift detection is mechanical, not a judge-side reconstruction.
    def _common_block(base: dict[str, float]) -> dict:
        ks = sorted(set(cur_queries) & set(base))
        return {
            "n_common": len(ks),
            "prev_total": round(sum(base[k] for k in ks), 3),
            "cur_total": round(sum(cur_queries[k] for k in ks), 3),
            "deltas": {k: round(cur_queries[k] - base[k], 3) for k in ks},
        }

    prev_common = _common_block(prev_queries)  # vs last on-disk record
    # vs last COMMITTED round's record — the judge-facing cross-round
    # comparison (an ambient-elevated session shows here as a uniform
    # battery delta while solo_baseline below stays stable).
    prev_round_common = _common_block(committed_queries)
    # Mechanical solo reconciliation (VERDICT r7 #2): any entry whose
    # battery delta exceeds BOTH ±30% and 0.5 s absolute gets an
    # automatic fresh-JVM min-of-3 solo run recorded in the artifact —
    # the r7 wrap solo-reconciled only hand-flagged entries, and the
    # judge had to chase a +95% in-battery swing that a solo run
    # resolved as cohort variance in one command. A solo number near
    # the prior round's means battery variance (cohort-composition
    # contamination, CLAUDE.md); a solo number near the new battery
    # number means a real plan change to root-cause.
    long_name = {v: k for k, v in short.items()}

    def _solo(entry: str) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--solo", entry],
            capture_output=True,
            text=True,
            cwd=here,
        )
        try:
            return json.loads(proc.stdout.splitlines()[-1])
        except Exception:  # noqa: BLE001 - record, don't mask the bench
            return {"solo_error": f"rc={proc.returncode}"}

    # Solo baseline (VERDICT r8 #3): fresh-JVM min-of-3 for the 10
    # heaviest entries of THIS battery, every run — the stable
    # cross-round per-entry signal that battery-cohort and
    # session-ambient variance cannot touch. Skippable only for local
    # iteration (the committed artifact must carry it).
    solo_baseline: dict[str, dict] = {}
    if not os.environ.get("SPARK_GRAFT_SKIP_SOLO"):
        heavies = sorted(cur_queries, key=lambda k: -cur_queries[k])[:10]
        for k in heavies:
            rec = {"cur_battery": cur_queries[k], **_solo(long_name.get(k, k))}
            if k in committed_queries:
                rec["prev_round_battery"] = committed_queries[k]
            solo_baseline[k] = rec
            print(f"# solo-baseline {k}: {rec}", file=sys.stderr)

    # Drift reconciliation now flags vs the last COMMITTED round (the
    # cross-round signal), not the intra-session disk record; entries
    # already solo'd in the baseline block are not re-run.
    drift_base = committed_queries or prev_queries
    flagged = [
        k for k in _drift_flagged(drift_base, cur_queries) if k not in solo_baseline
    ]
    solo_reconciled: dict[str, dict] = {}
    for k in flagged:
        rec = {
            "prev_battery": drift_base[k],
            "cur_battery": cur_queries[k],
            **_solo(long_name.get(k, k)),
        }
        solo_reconciled[k] = rec
        print(f"# solo-reconciled {k}: {rec}", file=sys.stderr)
    # Cohort composition signature (VERDICT r7 #2): composition
    # changes explain most in-battery drift (battery-size
    # contamination works in both directions, CLAUDE.md r7) — make
    # them visible in the artifact, not just in prose.
    import hashlib

    cohort_lists = {
        c: sorted(n for n in timings if _cohort_of(n) == c) for c in cohorts
    }
    cohort_sig = {
        c: hashlib.md5("\n".join(ns).encode()).hexdigest()[:12]
        for c, ns in cohort_lists.items()
    }
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": cur_queries,
        "sf": sf,
        "n_entries": len(timings),
        "failed_cohorts": failed_cohorts,
        "prev_common": prev_common,
        "prev_round_common": prev_round_common,
        "solo_baseline": solo_baseline,
        "solo_reconciled": solo_reconciled,
        "cohorts": cohort_lists,
        "cohort_sig": cohort_sig,
        "isolation": "fresh JVM per cohort (min-of-2 warmed runs per entry)",
    }
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    headline_keys = {short.get(k, k): v for k, v in timings.items() if k in short}
    heaviest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if k not in short),
            key=lambda kv: -kv[1],
        )[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {**headline_keys, **heaviest},
                "sf": sf,
                "n_entries": len(timings),
                "failed_cohorts": failed_cohorts,
                "prev_common_delta": round(
                    prev_common["cur_total"] - prev_common["prev_total"], 3
                ),
                "prev_round_common_delta": round(
                    prev_round_common["cur_total"]
                    - prev_round_common["prev_total"],
                    3,
                ),
                "full_record": "BENCH_FULL.json",
            }
        )
    )
    if failed_cohorts:
        sys.exit(1)


if __name__ == "__main__":
    main()
