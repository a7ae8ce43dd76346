#!/usr/bin/env python
"""One-off probe (r10): find entries whose expensive stage serializes
behind AQE's byte-based partition coalescing — the pathology fixed on
j_fuzzy_name_match (a ~MB-sized exchange feeding a fan-out-expensive
stage gets coalesced to a handful of tasks; 16.6 -> 2.2 s at the 4x
closed-names scale once spread).

Method: for each heavy bench entry, warmed min-of-2 noop-sink runs in
ONE JVM with spark.sql.adaptive.coalescePartitions.enabled toggled
true -> false -> true (the second 'true' guards against warmup drift
being read as a delta). A large true/false ratio marks a candidate
for an in-plan explicit-parallelism repartition fix; the conf itself
is NOT a fix (the driver runs a bare session with AQE defaults).

Usage: python scripts/aqe_fanout_probe.py [sf_dir] [entry,entry,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "pipeline_corpus_build_cc",
    "pipeline_corpus_build_decontam",
    "pipeline_corpus_build",
    "pipeline_multimodal_corpus_build",
    "dedup_cluster_size_hist",
    "dedup_minhash_lsh_mid",
    "dedup_semantic",
    "dedup_drop_witness",
    "dedup_incremental",
    "pipeline_quality_dup_calibration",
    "dedup_minhash_lsh",
    "sim_ivfpq_adc_topk",
    "pipeline_incremental_admission",
    "sim_sparse_cosine_pairs",
    "multimodal_video_scenes",
    "graph_pagerank",
    "text_bm25_topk",
    "dedup_image_phash",
    "dedup_video_keyframes",
    "ml_kmeans_int",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_ENTRIES
    )
    from sql_engine_triangle_spark.queries import registry
    from sql_engine_triangle_spark.session import get_spark

    spark = get_spark(app_name="aqe-fanout-probe")

    def timed(fn, name):
        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm
        ts = []
        for _ in range(2):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        return min(ts)

    print(f"# sf_dir={sf_dir}")
    print(f"{'entry':40s} {'on':>7s} {'off':>7s} {'on2':>7s} {'ratio':>6s}")
    for name in names:
        if name not in registry.names():
            continue
        fn = registry.get(name).fn
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        t_on = timed(fn, name)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        t_off = timed(fn, name)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        t_on2 = timed(fn, name)
        ratio = min(t_on, t_on2) / t_off if t_off > 0 else float("nan")
        flag = "  <== candidate" if ratio > 1.4 else ""
        print(
            f"{name:40s} {t_on:7.2f} {t_off:7.2f} {t_on2:7.2f} "
            f"{ratio:6.2f}{flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
