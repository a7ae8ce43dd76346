"""Measured-scaling guard (VERDICT r7 #1 stretch): an accidental
quadratic in a flagship plan should FAIL A TEST, not wait for a judge
read of BENCH numbers.

Runs a small set of heavy entries on synthetic corpora at 1x and 10x
the sf0.1 row counts (fixtures.generate documents/embeddings —
distribution-calibrated against the driver testdata, dup-cluster
sizes O(1) in corpus size) and asserts the measured time exponent
log(t10/t1)/log(10) stays under a generous bound. The bound is loose
(1.6 vs the harness-measured steady-state exponents in SCALING.json)
because pytest shares the machine with the rest of the suite; the
precise per-entry numbers live in SCALING.json via
scripts/scale_stress.py. An entry regressing to quadratic measures
~2.0 and fails regardless of noise.

Corpora are cached in .scale_data/ (shared with the harness — same
deterministic generators, same layout)."""

from __future__ import annotations

import os
import time

import pytest

from sql_engine_triangle_spark.queries import registry

DATA_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".scale_data")
BASE_ROWS = {"documents": 5000, "embeddings": 2000}
EXPONENT_BOUND = 1.6

# Entries chosen for coverage of the three heavy mechanisms (LSH pair
# generation, tokenizer distinct-word frame, capstone composition)
# at pytest-tolerable 10x cost.
GUARDED = ["dedup_minhash_lsh_mid", "text_tokenize_bpe", "pipeline_corpus_build"]


def _ensure_corpus(spark, scale: int) -> str:
    from sql_engine_triangle_spark.fixtures import generate as G

    d = os.path.join(DATA_ROOT, f"x{scale}")
    for t, gen in (("documents", G.documents), ("embeddings", G.embeddings)):
        p = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            gen(spark, BASE_ROWS[t] * scale).repartition(32).write.mode(
                "overwrite"
            ).parquet(p)
    return d


def _time_entry(spark, name: str, sf_dir: str) -> float:
    fn = registry.get(name).fn

    def run() -> None:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warm
    ts = []
    for _ in range(2):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    return min(ts)


@pytest.mark.scale
@pytest.mark.parametrize("name", GUARDED)
def test_measured_scaling_exponent(spark, name):
    import math

    d1 = _ensure_corpus(spark, 1)
    d10 = _ensure_corpus(spark, 10)
    t1 = _time_entry(spark, name, d1)
    t10 = _time_entry(spark, name, d10)
    exponent = math.log(max(t10, 1e-3) / max(t1, 1e-3)) / math.log(10)
    assert exponent < EXPONENT_BOUND, (
        f"{name}: measured scaling exponent {exponent:.2f} "
        f"(t1={t1:.2f}s, t10={t10:.2f}s) exceeds {EXPONENT_BOUND} — "
        "a plan that was linear-ish now grows superlinearly; diff the "
        "entry's plan against PLANS.md and check SCALING.json history"
    )
