"""Pure-Python reference pin for the corpus-derived greedy subword
tokenizer (operators/tokenize.py).

The registry sweep already hash-checks text_tokenize_bpe /
pipeline_token_budget_bpe against their GENERATED DuckDB twins — but
both engines share the tokenizer's *specification* through the same
constants, so a spec-level bug (e.g. an off-by-one in the greedy walk
that both CTE and fold reproduce) would pass the differential check.
This test re-implements vocab training + greedy longest-match in ~30
lines of plain Python directly from the written rule and pins the
Spark output against it word-for-word."""

from __future__ import annotations

from collections import Counter

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.operators import tokenize


def _reference_counts(texts: list[str]) -> dict[str, int]:
    """Independent implementation of the tokenizer spec: top-K
    frequency-weighted substrings (len in BPE_SUB_LENS), ties broken
    on token text; greedy longest-match walk, single-char fallback."""
    freq = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            freq[w] += 1
    occ = Counter()
    for w, f in freq.items():
        for s in range(len(w)):
            for l in tokenize.BPE_SUB_LENS:
                if s + l <= len(w):
                    occ[w[s : s + l]] += f
    vocab = {
        tok
        for tok, _ in sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[
            : tokenize.BPE_VOCAB_K
        ]
    }
    out = {}
    for w in freq:
        pos, cnt = 0, 0
        while pos < len(w):
            step = 1
            for l in sorted(tokenize.BPE_SUB_LENS, reverse=True):
                if w[pos : pos + l] in vocab:
                    step = l
                    break
            pos += step
            cnt += 1
        out[w] = cnt
    return out


def _run_on_texts(spark, texts: list[str]) -> dict[str, int]:
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["word"]: r["n_bpe"]
        for r in tokenize.bpe_word_token_counts(docs).collect()
    }


def test_bpe_edge_corpora_match_python_reference(spark):
    """Spec-compliance pins on crafted corpora: vocab tie-breaking
    (equal-occ substrings break on token text), UNK single-char
    fallback (characters no vocab entry covers), words shorter than
    the minimum subword length, repeated words (frequency weighting),
    and a word that tokenizes whole vs one forced to split."""
    corpora = [
        # ties everywhere: every substring occurs once
        ["abcdef"],
        # single-char words (below min subword length 2) -> 1 UNK each
        ["a b c a b"],
        # heavy repetition skews the vocab toward one word's substrings
        ["zzyzx zzyzx zzyzx qwmvt"],
        # mixed lengths incl. a long rare word forced to split
        ["the cat sat on the mat", "antidisestablishmentarianism the"],
        # many distinct words so BPE_VOCAB_K=64 actually truncates
        [" ".join(f"w{i}xy{i}" for i in range(40))],
    ]
    for texts in corpora:
        got = _run_on_texts(spark, texts)
        want = _reference_counts(texts)
        assert got == want, texts


def test_bpe_word_counts_match_python_reference(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["word"]: r["n_bpe"]
        for r in tokenize.bpe_word_token_counts(docs).collect()
    }
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _reference_counts(texts)
    assert got == want
    # The regime is realistic: some words tokenize whole, some split.
    assert any(v == 1 for v in got.values())
    assert any(v > 1 for v in got.values())


# ---------------------------------------------------------------------------
# True pair-merge BPE training (bpe_train_merges)
# ---------------------------------------------------------------------------


def _reference_merges(texts: list[str], rounds: int) -> list[tuple]:
    """Independent canonical BPE trainer: char start, per-round
    frequency-weighted adjacent-pair count, (occ DESC, pa, pb)
    tie-break, left-to-right non-overlapping i+=2 merge walk."""
    freq = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            freq[w] += 1
    seqs = {w: list(w) for w in freq}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, f in freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        top = max(pc.values())
        pa, pb = min(p for p, c in pc.items() if c == top)
        merges.append((r, pa, pb, pa + pb, top))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == pa and s[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def _train_on_texts(spark, texts: list[str], rounds: int) -> list[tuple]:
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r["merge_round"], r["pa"], r["pb"], r["merged"], r["occ"])
        for r in tokenize.bpe_train_merges(docs, rounds)
        .orderBy("merge_round")
        .collect()
    ]


def test_bpe_train_run_semantics_pa_equals_pb(spark):
    """The left-to-right non-overlap rule on pa == pb runs: 'aaaa'
    under merge (a,a) must become [aa, aa] (merge at 1 and 3, never
    the overlapping 2) — the one case where the Spark fold and the
    oracle's run-parity closed form could diverge from the canonical
    i+=2 walk. Crafted corpus forces (a,a) as round-1 best; round 2's
    best pair then reveals the post-merge sequences."""
    texts = ["aaaa aaaa aaa b"]
    got = _train_on_texts(spark, texts, 3)
    want = _reference_merges(texts, 3)
    assert got == want
    # round 1 is (a,a); the round-2 counts only make sense if 'aaaa'
    # became [aa,aa] (pair (aa,aa) x2) and 'aaa' became [aa,a].
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_bpe_train_matches_python_reference_on_fixture(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = _train_on_texts(spark, texts, tokenize.BPE_MERGE_ROUNDS)
    want = _reference_merges(texts, tokenize.BPE_MERGE_ROUNDS)
    assert got == want
    assert len(got) == tokenize.BPE_MERGE_ROUNDS
