"""Corpus-derived greedy subword tokenizer (wordpiece/BPE-class).

Every "token" metric in the pipeline tier (budget, packing, Lorenz,
repeat-factors) was whitespace-token based — the biggest semantic gap
between those operators and their production counterparts, which
meter BPE/wordpiece tokens (VERDICT r6 gap #2). This module closes it
with a tokenizer that is

- **corpus-derived**: the subword vocabulary is trained from the data
  itself (top-K most frequent word substrings, length 2..6, weighted
  by word frequency) — no external vocab file, so the whole operator
  is deterministic and DuckDB-oracle-able;
- **greedy longest-match**: the standard wordpiece inference rule —
  at each position take the longest vocab entry matching there, else
  emit the single character (UNK-char) and advance one;
- **pure Spark SQL**: vocab training is two aggregations + a k-heap
  top-K; the greedy walk is an integer fold (``aggregate`` over the
  character positions with a (pos, count) accumulator) evaluated once
  per DISTINCT word, never per occurrence — the per-doc counts then
  come from an ordinary join + sum.

Scale design (100 TB): the expensive part — substring explosion and
the greedy fold — runs over the DISTINCT-word frame, which grows
sublinearly with the corpus (vocabulary growth), not over token
occurrences. That frame feeds two consumers twice (vocab training +
best-match, and the final walk), so it is localCheckpointed (the
dedup_minhash_lsh_mid shingle-pass pattern; on a cluster the same
role is a persisted shuffle). The per-word token-count table is
joined back to token occurrences — broadcast here (bounded distinct
words); with an unbounded noisy vocabulary it becomes a shuffle join
on ``word`` where AQE's skew split handles the stopword hot keys.

The DuckDB oracle twin is generated from the SAME constants
(``BPE_VOCAB_K``, ``BPE_SUB_LENS``) so the two engines cannot drift;
its greedy walk is a recursive CTE over the per-(word, position)
best-match table, with the non-recursive CTEs MATERIALIZED (the
CTE-inlining explosion trap, CLAUDE.md).

Reference scope note: the reference lab has no tokenizer surface —
this is a beyond-reference component of the training-data pipeline
tier (SURVEY.md "training-data pipeline" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Vocab size and candidate subword lengths. 64 slots over the fixture
# corpus (31 distinct words, max length 8) yields the realistic regime:
# high-frequency short words tokenize whole, longer/rarer words split
# into 2+ pieces, and some positions fall through to single-char
# tokens. Shared with the generated oracle below.
BPE_VOCAB_K = 64
BPE_SUB_LENS = (2, 3, 4, 5, 6)


def bpe_word_token_counts(docs: DataFrame) -> DataFrame:
    """(word, wl, freq, n_bpe) for every distinct whitespace word in
    ``docs.text``: ``n_bpe`` is the greedy longest-match subword token
    count of the word under the corpus-trained vocab."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
        ).filter(F.col("word") != "")
    )
    # Distinct words with occurrence frequency — the training weight.
    # Two downstream consumers (candidate generation and the final
    # walk join): checkpoint so the corpus-wide word count runs once.
    dw = (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("wl", F.length("word").cast("int"))
        .localCheckpoint(eager=False)
    )
    # Every (word, start, len) substring candidate. Bounded: distinct
    # words x word-length x |BPE_SUB_LENS|. Feeds vocab training AND
    # best-match — checkpoint so the explode runs once.
    cand = (
        dw.select(
            "word",
            "freq",
            "wl",
            F.explode(F.sequence(F.lit(1), F.col("wl"))).alias("s"),
        )
        .select(
            "word",
            "freq",
            "wl",
            "s",
            F.explode(F.array(*[F.lit(l) for l in BPE_SUB_LENS])).alias("l"),
        )
        .filter(F.col("s") + F.col("l") - F.lit(1) <= F.col("wl"))
        .withColumn("tok", F.expr("substring(word, s, l)"))
        .localCheckpoint(eager=False)
    )
    # Vocab = top-K substrings by frequency-weighted occurrence count,
    # deterministic tie-break on the token text. k-heap top-K
    # (TakeOrderedAndProject), never a global sort of the candidates.
    vocab = (
        cand.groupBy("tok")
        .agg(F.sum("freq").alias("occ"))
        .orderBy(F.desc("occ"), "tok")
        .limit(BPE_VOCAB_K)
        .select("tok")
    )
    # Longest vocab match per (word, start) — the greedy rule's lookup
    # table, built with one broadcast join instead of per-step probes.
    best = (
        cand.join(F.broadcast(vocab), "tok")
        .groupBy("word", "s")
        .agg(F.max("l").cast("int").alias("bl"))
    )
    bm = best.groupBy("word").agg(
        F.map_from_entries(F.collect_list(F.struct("s", "bl"))).alias("m")
    )
    # Greedy walk as an integer fold over character positions: the
    # accumulator carries (next position, token count); a position is
    # consumed only when the cursor reaches it, advancing by the best
    # match length (default 1 = single-char/UNK token). Interpreted
    # HOF (CLAUDE.md) — acceptable because it runs once per DISTINCT
    # word, not per occurrence. The map lookup is try_element_at
    # (ADVICE r7): positions with no vocab match are ABSENT from `m`
    # (the UNK fall-through), and while this Spark 4 build returns
    # NULL for a missing ANSI map key, earlier lines raise
    # MAP_KEY_DOES_NOT_EXIST — try_ makes NULL-on-missing explicit
    # and version-robust (same class as the tolerant-ingest fix).
    fold = F.expr(
        """
        aggregate(
          sequence(1, wl),
          named_struct('pos', cast(1 as int), 'cnt', cast(0 as int)),
          (st, i) -> if(i = st.pos,
                        named_struct(
                          'pos', cast(st.pos + coalesce(try_element_at(m, st.pos), 1)
                                      as int),
                          'cnt', cast(st.cnt + 1 as int)),
                        st),
          st -> cast(st.cnt as bigint))
        """
    )
    return dw.join(bm, "word", "left").select(
        "word", "wl", "freq", fold.alias("n_bpe")
    )


def bpe_doc_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): per-document real-tokenizer
    token counts — the metric a training pipeline actually meters."""
    wtok = bpe_word_token_counts(docs)
    doc_tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        doc_tok.join(F.broadcast(wtok.select("word", "n_bpe")), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
        )
    )


def _sub_lens_sql() -> str:
    return "[" + ", ".join(str(l) for l in BPE_SUB_LENS) + "]"


# DuckDB oracle CTE block defining `wtok(word, n_bpe)` — compose as
# f"WITH RECURSIVE {BPE_WTOK_CTES}, ...". Generated from the same
# K / length constants as the Spark operator so the twins cannot
# drift. Non-recursive CTEs are MATERIALIZED: `steps` references
# `best` (which chains to cand/vocab) every recursion round, and
# DuckDB's default inlining would re-expand that subtree per round
# (CLAUDE.md r6 trap).
BPE_WTOK_CTES = (
    r"""
wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY 1
),
dw AS MATERIALIZED (
  SELECT word, freq, CAST(length(word) AS INTEGER) AS wl FROM wf
),
cand AS MATERIALIZED (
  SELECT dw.word, dw.freq, dw.wl, ss.s, ll.l,
         substring(dw.word, ss.s, ll.l) AS tok
  FROM dw,
       LATERAL (SELECT unnest(range(1, dw.wl + 1)) AS s) ss,
       (SELECT unnest("""
    + _sub_lens_sql()
    + r""") AS l) ll
  WHERE ss.s + ll.l - 1 <= dw.wl
),
vocab AS MATERIALIZED (
  SELECT tok
  FROM (SELECT tok, sum(freq) AS occ FROM cand GROUP BY 1)
  ORDER BY occ DESC, tok
  LIMIT """
    + str(BPE_VOCAB_K)
    + r"""
),
best AS MATERIALIZED (
  SELECT word, s, CAST(max(l) AS INTEGER) AS bl
  FROM cand
  WHERE tok IN (SELECT tok FROM vocab)
  GROUP BY 1, 2
),
steps AS (
  SELECT word, 1 AS pos FROM dw
  UNION ALL
  SELECT st.word, st.pos + COALESCE(b.bl, 1) AS pos
  FROM steps st
  JOIN dw ON dw.word = st.word
  LEFT JOIN best b ON b.word = st.word AND b.s = st.pos
  WHERE st.pos <= dw.wl
),
wtok AS MATERIALIZED (
  SELECT s.word, CAST(count(*) AS BIGINT) AS n_bpe
  FROM steps s JOIN dw ON dw.word = s.word
  WHERE s.pos <= dw.wl
  GROUP BY 1
)"""
)

# ---------------------------------------------------------------------------
# TRUE iterative pair-merge BPE training (VERDICT r7 #5)
# ---------------------------------------------------------------------------
# The wordpiece trainer above ranks substrings by frequency in ONE
# pass — real inference rule (greedy longest-match), simplified
# training rule. Sennrich-et-al BPE trains ITERATIVELY: start from
# characters, each round count adjacent token pairs (weighted by word
# frequency), merge the most frequent pair left-to-right in every
# word, repeat. The two genuinely differ on this corpus (measured at
# sf0.01: true BPE at 40 merges yields 69,935 corpus tokens vs the
# K=64 wordpiece's 76,538 — 8.6% fewer; 8 of 31 words tokenize
# differently; 30 of the 40 merge tokens overlap the wordpiece
# vocab), so the iterative trainer ships as its own operator instead
# of a header note.

BPE_MERGE_ROUNDS = 12


def bpe_train_merges(docs: DataFrame, rounds: int = BPE_MERGE_ROUNDS) -> DataFrame:
    """Train ``rounds`` BPE merges on the corpus; returns the merge
    table (merge_round, pa, pb, merged, occ) — the trained artifact a
    tokenizer ships.

    Distributed shape (the PageRank/k-means iterative mold): the
    per-round pair count is ONE map-side-combined aggregation over
    the DISTINCT-word frame (sublinear in the corpus); the best pair
    is a 1-row k-heap collect (bounded, like the k-means centroid
    fetch); the merge applies as a per-word left-to-right fold
    (interpreted HOF — per DISTINCT word, never per occurrence); the
    word frame is localCheckpointed each round (the F.broadcast-
    lineage trap, CLAUDE.md). Merge-round count is the standard
    fixed hyperparameter (vocab size), not data-dependent.

    Left-to-right non-overlap semantics: the fold merges when the
    LAST UNCONSUMED token equals pa and the current equals pb. For
    pa == pb runs ("aaaa" under (a,a) -> [aa, aa]) this matches the
    canonical i+=2 walk because a just-merged element's string is
    pa||pb != pa, so it cannot absorb the next token — pinned against
    a pure-Python reference in tests/test_tokenize.py.

    The DuckDB oracle (``bpe_train_oracle``) computes the same rounds
    SET-BASED: merge positions are candidates filtered by the
    run-parity rule (merge at i iff candidate(i) and, when pa == pb,
    (i - run_start) is even — overlapping candidates exist ONLY for
    pa == pb), which is the closed form of the sequential walk.
    Ties break (occ DESC, pa, pb) identically on both engines."""
    spark = docs.sparkSession
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    # Eager per-round checkpoints are deliberate: an r12 A/B of the
    # lazy form (fold materializing inside the argmax TakeOrdered
    # job, halving driver jobs) measured CONSISTENTLY ~1 s slower at
    # sf0.1 (5.8-6.3 vs 4.9-5.1 interleaved min-of-3) — the fused
    # fold+explode+agg+topk stage schedules worse than two small
    # jobs. Kept eager; the r12 change is only deferring each
    # round's merge application to the TOP of the next round, which
    # drops the final round's never-consumed fold checkpoint (one
    # whole job of interpreted-HOF work on the widest frame).
    seqs = (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .select("word", "freq", F.split("word", "").alias("toks"))
        .localCheckpoint()
    )
    records: list[tuple[int, str, str, str, int]] = []
    pending: tuple[str, str] | None = None
    for r in range(1, rounds + 1):
        if pending is not None:
            pa_l, pb_l, m_l = (
                F.lit(pending[0]),
                F.lit(pending[1]),
                F.lit(pending[0] + pending[1]),
            )
            fold = F.aggregate(
                F.col("toks"),
                F.array().cast("array<string>"),
                lambda acc, t: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == pa_l)
                    & (t == pb_l),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(m_l)
                    ),
                ).otherwise(F.concat(acc, F.array(t))),
            )
            seqs = seqs.select(
                "word", "freq", fold.alias("toks")
            ).localCheckpoint()
        pairs = (
            seqs.filter(F.size("toks") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> struct(toks[i-1] AS pa, toks[i] AS pb))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
            .agg(F.sum("freq").alias("occ"))
        )
        best = pairs.orderBy(F.desc("occ"), "pa", "pb").limit(1).collect()
        if not best:
            break
        pa, pb, occ = best[0]["pa"], best[0]["pb"], int(best[0]["occ"])
        records.append((r, pa, pb, pa + pb, occ))
        pending = (pa, pb)
    return spark.createDataFrame(
        records, "merge_round int, pa string, pb string, merged string, occ long"
    )


def bpe_train_oracle(rounds: int = BPE_MERGE_ROUNDS) -> str:
    """GENERATED DuckDB twin of ``bpe_train_merges`` — one CTE block
    per round from a single template (twins cannot drift), all
    MATERIALIZED (each round is referenced by the next — default
    inlining would expand the chain exponentially, CLAUDE.md r6)."""
    parts = [
        r"""wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY 1
),
s0 AS MATERIALIZED (
  SELECT word, freq, string_split(word, '') AS toks FROM wf
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""pos{r} AS MATERIALIZED (
  SELECT word, freq, toks, len(toks) AS n, ii.i AS i, toks[ii.i] AS t
  FROM s{p}, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) ii
),
pc{r} AS MATERIALIZED (
  SELECT t AS pa, toks[i + 1] AS pb, CAST(sum(freq) AS BIGINT) AS occ
  FROM pos{r} WHERE i < n GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT pa, pb, occ FROM pc{r} ORDER BY occ DESC, pa, pb LIMIT 1
),
g{r} AS MATERIALIZED (
  SELECT word, freq, i, t, pa, pb,
         (t = pa AND i < n AND toks[i + 1] = pb)
         AND (pa <> pb OR (i - run_start) % 2 = 0) AS m
  FROM (
    SELECT q.*, b.pa, b.pb,
           coalesce(max(CASE WHEN q.t <> b.pa THEN q.i END)
                    OVER (PARTITION BY q.word ORDER BY q.i), 0) + 1 AS run_start
    FROM pos{r} q, b{r} b
  )
),
s{r} AS MATERIALIZED (
  SELECT word, max(freq) AS freq,
         list(CASE WHEN m THEN pa || pb ELSE t END ORDER BY i) AS toks
  FROM (SELECT *, lag(m, 1, false) OVER (PARTITION BY word ORDER BY i) AS prev_m
        FROM g{r})
  WHERE NOT prev_m
  GROUP BY word
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_round, pa, pb, pa || pb AS merged, occ FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM (\n{unions}\n) ORDER BY merge_round\n"
    )


# Doc-level extension: `doc_bpe(doc_id, n_words, n_bpe_tokens)`.
BPE_DOC_CTES = r"""
doc_tok AS MATERIALIZED (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
  FROM documents
),
doc_bpe AS MATERIALIZED (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(w.n_bpe) AS BIGINT) AS n_bpe_tokens
  FROM doc_tok t JOIN wtok w USING (word)
  WHERE t.word <> ''
  GROUP BY 1
)"""
