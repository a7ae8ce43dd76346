"""Text analysis column macros (training-data pipeline surface).

Everything here is a Column→Column macro over built-in JVM functions
(split/filter/transform/aggregate/regexp/xxhash64) so it runs inside
whole-stage codegen — no Python in the hot path. The pandas-UDF
escape hatch is reserved for genuinely non-expressible ops
(operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword profiles for the n-gram/stopword language-ID heuristic.
# Tiny on purpose: the operator contract is "deterministic heuristic
# language guess", not a trained model.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "las", "es", "una", "que"),
}

DEFAULT_STOPWORDS: tuple[str, ...] = LANG_STOPWORDS["en"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single symbol.
# Kept RE2/Java-regex compatible (no lookarounds) so the DuckDB
# oracle can run the identical pattern.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor
    whitespace."""
    punct_chars = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return punct_chars / F.greatest(F.length(text), F.lit(1))


def stopword_ratio_from(toks: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    """stopword_ratio over a pre-computed token array column. Prefer
    this in multi-metric projections: every Column macro re-evaluates
    its whole expression subtree, so N metrics over `tokens(text)`
    re-split the text N times — materializing `toks` once in a prior
    select lets all metrics share it (measured 1.5× on
    text_quality_scores at sf0.1)."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    return stopword_ratio_from(tokens(text), stopwords)


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic: penalize punctuation-heavy
    and very short documents. score = (1 - punct_ratio) *
    min(1, n_tokens/50)."""
    return (F.lit(1.0) - punct_ratio(text)) * F.least(
        F.lit(1.0), token_count(text) / F.lit(50.0)
    )


def avg_token_len_from(toks: Column) -> Column:
    """avg_token_len over a pre-computed token array (see
    stopword_ratio_from on why)."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def avg_token_len(text: Column) -> Column:
    return avg_token_len_from(tokens(text))


def lang_id_from(toks: Column) -> Column:
    """Stopword-profile language ID over a pre-computed token array:
    count profile hits per language, pick the max (ties broken by
    fixed profile order), 'und' when no profile hits at all."""

    def hits_for(sw: tuple[str, ...]) -> Column:
        # NB: must be a 1-arg lambda — PySpark treats 2-arg lambdas
        # as (element, index) in higher-order functions.
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    hit_cols: dict[str, Column] = {
        lang: hits_for(sw) for lang, sw in LANG_STOPWORDS.items()
    }
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[hit_cols[lg] for lg in langs])
    expr: Column | None = None
    for lg in langs:
        cond = hit_cols[lg] == best
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return F.when(best <= 0, "und").otherwise(expr)


def lang_id(text: Column) -> Column:
    return lang_id_from(tokens(text))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: trim, lower, collapse
    whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (stable across
    engines — oracle-checkable)."""
    return F.md5(normalized_text(text))


def rolling_hash(text: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash (Rabin-Karp) over the normalized text's
    characters — the classic document-fingerprint primitive. pmod at
    every step keeps the accumulator < mod so bigint arithmetic can't
    overflow under ANSI mode."""
    chars = F.split(normalized_text(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: F.pmod(acc * base + F.coalesce(F.ascii(c), F.lit(0)), F.lit(mod)),
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (dedup
    primitive). For documents shorter than n tokens, falls back to
    one shingle of all tokens.

    NOTE: array-expression form — fine for a single projection, but
    the lambda inlines the token-split per element (interpreted HOF
    evaluation). Any operator touching every shingle at scale should
    use `shingle_rows` (posexplode + window leads, fully codegen)
    instead — measured 9× faster on the sf0.1 fixture."""
    toks = tokens(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams)
