"""Text-analysis column functions for the training-data pipeline surface.

All JVM-side builtins (split/regexp/aggregate) — no Python in the hot path.
Semantics are deliberately simple and *exactly* reproducible in ANSI SQL so
each derived operator carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Scoring = number of distinct stopwords present, ties broken by
# language name; deliberately deterministic + SQL-expressible.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "es": ("el", "la", "que", "los", "una"),
    "fr": ("le", "les", "des", "est", "une"),
    "zh": ("de5", "shi4", "bu4", "le5", "wo3"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed (split on /\\s+/)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer, lookahead-free so the SAME pattern runs on
# Java regex (Spark) and RE2 (DuckDB oracle): contraction suffixes, then
# space-prefixed letter/digit/punct runs, then whitespace runs.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer segments — the unit an
    actual BPE vocab would split further, and the standard cheap proxy for
    LLM token budgeting. Pure JVM regexp, codegen-friendly."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def word_shingles(text: Column, k: int) -> Column:
    """k-word shingles as joined strings — the unit for MinHash / Jaccard.
    Texts with fewer than k tokens yield an empty array (sequence(1,0)
    would otherwise descend)."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    return F.when(
        n >= k, F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-grams of the raw text; shorter texts → empty array."""
    length = F.length(text)
    idx = F.sequence(F.lit(1), length - F.lit(n - 1))
    return F.when(
        length >= n, F.transform(idx, lambda i: F.substring(text, i, n))
    ).otherwise(F.array().cast("array<string>"))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    """Fraction of tokens that are stopwords (0 for empty docs)."""
    toks = tokens(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite doc-quality heuristic in [0,1]:
    0.4·len-score + 0.3·(1-punct_ratio) + 0.3·stopword presence.
    A stand-in for fastText-style quality classifiers; deterministic and
    oracle-checkable."""
    n = F.length(text).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0)))
        + F.lit(0.3) * F.least(stopword_ratio(text) * 10, F.lit(1.0))
    )


def langid_scores(text: Column) -> Column:
    """Map of language → distinct-stopword hits."""
    toks = F.transform(tokens(text), F.lower)
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    return F.array(*entries)


def langid(text: Column) -> Column:
    """Argmax language by stopword hits; ties → lexicographically first
    language; zero hits → 'und' (undetermined)."""
    scores = langid_scores(text)
    best = F.array_max(
        F.transform(scores, lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")))
    )
    # array_max on struct orders by (hits asc, lang asc) — lang desc would
    # win ties, so invert: take max hits first, then min lang among maxes.
    max_hits = F.array_max(F.transform(scores, lambda s: s["hits"]))
    winners = F.filter(scores, lambda s: s["hits"] == max_hits)
    first = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return F.when(max_hits > 0, first).otherwise(F.lit("und"))


def fingerprint64(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint from the text's md5 —
    content-addressable id for exact dedup; identical in DuckDB as
    a hex-slice of md5."""
    return F.lower(F.substring(F.md5(text), 1, 16))
