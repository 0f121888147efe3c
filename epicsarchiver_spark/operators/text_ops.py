"""Text-analysis operators over the ``documents`` table — token counting,
quality scoring, language-ID, fingerprinting. Thin DataFrame wrappers over
the column functions in functions/text.py; everything JVM-side."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epicsarchiver_spark.functions import text as T


def text_stats(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token/char statistics + fingerprint."""
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars_actual"),
        T.token_count(F.col(text)).alias("n_tokens"),
        F.round(T.mean_token_len(F.col(text)), 6).alias("mean_token_len"),
        T.fingerprint64(F.col(text)).alias("fingerprint"),
    )


def quality_scores(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality heuristics (length / punctuation / stopwords)."""
    return docs.select(
        F.col(id_col),
        F.round(T.punct_ratio(F.col(text)), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(F.col(text)), 6).alias("stopword_ratio"),
        F.round(T.quality_score(F.col(text)), 6).alias("quality"),
    )


def langid_table(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc predicted language via the stopword-hits heuristic."""
    return docs.select(F.col(id_col), T.langid(F.col(text)).alias("lang_pred"))


def langid_eval(docs: DataFrame, text: str = "text", label: str = "lang") -> DataFrame:
    """Confusion counts of predicted vs labeled language."""
    return (
        docs.select(F.col(label).alias("lang_true"), T.langid(F.col(text)).alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_true", "lang_pred")
    )
