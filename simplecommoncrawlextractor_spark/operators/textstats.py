"""Text-analysis operators over ``documents``: token counting, quality
stats, language-ID, fingerprinting — the training-data pipeline additions
(SURVEY flags these as beyond-reference functionality)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, lang_id, quality_stats, token_count


def token_count_hist(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Histogram of whitespace token counts."""
    d = docs.select(token_count(text_col).alias("n_tokens"))
    return (
        d.groupBy("n_tokens")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_tokens")
    )


def quality_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc integer quality components (hash-stable across engines)."""
    stats = quality_stats(text_col)
    return docs.select(
        F.col(id_col),
        stats["n_chars"].alias("n_chars"),
        stats["n_tokens"].alias("n_tokens"),
        stats["mean_tok_len_x1000"].alias("mean_tok_len_x1000"),
        stats["n_punct"].alias("n_punct"),
        stats["n_stopwords"].alias("n_stopwords"),
    ).orderBy(id_col)


def lang_id_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc heuristic language-ID."""
    return docs.select(F.col(id_col), lang_id(text_col).alias("lang_pred")).orderBy(id_col)


def fingerprint_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc md5 content fingerprint (exact-dedup key)."""
    return docs.select(F.col(id_col), doc_fingerprint(text_col).alias("fp")).orderBy(id_col)
