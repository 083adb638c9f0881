"""Text-analysis operators — parameterized library API."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_stats", "quality_scores", "quality_flag"]

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in")
BPE_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish token counts and chars-per-token density."""
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
    n_chars = F.length(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("bigint").alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        (n_chars.cast("double") / F.size(ws)).alias("chars_per_token"),
    )


def quality_flag(
    text_col: str,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_words: int = 20,
    max_words: int = 1000,
    min_stopword_ratio: float = 0.01,
):
    """``passes_quality`` as a single inline Column expression, so a
    composed pipeline can gate on quality INSIDE its own document scan
    instead of joining against :func:`quality_scores`'s corpus-sized
    output (a corpus-corpus shuffle for data one projection derives).
    This is the single source of truth for the rule —
    :func:`quality_scores` builds its ``passes_quality`` column from
    this expression, so the two cannot drift (pinned by
    tests/test_operators.py)."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    stops = F.filter(words, lambda w: w.isin(*stopwords))
    n_words = F.size(words).cast("bigint")
    ratio = F.size(stops).cast("double") / F.size(words)
    return (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (ratio >= min_stopword_ratio)
    )


def quality_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_words: int = 20,
    max_words: int = 1000,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Gopher/C4-style heuristic quality gate: length bounds + stopword
    ratio, all JVM-side. The pass/fail column IS the
    :func:`quality_flag` expression (evaluated while the text column
    is still in scope), so the scored table and the inline gate can
    never disagree on the rule."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    stops = F.filter(words, lambda w: w.isin(*stopwords))
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("bigint").alias("n_words"),
        F.size(stops).cast("bigint").alias("n_stop"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        quality_flag(
            text_col,
            stopwords=stopwords,
            min_words=min_words,
            max_words=max_words,
            min_stopword_ratio=min_stopword_ratio,
        ).alias("passes_quality"),
    )
    ratio = F.col("n_stop").cast("double") / F.col("n_words")
    return scored.select(
        "doc_id",
        "n_words",
        "n_stop",
        "n_chars",
        ratio.alias("stopword_ratio"),
        "passes_quality",
    )
