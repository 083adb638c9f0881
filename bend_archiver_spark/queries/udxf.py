"""UDTF + UDAF surface queries (SURVEY §2 Table B "UDF/UDAF/UDTF
surface": the reference has none — config/config.go:48 is its only
user code — so this is the Spark-native capability upgrade).

Both queries carry exact DuckDB oracles: token semantics are pinned to
a cross-engine contract (single-space split, empties dropped), and the
UDAF computes in quantized int64 so no float accumulation order can
leak into the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t


@register(
    "udtf_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
           CAST(SUM(pos1 * len(tok)) AS BIGINT) AS pos_weight
    FROM (
      SELECT doc_id, tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS pos1
      FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS idx
        FROM documents
      ) raw
      WHERE tok <> ''
    ) u
    GROUP BY doc_id
    """,
    tags=("udtf", "text"),
)
def udtf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics computed through a Python UDTF
    consumed with SQL ``LATERAL`` — the position-weighted length sum
    proves the (token, pos) alignment, not just the counts. The oracle
    rebuilds positions with ROW_NUMBER over the pre-filter subscript
    order (1-based, matching the UDTF's pos+1)."""
    from ..functions import register_udtfs

    register_udtfs(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT tk.token) AS BIGINT) AS n_distinct,
               CAST(SUM((tk.pos + 1) * length(tk.token)) AS BIGINT)
                 AS pos_weight
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) tk
        GROUP BY d.doc_id
        """
    )


@register(
    "udaf_weighted_discount",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(qi * di) AS DOUBLE) / CAST(SUM(qi) AS DOUBLE)
             AS wavg_discount_micros
    FROM (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 1000) AS BIGINT) AS qi,
             CAST(ROUND(l_discount * 1000000) AS BIGINT) AS di
      FROM lineitem
    ) q
    GROUP BY l_returnflag
    """,
    tags=("udaf", "aggregate"),
)
def udaf_weighted_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average discount per return flag, computed by
    a pandas grouped-agg UDF (the UDAF surface) over micro-quantized
    int64 inputs — exact sums, one final float division, so the value
    hash-matches the SQL oracle under any partitioning."""
    from ..functions import weighted_avg_quantized

    li = (
        t(spark, sf_dir, "lineitem")
        .withColumn("qi", F.round(F.col("l_quantity") * 1000).cast("bigint"))
        .withColumn("di", F.round(F.col("l_discount") * 1e6).cast("bigint"))
    )
    return li.groupBy("l_returnflag").agg(
        weighted_avg_quantized("qi", "di").alias("wavg_discount_micros")
    )


@register(
    "grouped_map_minmax_norm",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN mx > mn
                THEN CAST(n_chars - mn AS DOUBLE) / (mx - mn)
                ELSE 0.0 END AS norm_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             MIN(n_chars) OVER (PARTITION BY lang) AS mn,
             MAX(n_chars) OVER (PARTITION BY lang) AS mx
      FROM documents
    ) s
    """,
    tags=("udf", "grouped-map"),
)
def grouped_map_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language min-max normalization of document length through
    ``groupBy().applyInPandas`` — the grouped-*map* UDF surface (one
    pandas frame in, one frame out per group), completing the
    extension-point set next to mapInPandas, the grouped-agg UDAF,
    the UDTF, and applyInPandasWithState. Integer min/max plus one
    double division keeps it bit-identical to the window-function
    oracle; each group streams to Python as Arrow batches, so the
    shuffle is the same one the SQL window would need."""
    from ..functions import minmax_norm_pdf

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        minmax_norm_pdf, "doc_id bigint, lang string, norm_chars double"
    )
