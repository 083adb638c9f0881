"""UDTF + UDAF demonstrations with exact cross-engine oracles.

- :class:`TokenizeUDTF` — a Python user-defined *table* function that
  explodes a document into (token, pos) rows, consumed via a SQL
  ``LATERAL`` call. Token semantics are pinned to single-space split
  with empties dropped so a DuckDB ``string_split``/``unnest`` oracle
  reproduces it exactly.
- :func:`weighted_avg_quantized` — a pandas grouped-agg UDF (the UDAF
  surface): weighted average computed in exact int64 after micro-unit
  quantization, so the result is bit-identical to the SQL oracle
  regardless of partitioning (float accumulation order never enters).

Both are deliberately *not* used by hot-path operators — built-ins
cover tokenization (``split``/``posexplode``) and weighted averages
(decimal sums). They exist to prove the extension surface works:
UDTFs for logic that genuinely needs imperative row-to-rows expansion,
pandas UDAFs for per-group algorithms Spark lacks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@udtf(returnType="token: string, pos: int")
class TokenizeUDTF:
    """Emit (token, 0-based position) rows for one document.

    Split on single spaces, dropping empty tokens — the same contract
    as DuckDB ``string_split(text, ' ')`` with a ``<> ''`` filter, so
    positions align after the 1-based/0-based adjustment.
    """

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for raw in text.split(" "):
            if raw:
                yield raw, pos
                pos += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL ``LATERAL`` use."""
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)


def minmax_norm_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map (applyInPandas) kernel: min-max normalize
    ``n_chars`` within one group. Integer min/max and subtraction are
    exact; the single double division matches SQL's
    ``CAST(n - mn AS DOUBLE) / (mx - mn)`` bit-for-bit. Degenerate
    groups (mx == mn) normalize to 0.0 like the oracle's CASE."""
    mn = int(pdf["n_chars"].min())
    mx = int(pdf["n_chars"].max())
    if mx > mn:
        norm = (pdf["n_chars"] - mn).astype("float64") / float(mx - mn)
    else:
        norm = pd.Series(0.0, index=pdf.index)
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "norm_chars": norm}
    )


# return type as a DataType object, NOT a DDL string: executors
# re-import this module to unpickle the grouped-map kernel below, and
# parsing a DDL string at import time requires an active session the
# worker doesn't have
@pandas_udf(DoubleType())
def weighted_avg_quantized(w: pd.Series, x: pd.Series) -> float:
    """Grouped-agg pandas UDF: sum(w*x)/sum(w) with w pre-quantized to
    int64 milli-units and x to micro-units by the caller. int64 sums
    are exact and associative, so the single final float division is
    deterministic across partitionings — and equals the SQL oracle
    ``CAST(SUM(wi*xi) AS DOUBLE) / CAST(SUM(wi) AS DOUBLE)``."""
    wi = w.to_numpy()
    xi = x.to_numpy()
    denom = wi.sum()
    if denom == 0:
        return None  # SQL-null, like AVG over an empty group
    return float((wi * xi).sum()) / float(denom)
