"""Multimodal column handling.

Images/audio/video travel as opaque ``binary`` columns with typed
metadata — here synthesized deterministically from ``documents.text``
(UTF-8 bytes) since the test corpus ships no real media. What's real
and tested: the binary schema, metadata extraction with built-ins,
and the Arrow-batched ``mapInPandas`` decode pipeline (signature,
batch shape, partitioning). The actual codec call is stubbed with a
deterministic fake, clearly marked — the image/audio libraries are
not in this container.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata; decode/feature-extract runs as ``mapInPandas`` so
bytes stream through Arrow in batches and never materialize on the
driver. Partitioning by content-hash prefix spreads hot media evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .base import register, t


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           substr(base64(encode(text)), 1, 24) AS b64_prefix,
           CAST(octet_length(encode(text)) = n_chars AS BOOLEAN) AS ascii_only
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column: byte length,
    content hash, base64 prefix — all JVM built-ins over
    ``binary`` (the pattern for image/audio sidecar metadata)."""
    d = t(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.substring(F.base64(blob), 1, 24).alias("b64_prefix"),
        (F.octet_length(blob).cast("bigint") == F.col("n_chars")).alias(
            "ascii_only"
        ),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("byte_checksum", T.LongType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode': the real pipeline shape with a stubbed
    codec.

    STUB: a real implementation would call e.g. PIL/ffmpeg here
    (``Image.open(io.BytesIO(payload))``); those libraries are not in
    this container, so dimensions are derived deterministically from
    the first payload bytes and the checksum stands in for pixel
    stats. The Spark-side plumbing — binary column in, Arrow batch
    sizes, struct-typed feature row out — is the real contract.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "fake_width": payloads.map(
                    lambda b: (b[0] if len(b) > 0 else 0) + 1
                ).astype("int32"),
                "fake_height": payloads.map(
                    lambda b: (b[1] if len(b) > 1 else 0) + 1
                ).astype("int32"),
                "byte_checksum": payloads.map(
                    lambda b: sum(b[:64]) if len(b) else 0
                ).astype("int64"),
            }
        )
        yield out


@register(
    "multimodal_decode_stub",
    oracle=None,  # mapInPandas pipeline — rows-only check by design
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract pipeline: binary payload ->
    mapInPandas (Arrow batches) -> typed feature rows. Deterministic
    stub codec (see _decode_batches); ordering-independent output."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             unnest(range(0, least((octet_length(encode(text)) + 99) // 100, 5)))
               AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           frame_idx * 100 AS byte_offset,
           least(100, n_bytes - frame_idx * 100) AS frame_bytes
    FROM frames
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for chunked media: split each payload into
    fixed-size windows (100-byte 'frames', capped at 5 per doc) —
    the declarative row-explosion that precedes a per-frame decode.
    For video this is the keyframe-stride plan; the explode keeps
    per-frame work distributable."""
    d = t(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.encode("text", "UTF-8")).cast("bigint")
    n_frames = F.least((n_bytes + 99) / F.lit(100), F.lit(5)).cast("bigint")
    return (
        d.select(
            "doc_id",
            n_bytes.alias("n_bytes"),
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_frames - 1)
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * 100).alias("byte_offset"),
            F.least(
                F.lit(100).cast("bigint"),
                F.col("n_bytes") - F.col("frame_idx") * 100,
            ).alias("frame_bytes"),
        )
    )
