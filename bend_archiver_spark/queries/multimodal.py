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


# Oracle precondition: the synthetic corpus is pure ASCII (verified at
# all three SFs: octet_length(encode(text)) == length(text) for every
# row), so byte k of the UTF-8 payload == ascii(substr(text, k, 1))
# and the byte checksum is a 64-char lateral sum. The Spark side is
# byte-faithful for any input; only the SQL twin leans on ASCII.
_DECODE_ORACLE = """
WITH base AS (
  SELECT doc_id, text, length(text) AS n FROM documents),
cks AS (
  SELECT b.doc_id, SUM(ascii(substr(b.text, g.i, 1))) AS cksum
  FROM base b, (SELECT unnest(range(1, 65)) AS i) g
  WHERE g.i <= b.n
  GROUP BY b.doc_id)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_bytes,
       CAST(CASE WHEN b.n > 0 THEN ascii(substr(b.text, 1, 1)) ELSE 0 END
            + 1 AS INTEGER) AS fake_width,
       CAST(CASE WHEN b.n > 1 THEN ascii(substr(b.text, 2, 1)) ELSE 0 END
            + 1 AS INTEGER) AS fake_height,
       CAST(COALESCE(c.cksum, 0) AS BIGINT) AS byte_checksum
FROM base b LEFT JOIN cks c ON c.doc_id = b.doc_id
"""


@register(
    "multimodal_decode_stub",
    oracle=_DECODE_ORACLE,
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract pipeline: binary payload ->
    mapInPandas (Arrow batches) -> typed feature rows. Deterministic
    stub codec (see _decode_batches); ordering-independent output, so
    the whole Arrow/Python path is hash-checked against a SQL twin
    (like multimodal_feature_stub; the oracle leans on the corpus
    being ASCII — see _DECODE_ORACLE note)."""
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


_FEAT_DIM = 8
_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feat_idx", T.IntegerType()),
        T.StructField("feat_q", T.LongType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'feature extraction' over binary payloads.

    STUB: a real implementation would run an image/audio encoder here
    (CLIP/whisper embedding of the decoded media); this container has
    no media libraries, so each of the 8 'features' is derived from
    the md5 of (payload bytes + feature index) — deterministic, so the
    WHOLE mapInPandas pipeline is hash-checkable against a SQL oracle
    (unlike a real codec). The Spark-side contract — binary in, Arrow
    batches through Python, (id, idx, value) feature rows out — is the
    real one."""
    import hashlib

    for pdf in batches:
        ids, idxs, vals = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            for k in range(_FEAT_DIM):
                h = hashlib.md5(data + b"_" + str(k).encode()).hexdigest()
                ids.append(doc_id)
                idxs.append(k)
                vals.append(int(h[:15], 16) % 100_000)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "feat_idx": pd.Series(idxs, dtype="int32"),
                "feat_q": pd.Series(vals, dtype="int64"),
            }
        )


@register(
    "multimodal_feature_stub",
    oracle=f"""
    WITH k AS (SELECT unnest(range(0, {_FEAT_DIM})) AS feat_idx)
    SELECT doc_id,
           CAST(feat_idx AS INTEGER) AS feat_idx,
           ('0x' || substr(md5(text || '_' || CAST(feat_idx AS VARCHAR)),
                           1, 15))::BIGINT % 100000 AS feat_q
    FROM documents, k
    """,
    tags=("multimodal", "pandas-udf"),
)
def multimodal_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the Arrow/Python boundary with an
    EXACT oracle: payload bytes -> mapInPandas -> (doc_id, feat_idx,
    feat_q) rows, where the stub 'encoder' is md5-derived and thus
    bit-reproducible in SQL. This pins the full Pandas-UDF data path
    (binary transfer, batch iteration, typed output) with a hash
    check — the companion to multimodal_decode_stub, whose realistic
    codec shape keeps it rows-only. Python is the declared slow path
    here; the quarantine plan test proves nothing else crosses it."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(_feature_batches, schema=_FEAT_SCHEMA)


@register(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             ('0x' || substr(md5(text || '_w'), 1, 15))::BIGINT % 4096 + 1
               AS src_w,
             ('0x' || substr(md5(text || '_h'), 1, 15))::BIGINT % 4096 + 1
               AS src_h
      FROM documents)
    SELECT doc_id, src_w, src_h,
           greatest(src_w * 224 // greatest(src_w, src_h), 1) AS out_w,
           greatest(src_h * 224 // greatest(src_w, src_h), 1) AS out_h,
           (greatest(src_w, src_h) <= 224) AS no_upscale_needed
    FROM dims
    """,
    tags=("multimodal",),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for an image column: target dimensions for a
    max-side-224 thumbnail, aspect ratio preserved, pure integer math
    (src dims are md5-derived stand-ins for decoded header values —
    the decode itself is the stubbed codec). This is the metadata
    pass that precedes a distributed pixel resize: map-only, no
    shuffle, and the actual resample would slot into the decode
    pipeline's mapInPandas. At 100 TB the plan/filter step avoids
    shipping already-small media through the Python boundary at
    all."""
    from .base import hash64_expr

    d = t(spark, sf_dir, "documents")
    src_w = (hash64_expr(F.concat(F.col("text"), F.lit("_w"))) % 4096 + 1).alias("src_w")
    src_h = (hash64_expr(F.concat(F.col("text"), F.lit("_h"))) % 4096 + 1).alias("src_h")
    dims = d.select("doc_id", src_w, src_h)
    m = F.greatest("src_w", "src_h")
    return dims.select(
        "doc_id",
        "src_w",
        "src_h",
        F.greatest((F.col("src_w") * 224 / m).cast("bigint"), F.lit(1).cast("bigint")).alias("out_w"),
        F.greatest((F.col("src_h") * 224 / m).cast("bigint"), F.lit(1).cast("bigint")).alias("out_h"),
        (m <= 224).alias("no_upscale_needed"),
    )
