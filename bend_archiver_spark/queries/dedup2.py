"""Second-wave dedup operators: asymmetric containment and
content-defined chunking.

Near-dup pipelines built on Jaccard miss the *excerpt* case — a short
document wholly quoted inside a long one has high containment but low
Jaccard (the union is dominated by the long side). ``
dedup_containment_pairs`` measures the directed containment
C(A->B) = |A ∩ B| / |A| over 3-gram shingle sets, the signal used to
drop quotes/mirrors of canonical pages from training corpora.

``pipeline_cdc_chunks`` is content-defined chunking (the rolling-hash
boundary trick from LBFS/rsync, applied to token streams): a token
whose content hash lands in 1/8 of the hash space ENDS a chunk, so
chunk boundaries depend only on local content and re-align after
insertions/deletions — unlike fixed-size chunking, an edited document
still shares most chunk hashes with its original. The chunk stream
feeds chunk-level dedup stats (which documents are assembled from
text that exists elsewhere).

Both have exact DuckDB oracles on the portable 60-bit md5 hash.

Scale design: containment reuses the shingle posting-list equi-join
(cost = gram collisions, never a cartesian; at 100 TB restrict it to
LSH candidates exactly like jaccard verification). CDC boundary
detection is *entirely map-side* — boundary markers are injected into
the token array with array HOFs and the chunk split is a per-row
regex, zero shuffles until the vocabulary-bounded chunk-hash groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as ops
from .base import fanout, hash64_expr, hash64_sql, register, t

_CONTAINMENT_THRESHOLD = 0.6
_MIN_SHINGLES = 5  # tiny shingle sets make containment trivially high

# 3-gram shingles — must match queries/dedup.py's _TOKS_SQL so the
# containment numbers are comparable with the Jaccard pairs.
_TOKS_SQL = r"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS arr
      FROM documents
    )
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(0, greatest(len(arr) - 2, 0)),
                  i -> array_to_string(list_slice(arr, i + 1, i + 3), ' '))) AS tok
    FROM words
"""


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {hash64_sql('tok')} AS tok FROM ({_TOKS_SQL})),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    tdf AS MATERIALIZED (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
    rankedall AS MATERIALIZED (
      SELECT t.doc_id, t.tok,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY d.df, t.tok) AS rn,
             COUNT(*) OVER (PARTITION BY t.doc_id) AS n
      FROM toks t JOIN tdf d ON d.tok = t.tok),
    pref AS MATERIALIZED (
      SELECT doc_id, tok, rn, n FROM rankedall
      WHERE rn <= n - CAST(ceil({_CONTAINMENT_THRESHOLD} * n - 1e-9)
                           AS BIGINT) + 1),
    cand AS MATERIALIZED (
      -- directed PPJoin bounds (operators.dedup.
      -- prefix_filter_candidates_directed, same derivation): the
      -- container must hold >= ceil(t*n_a) shared tokens, and the
      -- first common token in the global rarest-first order caps
      -- the overlap at 1 + min(n_a - rn_a, n_b - rn_b)
      SELECT DISTINCT p.doc_id AS doc_a, f.doc_id AS doc_b
      FROM pref p JOIN rankedall f
        ON f.tok = p.tok AND f.doc_id <> p.doc_id
      WHERE f.n >= {_CONTAINMENT_THRESHOLD} * p.n - 1e-9
        AND 1 + least(p.n - p.rn, f.n - f.rn)
              >= {_CONTAINMENT_THRESHOLD} * p.n - 1e-9),
    doclists AS MATERIALIZED (
      -- list_intersect verify (same shape + collision caveat as
      -- queries.dedup._prefix_inter_sql): two per-candidate list
      -- lookups instead of the exploded token re-join + GROUP BY
      SELECT doc_id, list(tok) AS lst
      FROM toks GROUP BY doc_id),
    inter AS (
      SELECT doc_a, doc_b, n_inter FROM (
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(la.lst, lb.lst)) AS BIGINT)
                 AS n_inter
        FROM cand c
        JOIN doclists la ON la.doc_id = c.doc_a
        JOIN doclists lb ON lb.doc_id = c.doc_b)
      WHERE n_inter > 0
    )
    SELECT doc_a, doc_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(n_inter AS DOUBLE) / sa.n AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    WHERE sa.n >= {_MIN_SHINGLES}
      AND CAST(n_inter AS DOUBLE) / sa.n >= {_CONTAINMENT_THRESHOLD}
    """,
    tags=("dedup", "containment"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment C(A->B) = |A∩B| / |A| >= 0.6 —
    the excerpt/quote detector Jaccard misses when |B| >> |A|
    (Broder 1997 defines both resemblance AND containment; near-dup
    tooling usually ships only the former). Candidates come from the
    DIRECTED prefix filter (operators.dedup.
    prefix_filter_candidates_directed): only the contained side A is
    prefix-reduced — exact by the same Chaudhuri/Vernica theorem, so
    the output is identical to the raw posting-list self-join without
    its hot-token quadratic blowup; only the normalization differs
    from Jaccard: divide by the CONTAINED side's shingle count instead
    of the union."""
    d = t(spark, sf_dir, "documents")
    # persist: the directed prefix machinery adds the global token
    # frequency and ranked-prefix consumers on top of sizes and both
    # verify sides — without a barrier each re-derives the corpus
    # shingle explode. Callers clear cache between queries. Hashed
    # shingles: int64 join keys, ~3x less shuffle than strings.
    toks = ops.hashed_shingle(d, "doc_id", "text").persist()
    cand = ops.prefix_filter_candidates_directed(
        toks, _CONTAINMENT_THRESHOLD
    )
    inter = ops.pair_intersections(toks, cand).withColumnRenamed(
        "na", "n_a"
    )
    containment = F.col("n_inter").cast("double") / F.col("n_a")
    return (
        inter.filter(
            (F.col("n_a") >= _MIN_SHINGLES)
            & (containment >= _CONTAINMENT_THRESHOLD)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            containment.alias("containment"),
        )
    )


# ---------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------

_CDC_MOD = 8  # expected chunk length = 8 tokens
_SEP = "\x01"  # cannot survive a \\s+ split; oracle twin is chr(1)


def _boundary(tok):
    """Token-content boundary predicate (1/_CDC_MOD of hash space)."""
    h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")
    return h % _CDC_MOD == 0


_CDC_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
      FROM documents
    ),
    marked AS (
      SELECT doc_id,
             array_to_string(list_transform(arr, tok -> tok ||
               CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT)
                         % {_CDC_MOD} = 0
                    THEN chr(1) ELSE '' END), ' ') AS body
      FROM words
    ),
    ch AS (
      SELECT doc_id, {hash64_sql('chunk')} AS h
      FROM (
        SELECT doc_id,
               unnest(string_split_regex(body, chr(1) || ' ?')) AS chunk
        FROM marked
      )
      WHERE chunk <> ''
    ),
    counts AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_chunk_frac
    FROM ch JOIN counts USING (h)
    GROUP BY doc_id
"""


@register(
    "pipeline_cdc_chunks",
    oracle=_CDC_ORACLE,
    headline=True,  # round-5 showcase: map-only CDC chunker
    tags=("pipeline", "dedup", "chunking"),
)
def pipeline_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level cross-document dup
    stats. A token whose 60-bit content hash ≡ 0 (mod 8) ends a chunk
    (expected length 8 tokens), so boundaries are a pure function of
    local content: insert a sentence into a document and every chunk
    outside the edit keeps its hash — the property fixed-size chunking
    (``pipeline_chunk_documents``) lacks, and the reason CDC is the
    unit for storage dedup (LBFS, rsync, restic) and works for corpus
    dedup too.

    Plan shape: boundary markers are injected inside the token array
    by a ``transform`` whose lambda touches only its own argument
    (SCALE.md rule 5), the chunk split is one per-row regex — the
    entire chunker is map-only, zero exchanges. The only shuffles are
    the chunk-hash groupBy (distinct-chunk-bounded, int64 keys) and
    the per-doc rollup, the same two-combinable-groupBy shape as
    ``text_duplicated_ngram_fraction``. A chunk repeated inside ONE
    document is not "duplicated" — nd counts distinct documents."""
    d = fanout(t(spark, sf_dir, "documents"))
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    marked = F.transform(
        arr,
        lambda tok: F.concat(
            tok,
            F.when(_boundary(tok), F.lit(_SEP)).otherwise(F.lit("")),
        ),
    )
    chunks_arr = F.split(F.array_join(marked, " "), _SEP + " ?")
    # Persist barrier (SCALE.md rule 4): the chunk stream has two
    # consumers (cross-doc counts + the per-doc probe); without the
    # barrier CollapseProject re-runs the explode+md5 chunker for
    # each. Persisted form is two int64s per chunk — compact, spills.
    ch = (
        d.select("doc_id", F.explode(chunks_arr).alias("chunk"))
        .filter(F.col("chunk") != "")
        .select("doc_id", hash64_expr(F.col("chunk")).alias("h"))
        .persist()
    )
    counts = ch.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    dup = F.when(F.col("nd") > 1, 1).otherwise(0)
    return (
        ch.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("dup_chunks"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias(
                "dup_chunk_frac"
            ),
        )
    )


# ---------------------------------------------------------------------
# LSH candidate-quality audit
# ---------------------------------------------------------------------


@register(
    "dedup_lsh_eval",
    oracle=None,  # replaced below — needs pieces from queries.dedup
    tags=("dedup", "minhash", "evaluation"),
)
def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-audit of the MinHash-LSH candidate generator: precision
    and recall of band-collision candidates against ground truth
    (exact Jaccard >= 0.7 over the same hashed shingle sets), as one
    row of exact counts + derived ratios. This is the query that
    answers "are 4 bands x 4 rows the right operating point for THIS
    corpus" — run it on a sample before committing a 100 TB dedup
    pass to a band configuration (tighter bands -> precision up,
    recall down).

    Scale: candidates and truth are both pair tables persisted once
    (each has two consumers: the hit join and its own count); truth
    is the posting-list equi-join (gram collisions, not O(n^2)), and
    at 100 TB you'd run this audit on a hash-sampled slice — the
    operator composes with ``pipeline_hash_sample``."""
    from .dedup import _JACCARD_THRESHOLD, _N_BANDS, _PERMS

    d = t(spark, sf_dir, "documents")
    with_h, sig = ops.minhash_signatures(
        d, "doc_id", "text", 3, _PERMS, persist=True
    )
    bands = ops.minhash_bands(sig, len(_PERMS), _N_BANDS)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    cand = (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .persist()
    )
    # ground truth: prefix-filtered candidates need the exploded
    # hashed-token stream, but verification rides the per-doc hvs
    # arrays directly (pair_intersections' lists fast path)
    hashed = with_h.select(
        "doc_id", F.explode("hvs").alias("tok")
    ).persist()
    lists = with_h.select(
        "doc_id",
        F.size("hvs").cast("bigint").alias("n"),
        F.col("hvs").alias("lst"),
    )
    truth = (
        ops.jaccard_pairs(hashed, _JACCARD_THRESHOLD, lists=lists)
        .select("doc_a", "doc_b")
        .persist()
    )
    hits = cand.join(truth, ["doc_a", "doc_b"])
    return (
        cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        .crossJoin(
            truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))
        .select(
            "n_candidates",
            "n_truth",
            "n_hits",
            F.expr(
                "cast(n_hits as double) / nullif(n_candidates, 0)"
            ).alias("precision"),
            F.expr("cast(n_hits as double) / nullif(n_truth, 0)").alias(
                "recall"
            ),
        )
    )


def _lsh_eval_oracle() -> str:
    from .dedup import (
        _JACCARD_THRESHOLD,
        _P,
        _TOKS_SQL as _DEDUP_TOKS_SQL,
        _band_union_sql,
        _minhash_sig_sql,
    )

    # ground truth rides the SAME prefix-filter + PPJoin machinery as
    # every other oracle (queries.dedup._prefix_inter_sql) over the
    # hashed-token stream — the raw `h ta JOIN h tb ON hv` self-join
    # this replaces is quadratic in per-token document frequency and
    # exhausted the node's 78 GB spill disk at the 100x rehearsal.
    # The Spark twin's truth already goes through jaccard_pairs'
    # prefix filter; exactness needs only the FINAL thresholded
    # pairs to match (candidate supersets may differ), a theorem on
    # both sides. `cand`/`inter` names come from the shared fragment,
    # so the banding candidates are `lsh_cand` here.
    from .dedup import _prefix_inter_sql

    return f"""
    WITH stoks AS ({_DEDUP_TOKS_SQL}),
    h AS MATERIALIZED (
      SELECT doc_id, ({hash64_sql('tok')} % {_P}) AS hv FROM stoks),
    {_minhash_sig_sql()},
    bands AS ({_band_union_sql()}),
    lsh_cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
    toks AS MATERIALIZED (SELECT doc_id, hv AS tok FROM h),
    {_prefix_inter_sql(_JACCARD_THRESHOLD)},
    truth AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
            >= {_JACCARD_THRESHOLD}
    ),
    hits AS (
      SELECT c.doc_a FROM lsh_cand c
      JOIN truth tr ON tr.doc_a = c.doc_a AND tr.doc_b = c.doc_b
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM lsh_cand) AS n_candidates,
             (SELECT COUNT(*) FROM truth) AS n_truth,
             (SELECT COUNT(*) FROM hits) AS n_hits
    )
    SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / nullif(n_candidates, 0) AS precision,
           CAST(n_hits AS DOUBLE) / nullif(n_truth, 0) AS recall
    FROM counts
    """


# the oracle needs constants from queries.dedup; fill it in after both
# modules are importable (registration order is fixed in __init__.py)
from .base import REGISTRY as _REG  # noqa: E402

_REG["dedup_lsh_eval"].oracle = _lsh_eval_oracle()
