"""Deduplication operators for training-data pipelines.

The full near-dup toolkit over ``documents``/``embeddings``:

- exact dedup (content hash, token-set hash)
- n-gram Jaccard near-dup (exact pairwise)
- MinHash + LSH banding (the 100 TB scale path: candidates from
  band-bucket joins, exact Jaccard verification on candidates only)
- SimHash (bitwise fingerprint + Hamming-distance pairs)
- embedding-cosine near-dup

Every operator — including MinHash and SimHash — has an exact DuckDB
oracle: all hashing is built on the portable md5-derived 60-bit hash
(queries/base.py) and modular arithmetic that both engines evaluate
identically in 64-bit integers, so signatures match bit-for-bit.

Scale design: the MinHash path is the one that survives 100 TB —
shingle->signature is one shuffle-free projection + one groupBy,
banding is a cheap explode, and the candidate join touches only
band-collided pairs. The exact O(n^2) variants (ngram_jaccard,
embedding cosine pairs) are the small-data oracles those candidates
are verified against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as ops
from ..operators import similarity as sim_ops
from .base import hash64_sql, register, t

# --- shared constants (identical on both engines) --------------------
_P = 2147483647  # 2^31 - 1, prime; products stay < 2^62 in int64
_PERMS = [
    (695425565, 2035525362), (323946140, 847876999),
    (1397871145, 103694312), (155555738, 1763673106),
    (1150797846, 202142728), (785310973, 1251527726),
    (124551739, 1953574602), (1089709947, 461060838),
    (80521325, 184570285), (931247022, 898017869),
    (150013384, 516819858), (194804717, 1183364967),
    (911648020, 126938843), (1775651416, 1214302567),
    (265862674, 2034632750), (479402029, 1354258844),
]
_N_BANDS, _BAND_ROWS = 4, 4  # 16 sigs = 4 bands x 4 rows
_JACCARD_THRESHOLD = 0.7
_SIMHASH_BITS = 60  # our portable hash is 60-bit
_HAMMING_MAX = 10
_COSINE_THRESHOLD = 0.45

# word 3-gram shingles: discriminative even over a small vocabulary
# (single tokens make every doc pair look similar in this corpus)
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

# hashed variant — the oracle twin of operators.dedup.hashed_shingle:
# distinct on the STRING shingles first, then the portable 60-bit
# hash, so both engines merge a within-document collision identically.
# int64 keys keep the oracle's join/spill intermediates ~3x smaller
# than trigram strings (the 100x CC-family oracles exceeded the
# container's spill disk on strings).
_HTOKS_SQL = f"""
    SELECT doc_id, {hash64_sql('tok')} AS tok FROM ({_TOKS_SQL})
"""


def _prefix_inter_sql(
    threshold: float, materialize_inter: bool = False
) -> str:
    """CTE fragment ``tdf, pref, cand, doclists, inter`` —
    prefix-filtered EXACT pair-intersection counting, the SQL mirror of
    ``operators.dedup.prefix_filter_candidates`` (Chaudhuri 2006 /
    Vernica 2010; same ``ceil(t*n - eps)`` prefix length, same
    rarest-first ``(df, tok)`` total order). Expects a CTE named
    ``toks`` (doc_id, tok) in scope — MATERIALIZED, since four
    consumers re-inline it otherwise.

    Exactness does not require the two engines to agree on candidate
    sets (any valid prefix order yields a superset of the true pairs);
    only the final thresholded pairs must match, and those are a
    theorem. This replaces the raw ``toks a JOIN toks b ON a.tok =
    b.tok`` self-join, which is quadratic in per-token document
    frequency — the shape that exhausted 78 GB of DuckDB temp disk at
    the 100x rehearsal — and is also ~2.5x faster at sf0.1.

    Collision rows also pass the PPJoin length and positional bounds
    (Xiao 2008; same derivation as
    ``operators.dedup.prefix_filter_candidates``): the first common
    token in the global rarest-first order sits inside both prefixes
    and caps the overlap at ``1 + min(n_a - rn_a, n_b - rn_b)``, so
    dropping collision rows under the threshold's overlap requirement
    keeps every qualifying pair while pruning the low-threshold
    candidate blowup (at t=0.5 prefixes keep half of every document;
    the positional bound is what kept this oracle inside one node's
    spill disk at the 100x rehearsal).

    Verification counts the intersection per candidate pair via
    per-document TOKEN LISTS and ``list_intersect`` — two
    hash-join lookups per candidate against a 1-row-per-doc list
    table — instead of re-joining the full (doc_id, tok) stream on
    both sides and hash-aggregating the exploded matches (at the
    100x corpus that explode is ~600M rows into a GROUP BY; it was
    the dominant spill after the candidate bounds landed).
    ``list_intersect`` is distinct-set semantics while the join-count
    multiplies duplicate rows: the two differ ONLY when a document
    carries a duplicate (doc_id, tok) row, i.e. a within-document
    60-bit hash collision (~|toks|^2/2^61 — the same accepted
    argument as hashed_shingle's; shingles are string-DISTINCT
    before hashing on both engines).

    ``materialize_inter`` additionally pins ``inter`` — required when
    the fragment sits inside a WITH RECURSIVE (the recursive planner
    re-executes inlined members per iteration; see _CC_CTE)."""
    inter_kw = "AS MATERIALIZED" if materialize_inter else "AS"
    return f"""
    tdf AS MATERIALIZED (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
    pref AS MATERIALIZED (
      SELECT doc_id, tok, rn, n FROM (
        SELECT t.doc_id, t.tok,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                  ORDER BY d.df, t.tok) AS rn,
               COUNT(*) OVER (PARTITION BY t.doc_id) AS n
        FROM toks t JOIN tdf d ON d.tok = t.tok)
      WHERE rn <= n - CAST(ceil({threshold} * n - 1e-9) AS BIGINT) + 1),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
      WHERE least(a.n, b.n)
              >= {threshold} * greatest(a.n, b.n) - 1e-9
        AND (1 + least(a.n - a.rn, b.n - b.rn)) * {1.0 + threshold}
              >= {threshold} * (a.n + b.n) - 1e-9),
    doclists AS MATERIALIZED (
      SELECT doc_id, list(tok) AS lst
      FROM toks GROUP BY doc_id),
    inter {inter_kw} (
      SELECT doc_a, doc_b, n_inter FROM (
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(la.lst, lb.lst)) AS BIGINT)
                 AS n_inter
        FROM cand c
        JOIN doclists la ON la.doc_id = c.doc_a
        JOIN doclists lb ON lb.doc_id = c.doc_b)
      WHERE n_inter > 0)
    """


# ---------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_key,
           MIN(doc_id) AS keeper_doc,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized content hash: one hash-groupBy, the
    keeper is the minimum doc_id per group. At scale this is a single
    map-side-combined shuffle on the 128-bit key."""
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return (
        d.groupBy(F.md5(norm).alias("content_key"))
        .agg(
            F.min("doc_id").alias("keeper_doc"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "dedup_exact_tokenset",
    oracle="""
    WITH keys AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS set_key
      FROM documents
    )
    SELECT set_key, MIN(doc_id) AS keeper_doc, COUNT(*) AS n_members,
           (COUNT(*) > 1) AS is_dup_group
    FROM keys GROUP BY set_key
    """,
    tags=("dedup",),
)
def dedup_exact_tokenset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the sorted distinct-token *set* — catches
    reorderings/repetitions that content-hash dedup misses (the
    synthetic corpus plants such pairs: word-set Jaccard 1.0 with
    different surface text)."""
    d = t(spark, sf_dir, "documents")
    set_key = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
            ),
        )
    )
    return (
        d.select("doc_id", set_key.alias("set_key"))
        .groupBy("set_key")
        .agg(
            F.min("doc_id").alias("keeper_doc"),
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) > 1).alias("is_dup_group"),
        )
    )


# ---------------------------------------------------------------------
# N-gram Jaccard (exact pairwise — the verification oracle)
# ---------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS MATERIALIZED ({_HTOKS_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    {_prefix_inter_sql(_JACCARD_THRESHOLD)}
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs (threshold 0.7, word
    3-gram shingles) — the exact baseline the MinHash-LSH operator is
    verified against. Candidates come from the prefix filter (see
    operators.dedup.prefix_filter_candidates), which is exact by
    theorem, so the output is identical to the raw shingle self-join
    the oracle runs — without its hot-token quadratic blowup."""
    d = t(spark, sf_dir, "documents")
    # persist the shingle stream: jaccard_pairs consumes it many ways
    # (global token frequency, the ranked prefix join, sizes, both
    # verify sides) and without the barrier each consumer re-runs the
    # corpus tokenize+explode. jaccard_pairs would add this barrier
    # itself if missing; keeping it explicit here documents the scan
    # shape. Callers clear cache between queries. Hashed shingles:
    # int64 join keys, ~3x less shuffle than trigram strings.
    toks = ops.hashed_shingle(d, "doc_id", "text").persist()
    return ops.jaccard_pairs(toks, _JACCARD_THRESHOLD)


# ---------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------


def _minhash_sig_sql() -> str:
    mins = ",\n           ".join(
        f"MIN(({a} * hv + {b}) % {_P}) AS s{i}"
        for i, (a, b) in enumerate(_PERMS)
    )
    return f"""
    sig AS (
      SELECT doc_id,
           {mins}
      FROM h GROUP BY doc_id
    )"""


def _band_union_sql() -> str:
    parts = []
    for j in range(_N_BANDS):
        cols = ", ".join(f"s{j * _BAND_ROWS + r}" for r in range(_BAND_ROWS))
        parts.append(
            f"SELECT doc_id, {j} AS band_idx, concat_ws('_', {cols}) AS band_key FROM sig"
        )
    return " UNION ALL ".join(parts)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    h AS (SELECT doc_id, ({hash64_sql('tok')} % {_P}) AS hv FROM toks),
    {_minhash_sig_sql()},
    bands AS ({_band_union_sql()}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
    doclists AS MATERIALIZED (
      -- list_intersect verify: distinct-set semantics, matching the
      -- Spark side's array_intersect (operators.dedup.
      -- pair_intersections) even on a mod-P within-doc collision
      SELECT doc_id, list(hv) AS lst FROM h GROUP BY doc_id),
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
    SELECT i.doc_a, i.doc_b,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
    """,
    headline=True,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands x 4 rows) near-dup detection with
    exact-Jaccard verification of candidates — the 100 TB scale path
    (signatures: one groupBy; banding: cheap explode; candidate join
    touches only band collisions; never O(n^2)). The signature
    arithmetic is pure int64 math, bit-identical in the DuckDB oracle.
    Delegates to operators.dedup.minhash_lsh_dedup."""
    d = t(spark, sf_dir, "documents")
    return ops.minhash_lsh_dedup(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, perms=_PERMS, n_bands=_N_BANDS,
        persist_shingles=True,
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------


# Two-level pigeonhole parameters, derived with the SAME formulas as
# operators.dedup.simhash_pairs_banded so the oracle's candidate
# generation stays in lockstep with the Spark plan. The oracle SQL
# below is written for the uniform-width radius-2 case the registered
# 60/10 config produces (4 blocks x 15 bits); the assert trips at
# import if a parameter change ever leaves that regime.
_SH_NBLOCKS = min(max(1, -(-(_HAMMING_MAX + 1) // 3)), _SIMHASH_BITS)
_SH_RADIUS = _HAMMING_MAX // _SH_NBLOCKS
_SH_BW, _SH_REM = divmod(_SIMHASH_BITS, _SH_NBLOCKS)
assert _SH_REM == 0 and _SH_RADIUS == 2, (
    "simhash oracle SQL assumes uniform radius-2 blocks; "
    "re-derive the ball CTE for the new parameters"
)

# Shared fingerprint derivation (toks -> 60-bit majority simhash):
# computed independently from the text on the oracle side, so the
# pigeonhole tail below verifies the Spark fingerprints end-to-end.
_SIMHASH_SIG_SQL = f"""
    WITH toks AS ({_TOKS_SQL}),
    h AS (SELECT doc_id, {hash64_sql('tok')} AS hv FROM toks),
    bits AS (
      SELECT doc_id, unnest(range(0, {_SIMHASH_BITS})) AS bit, hv FROM h
    ),
    sums AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN ((hv >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM bits GROUP BY doc_id, bit
    ),
    sims AS MATERIALIZED (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
      FROM sums GROUP BY doc_id
    )"""

# Candidate generation mirroring the Spark two-level pigeonhole: a
# pair within Hamming hamming_max has SOME block within the inner
# radius (pigeonhole over {_SH_NBLOCKS} blocks), and d(A,B) <= r iff
# B's block value lies in the radius-r ball of A's — enumerated on one
# side (1 + w + C(w,2) variants at r=2) and equi-joined against the
# identity side. Exact Hamming verification on candidates makes the
# result identical to the brute self-join (_SIMHASH_BRUTE_TAIL, pinned
# by tests/test_oracle_parity.py::TestSimhashOracleParity); the
# brute tail is 1.25e11 pair evaluations at the 100x corpus, the
# pigeonhole tail ~4e7 — this is what lets the 100x sweep RUN the
# simhash oracle instead of documenting a bound.
_SIMHASH_PIGEONHOLE_TAIL = f""",
    blocks AS MATERIALIZED (
      SELECT doc_id, simhash, blk.bi AS block_idx,
             ((simhash >> (blk.bi * {_SH_BW})) & {(1 << _SH_BW) - 1}) AS v
      FROM sims, (SELECT unnest(range(0, {_SH_NBLOCKS})) AS bi) blk
    ),
    ball AS (
      SELECT doc_id, simhash, block_idx,
             unnest(list_prepend(v,
               list_transform(range(0, {_SH_BW}),
                              i -> xor(v, 1::BIGINT << i)) ||
               flatten(list_transform(range(0, {_SH_BW - 1}), i ->
                 list_transform(range(i + 1, {_SH_BW}), j ->
                   xor(xor(v, 1::BIGINT << i),
                       1::BIGINT << j)))))) AS w
      FROM blocks
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                      b.doc_id AS doc_b, b.simhash AS sim_b
      FROM ball a JOIN blocks b
        ON b.block_idx = a.block_idx AND b.v = a.w
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {_HAMMING_MAX}
"""

# Brute O(n^2) tail — NOT registered (infeasible past ~50k docs);
# kept as the independent-algorithm anchor the parity test runs both
# tails against at sf0.001 + sf0.01.
_SIMHASH_BRUTE_TAIL = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
"""


@register(
    "dedup_simhash",
    oracle=_SIMHASH_SIG_SQL + _SIMHASH_PIGEONHOLE_TAIL,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit majority-vote fingerprint over shingle
    hashes, pairs within Hamming distance 10 — via the TWO-LEVEL
    pigeonhole ball join (HmSearch / Manku-style: few WIDE blocks,
    each matched within a radius<=2 enumerated ball; at these
    parameters — 60 bits, radius 10 — narrow 6-bit equality bands
    generate MORE collisions than the brute self-join, measured at
    500k docs). Exact Hamming verification on candidates makes the
    output identical to the O(n^2) self-join. A classic
    hamming_max+1 equality-band fallback remains for configs whose
    bands stay >=12 bits wide. Delegates to
    operators.dedup.simhash_fingerprints/simhash_pairs_banded."""
    d = t(spark, sf_dir, "documents")
    sims = ops.simhash_fingerprints(d, "doc_id", "text", bits=_SIMHASH_BITS)
    return ops.simhash_pairs_banded(sims, _HAMMING_MAX, bits=_SIMHASH_BITS)


# ---------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------

# LSH gating parameters (identical on both engines): BOTH dimensions
# are SCALE-ADAPTIVE — the plane count per table is the smallest p in
# [6, 15] with 2^p * 64 >= n_vectors (operators.similarity.
# adaptive_planes), and the table count is amplified alongside via
# the integer ladder operators.similarity.LSH_TABLES_LADDER (8 tables
# at the 6-plane floor, 26 at 12 planes) so near-dup recall holds as
# planes grow — 1-(1-p^planes)^tables with p=1-acos(c)/pi stays
# >= 0.92 at cosine 0.85 across every rung, where a FIXED 8 tables
# would fall to ~0.56 at 12 planes. The oracle mirrors both as
# integer threshold CASE ladders generated from the SAME constants,
# lockstep-pinned by tests/test_oracle_parity.py. Signs come from
# the portable md5 hash of the global plane index. Every driver
# corpus (n <= 4096) sits at the 6-plane/8-table floor; a FIXED 6
# planes has a candidate floor of ~n^2/64 per table for ANY corpus
# (64 buckets, convexity of sum-of-C(bucket,2)), which is why the
# plane count must grow with log2(n) for the gate to stay selective
# at the 100x corpus (200k vectors -> 12 planes x 26 tables).
_LSH_TABLES = 8  # the floor-rung table count (historical 8x6 config)
_PLANES_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN n <= {(1 << p) * sim_ops.LSH_TARGET_BUCKET} THEN {p}"
        for p in range(
            sim_ops.LSH_PLANES_FLOOR, sim_ops.LSH_PLANES_CAP
        )
    )
    + f" ELSE {sim_ops.LSH_PLANES_CAP} END"
)
_TABLES_CASE_SQL = (
    "CASE np "
    + " ".join(
        f"WHEN {p} THEN "
        f"{sim_ops.LSH_TABLES_LADDER[p - sim_ops.LSH_PLANES_FLOOR]}"
        for p in range(
            sim_ops.LSH_PLANES_FLOOR, sim_ops.LSH_PLANES_CAP + 1
        )
    )
    + " END"
)
# range bound for the global sign index: the max tables*planes rung
_MAX_SIGNS = max(
    sim_ops.LSH_TABLES_LADDER[p - sim_ops.LSH_PLANES_FLOOR] * p
    for p in range(sim_ops.LSH_PLANES_FLOOR, sim_ops.LSH_PLANES_CAP + 1)
)

# List-based throughout (the same move as the MinHash list_intersect
# verify): one quantized LIST row per vector feeds both the sign
# projections and the candidate dot products as 64-term
# list_aggregate sums — all int64, bit-identical to the exploded
# SUM(xq*sgn)/SUM(xq_a*xq_b) forms. The exploded per-dimension joins
# they replace were the 100x wall: proj as e JOIN signs materialized
# ~1.2e9 intermediate rows and dots as cand JOIN e JOIN e ~2.5e9 —
# the latter exhausted 70 GB of oracle spill disk at 200k vectors,
# while the list forms stream 19.2M and ~4e7 rows respectively.
_COSINE_LSH_SQL = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS xq,
             generate_subscripts(embedding, 1) - 1 AS i
      FROM embeddings
    ),
    lists AS MATERIALIZED (
      SELECT vec_id, list(xq ORDER BY i) AS lq FROM e GROUP BY vec_id),
    norms AS MATERIALIZED (
      SELECT vec_id, SUM(xq * xq) AS nrm FROM e GROUP BY vec_id),
    params AS MATERIALIZED (
      SELECT np, {_TABLES_CASE_SQL} AS nt
      FROM (SELECT {_PLANES_CASE_SQL} AS np
            FROM (SELECT COUNT(*) AS n FROM embeddings))
    ),
    signs AS (
      SELECT g.j // p.np AS tbl, g.j % p.np AS bit, d.i,
             CASE WHEN {hash64_sql("concat(g.j, '_', d.i)")} % 2 = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM (SELECT unnest(range(0, {_MAX_SIGNS})) AS j) g
      CROSS JOIN params p
      CROSS JOIN (SELECT unnest(range(0, 64)) AS i) d
      WHERE g.j < p.nt * p.np
    ),
    slists AS MATERIALIZED (
      SELECT tbl, bit, list(sgn ORDER BY i) AS sl
      FROM signs GROUP BY tbl, bit),
    proj AS (
      SELECT l.vec_id, s.tbl, s.bit,
             list_aggregate(list_transform(range(1, 65),
               i -> l.lq[i] * s.sl[i]), 'sum') AS dot_j
      FROM lists l CROSS JOIN slists s
    ),
    buckets AS MATERIALIZED (
      SELECT vec_id, tbl,
             SUM(CASE WHEN dot_j > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS bucket
      FROM proj GROUP BY vec_id, tbl
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM buckets a
      JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
                    AND a.vec_id < b.vec_id
    ),
    dots AS (
      SELECT cd.vec_a, cd.vec_b,
             list_aggregate(list_transform(range(1, 65),
               i -> la.lq[i] * lb.lq[i]), 'sum') AS dot
      FROM cand cd
      JOIN lists la ON la.vec_id = cd.vec_a
      JOIN lists lb ON lb.vec_id = cd.vec_b
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
          >= {_COSINE_THRESHOLD}
"""


@register(
    "dedup_embedding_cosine",
    oracle=_COSINE_LSH_SQL,
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.45), candidates
    gated by multi-table hyperplane LSH with BOTH dimensions
    scale-adaptive (8 tables x 6 planes at every driver corpus;
    planes grow with log2(n) so candidates stay O(n) instead of
    hitting the fixed-plane n^2/2^p floor, and tables amplify in
    lockstep — LSH_TABLES_LADDER — so near-dup recall holds: >= 0.92
    at cosine 0.85 across every rung; recall at THIS query's low 0.45
    threshold is ~0.46 at the floor decaying to ~0.13 at 12 planes,
    the inherent LSH amplification economics, see cosine_pairs_lsh)
    and verified with exact int64 dots — never O(n^2). The exact
    brute-force pair scan (operators.similarity.cosine_pairs)
    remains the in-repo recall oracle (tests/test_similarity.py
    planted-pair fixture). Delegates to
    operators.similarity.cosine_pairs_lsh."""
    emb = t(spark, sf_dir, "embeddings")
    return sim_ops.cosine_pairs_lsh(
        emb, "vec_id", "embedding", _COSINE_THRESHOLD,
        n_tables=None, n_planes=None,
    )


# ---------------------------------------------------------------------
# Connected components: pairs -> dedup clusters
# ---------------------------------------------------------------------

# Every member is MATERIALIZED and the recursion's base case reads a
# materialized node list: DuckDB's recursive-CTE planner re-executes
# inlined (and even some hinted) members per iteration — the staged
# pipeline runs in ~30 s at 100x while the same query with default
# inlining re-derived the corpus until it exhausted spill disk. The
# full-materialization form completes at 100x (385 s); at the
# driver's sf0.01 the hint overhead is microseconds.
_CC_CTE = rf"""
WITH RECURSIVE
nodes AS MATERIALIZED (SELECT doc_id FROM documents),
words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS arr
  FROM documents),
stoks AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(0, greatest(len(arr) - 2, 0)),
                i -> array_to_string(list_slice(arr, i + 1, i + 3), ' '))) AS tok
  FROM words),
toks AS MATERIALIZED (
  SELECT doc_id, {hash64_sql('tok')} AS tok FROM stoks),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
""" + _prefix_inter_sql(_JACCARD_THRESHOLD, materialize_inter=True) + r""",
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.7),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b),
comp AS (SELECT node AS doc_id, MIN(r) AS component_id FROM reach GROUP BY node)
"""

_CC_ORACLE = _CC_CTE + r"""
SELECT doc_id, component_id,
       CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
         AS component_size
FROM comp
"""


@register(
    "dedup_connected_components",
    oracle=_CC_ORACLE,
    tags=("dedup", "graph"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *clusters*: Jaccard pairs (threshold 0.7) form edges,
    iterative min-label propagation (operators.graph) closes them into
    components; every document lands in exactly one cluster keyed by
    its minimum reachable doc_id (singletons cluster with themselves).
    The DuckDB oracle computes the same fixpoint as a recursive CTE —
    transitive closure is the one dedup step plain SQL can't do in a
    fixed number of passes, which is why the Spark side is an
    iterative driver loop with checkpointing."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = ops.jaccard_pairs(
        ops.hashed_shingle(d, "doc_id", "text"), _JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, d.select("doc_id"))
    return comp.withColumn(
        "component_size",
        F.count(F.lit(1)).over(Window.partitionBy("component_id")).cast("bigint"),
    )


@register(
    "dedup_clusters_keep_one",
    oracle=_CC_CTE
    + r"""
SELECT c.component_id AS doc_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS duplicates_removed,
       d.lang, d.source
FROM comp c JOIN documents d ON d.doc_id = c.component_id
GROUP BY 1, 3, 4
""",
    tags=("dedup", "graph", "pipeline"),
)
def dedup_clusters_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation payoff of clustering: materialize the deduplicated
    corpus by keeping exactly one representative per near-dup
    component (the minimum doc_id — which IS the component label, so
    no extra ranking pass is needed) and report how many duplicates
    each keeper absorbed. One groupBy over the (node, label) table
    plus one broadcast-size join back to metadata; the document text
    itself never re-shuffles."""
    from ..operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = ops.jaccard_pairs(
        ops.hashed_shingle(d, "doc_id", "text"), _JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, d.select("doc_id"))
    survivors = comp.groupBy("component_id").agg(
        (F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("duplicates_removed")
    )
    return (
        survivors.join(
            d.select("doc_id", "lang", "source"),
            survivors["component_id"] == d["doc_id"],
        )
        .select(
            F.col("component_id").alias("doc_id"),
            "duplicates_removed",
            "lang",
            "source",
        )
    )


# ---------------------------------------------------------------------
# Cross-corpus decontamination
# ---------------------------------------------------------------------

_X_BENCH = 10  # doc_id < 10 stands in for the held-out eval suite
_X_THRESHOLD = 0.5


@register(
    "dedup_cross_corpus_minhash",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    h AS (SELECT doc_id, ({hash64_sql('tok')} % {_P}) AS hv FROM toks),
    {_minhash_sig_sql()},
    bands AS ({_band_union_sql()}),
    cand AS (
      SELECT DISTINCT c.doc_id AS doc_id, b.doc_id AS bench_id
      FROM bands c JOIN bands b
        ON c.band_idx = b.band_idx AND c.band_key = b.band_key
      WHERE c.doc_id >= {_X_BENCH} AND b.doc_id < {_X_BENCH}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
    doclists AS MATERIALIZED (
      -- list_intersect verify: distinct-set semantics, matching the
      -- Spark side's array_intersect even on a mod-P collision
      SELECT doc_id, list(hv) AS lst FROM h GROUP BY doc_id),
    inter AS (
      SELECT doc_id, bench_id, n_inter FROM (
        SELECT c.doc_id, c.bench_id,
               CAST(len(list_intersect(la.lst, lb.lst)) AS BIGINT)
                 AS n_inter
        FROM cand c
        JOIN doclists la ON la.doc_id = c.doc_id
        JOIN doclists lb ON lb.doc_id = c.bench_id)
      WHERE n_inter > 0
    )
    SELECT i.doc_id, i.bench_id,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_id
    JOIN sizes sb ON sb.doc_id = i.bench_id
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
            >= {_X_THRESHOLD}
    """,
    headline=True,
    tags=("dedup", "minhash", "decontamination"),
)
def dedup_cross_corpus_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination at MinHash scale: near-dup pairs
    BETWEEN the training corpus (doc_id >= 10) and a small held-out
    benchmark set (doc_id < 10), threshold 0.5 — the fuzzy
    complement of text_contamination_check's exact 5-gram overlap
    (that one catches verbatim leakage; this one catches paraphrased/
    partially-edited leakage the exact match misses). Delegates to
    operators.dedup.minhash_lsh_cross: the bench side's band table
    and shingle hashes are BROADCAST, so candidate generation touches
    the corpus with one map-side join — at 100 TB the corpus is never
    shuffled to find its contaminated documents."""
    d = t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < _X_BENCH)
    corpus = d.filter(F.col("doc_id") >= _X_BENCH)
    return ops.minhash_lsh_cross(
        corpus, bench, "doc_id", "text",
        threshold=_X_THRESHOLD, perms=_PERMS, n_bands=_N_BANDS,
    )


@register(
    "dedup_source_priority_keep_one",
    oracle=_CC_CTE
    + r"""
, dd AS (
  SELECT c.doc_id, c.component_id, d.source
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
stats AS (
  SELECT component_id,
         CAST(COUNT(*) AS BIGINT) AS component_size,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM dd GROUP BY 1),
k1 AS (SELECT component_id, MIN(source) AS kept_source FROM dd GROUP BY 1),
k2 AS (
  SELECT dd.component_id, k1.kept_source, MIN(dd.doc_id) AS doc_id
  FROM dd JOIN k1 ON dd.component_id = k1.component_id
              AND dd.source = k1.kept_source
  GROUP BY 1, 2)
SELECT k2.doc_id, k2.kept_source, s.component_size, s.n_sources
FROM k2 JOIN stats s ON s.component_id = k2.component_id
""",
    tags=("dedup", "graph", "pipeline"),
)
def dedup_source_priority_keep_one(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Policy-based keeper selection: within each near-dup component
    the surviving document comes from the highest-priority SOURCE
    (priority = source-name order here; a production run plugs in its
    curated-before-crawl ranking), tie-broken by doc_id — the
    FineWeb-style rule, vs ``dedup_clusters_keep_one``'s plain
    min-id. The keeper is one lexicographic MIN over
    struct(source, doc_id) folded into the same component rollup that
    computes size and source spread — no second pass, no join-back;
    the only join is components-to-metadata, co-keyed on doc_id."""
    from ..operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = ops.jaccard_pairs(
        ops.hashed_shingle(d, "doc_id", "text"), _JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, d.select("doc_id"))
    dd = comp.join(d.select("doc_id", "source"), "doc_id")
    return (
        dd.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("component_size"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.min(F.struct("source", "doc_id")).alias("k"),
        )
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.source").alias("kept_source"),
            "component_size",
            "n_sources",
        )
    )
