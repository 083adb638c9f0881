"""Deduplication operators — parameterized library API.

All hashing rides on the portable 60-bit md5-derived hash
(queries/base.py) so results are deterministic across runs, engines,
and partitionings. Scale notes per function; the MinHash path is the
one designed for 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..queries.base import fanout, hash64_expr, ngram_array

__all__ = [
    "ngram_array",
    "exact_dedup",
    "shingle",
    "hashed_shingle",
    "prefix_filter_candidates",
    "jaccard_pairs",
    "pair_intersections",
    "minhash_lsh_dedup",
    "minhash_lsh_cross",
    "simhash_fingerprints",
    "simhash_pairs",
    "simhash_pairs_banded",
]

DEFAULT_PERMS = [
    (695425565, 2035525362), (323946140, 847876999),
    (1397871145, 103694312), (155555738, 1763673106),
    (1150797846, 202142728), (785310973, 1251527726),
    (124551739, 1953574602), (1089709947, 461060838),
    (80521325, 184570285), (931247022, 898017869),
    (150013384, 516819858), (194804717, 1183364967),
    (911648020, 126938843), (1775651416, 1214302567),
    (265862674, 2034632750), (479402029, 1354258844),
]
P31 = 2147483647  # modulus: products stay < 2^62 in int64


def _norm(text_col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by normalized content hash: (content_key,
    keeper_doc, n_copies) per distinct content. One map-side-combined
    shuffle on the 128-bit key — the cheapest dedup at any scale."""
    return df.groupBy(
        F.md5(_norm(F.col(text_col))).alias("content_key")
    ).agg(
        F.min(id_col).alias("keeper_doc"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingle(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles: (id, tok). The shared front end
    of the Jaccard / MinHash / SimHash pipelines.

    The input is fanned out to full parallelism first: a small-file
    corpus otherwise arrives as ONE partition and the explode+hash —
    the most expensive per-row work in the pipeline — serializes on a
    single core (measured 10x slowdown). The repartition shuffles only
    the compact pre-explode rows."""
    df = fanout(df)
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    shingles = ngram_array(arr, n)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("tok"))
        .distinct()
    )


def hashed_shingle(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """:func:`shingle` with each distinct shingle replaced by its
    portable 60-bit hash: (doc_id, tok bigint).

    The Jaccard/containment verification unit for scale paths — int64
    keys shuffle and spill ~3x less than multi-word trigram strings,
    and the prefix machinery's (df, tok) rarest-first order stays a
    total order over bigints. Distinct-on-strings happens FIRST;
    a within-document hash collision therefore yields two (doc_id,
    tok) rows with the same tok value — neither engine re-distincts
    after hashing, so the duplicate rows inflate COUNT-based sizes
    and intersections IDENTICALLY on both sides (same md5-derived
    hash in the DuckDB oracles) and pair-level parity holds;
    cross-document collision odds are ~|toks|^2/2^61 — the same
    accepted argument as the MinHash path's hashed verification
    (minhash_lsh_dedup). The 100x rehearsal motivated this: trigram
    STRING intermediates pushed the oracle's spill past the
    container's disk."""
    toks = shingle(df, id_col, text_col, n)
    return toks.select(
        "doc_id", hash64_expr(F.col("tok")).alias("tok")
    )


def prefix_filter_candidates(
    toks: DataFrame, threshold: float
) -> DataFrame:
    """EXACT candidate generation for set-Jaccard >= *threshold* by
    prefix filtering (Chaudhuri 2006; Vernica 2010, the MapReduce
    set-similarity join): order each document's tokens globally
    rarest-first, keep only the first ``n - ceil(t*n) + 1`` tokens,
    and join documents that share a PREFIX token.

    Exactness: J(A,B) >= t implies |A∩B| >= t*|A∪B| >= t*|A|, so at
    least ceil(t*|A|) tokens are shared; in ANY total order a set
    sharing that many elements must expose one within its first
    |A| - ceil(t*|A|) + 1 — hence every qualifying pair collides on
    some prefix token, and the candidate set is a strict superset of
    the answer (no recall loss, unlike LSH banding).

    On top of the prefix join, collision rows pass the PPJoin
    length and positional filters (Xiao 2008) before the pair
    DISTINCT — both exact by the same first-common-token argument:

    - length: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
      (|A∩B| <= min, |A∪B| >= max), so size-mismatched pairs drop.
    - positional: let the FIRST common token in the global
      rarest-first order sit at rank i in A and j in B. The other
      o-1 shared tokens all rank strictly after it in BOTH docs, so
      o <= 1 + min(|A|-i, |B|-j); J >= t needs o >= t*(|A|+|B|)/(1+t),
      and the first common token provably sits inside both prefixes
      (it has >= o-1 >= ceil(t*n)-1 followers, so its rank is inside
      the n-ceil(t*n)+1 prefix). Hence every qualifying pair keeps at
      least its first-common-token collision row, and filtering ALL
      collision rows by the bound never drops a true pair. At t=0.5
      — where prefixes keep half of every document — this is the
      filter that matters: late-prefix collisions between documents
      that cannot reach the threshold are dropped before the
      DISTINCT and the verify join ever see them.

    Scale: the raw token-equality join is quadratic in per-token
    document frequency — a hot shingle's posting list self-joins
    (the shape that exhausted 78 GB of DuckDB temp disk at the 100x
    rehearsal). Rarest-first ordering pushes exactly those hot
    tokens OUT of the prefixes, so posting lists entering the join
    are the short ones by construction. The epsilon inside ceil()
    guards the float product from rounding UP past the true rational
    bound (which would shorten a prefix and break exactness); the
    epsilons on the length/positional bounds only LOOSEN the filters
    (a kept extra candidate is re-checked by exact verification;
    a dropped true pair would be a bug), which is the safe side."""
    from pyspark.sql import Window

    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id")
    ranked = (
        toks.join(freq, "tok")
        .withColumn("rn", F.row_number().over(w_doc.orderBy("df", "tok")))
        .withColumn("n", F.count(F.lit(1)).over(w_doc))
    )
    plen = (
        F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("rn") <= plen).select(
        "doc_id", "tok", "rn", "n"
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "tok",
        F.col("rn").alias("rn_a"),
        F.col("n").alias("na"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "tok",
        F.col("rn").alias("rn_b"),
        F.col("n").alias("nb"),
    )
    ubound = F.lit(1) + F.least(
        F.col("na") - F.col("rn_a"), F.col("nb") - F.col("rn_b")
    )
    return (
        pa.join(pb, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("na", "nb")
            >= F.lit(threshold) * F.greatest("na", "nb") - F.lit(1e-9)
        )
        .filter(
            ubound * F.lit(1.0 + threshold)
            >= F.lit(threshold) * (F.col("na") + F.col("nb")) - F.lit(1e-9)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def prefix_filter_candidates_directed(
    toks: DataFrame, threshold: float
) -> DataFrame:
    """EXACT candidate generation for directed containment
    ``C(A->B) = |A∩B| / |A| >= threshold`` — the asymmetric variant of
    :func:`prefix_filter_candidates`: only the CONTAINED side A is
    prefix-reduced; B keeps its full token set, because the bound
    ``|A∩B| >= ceil(t*|A|)`` says nothing about B's size.

    Exactness: if all shared tokens avoided A's rarest-first prefix of
    length ``|A| - ceil(t*|A|) + 1``, at most ``ceil(t*|A|) - 1`` of
    them would fit in the remainder — fewer than the bound requires —
    so some shared token sits in A's prefix and collides with B's full
    set. Candidates are ordered (doc_a, doc_b) pairs, a != b, a strict
    superset of every qualifying directed pair.

    Collision rows additionally pass the directed length and
    positional filters (the PPJoin bounds of
    :func:`prefix_filter_candidates`, asymmetric form) before the
    pair DISTINCT — exact by the same first-common-token argument:

    - length: |B| >= |A∩B| >= ceil(t*|A|), so containers smaller
      than t*|A| drop.
    - positional: the first common token (global rarest-first order)
      at rank i in A and j in B bounds the overlap by
      o <= 1 + min(|A|-i, |B|-j) (the other o-1 shared tokens rank
      strictly after it in both), and it provably sits inside A's
      prefix; C >= t needs o >= t*|A|. B is NOT prefix-reduced, so
      its rank j is over the full token set — every qualifying pair
      keeps its first-common-token row.

    Scale: hot tokens are pushed out of the PREFIX side, so the join
    cost is sum_tok(prefix_df * df) instead of the self-join's df^2 —
    the quote/excerpt detector stays runnable when one boilerplate
    shingle appears in half the corpus; the positional filter then
    drops the late-in-both collisions that dominate when thresholds
    are low and documents long."""
    from pyspark.sql import Window

    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id")
    ranked = (
        toks.join(freq, "tok")
        .withColumn("rn", F.row_number().over(w_doc.orderBy("df", "tok")))
        .withColumn("n", F.count(F.lit(1)).over(w_doc))
    )
    plen = (
        F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("rn") <= plen).select(
        F.col("doc_id").alias("doc_a"),
        "tok",
        F.col("rn").alias("rn_a"),
        F.col("n").alias("na"),
    )
    full = ranked.select(
        F.col("doc_id").alias("doc_b"),
        "tok",
        F.col("rn").alias("rn_b"),
        F.col("n").alias("nb"),
    )
    ubound = F.lit(1) + F.least(
        F.col("na") - F.col("rn_a"), F.col("nb") - F.col("rn_b")
    )
    need = F.lit(threshold) * F.col("na") - F.lit(1e-9)
    return (
        prefix.join(full, "tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .filter(F.col("nb") >= need)
        .filter(ubound >= need)
        .select("doc_a", "doc_b")
        .distinct()
    )


def pair_intersections(
    toks: DataFrame,
    candidates: DataFrame,
    lists: DataFrame | None = None,
) -> DataFrame:
    """Exact per-pair intersection sizes: ``(doc_a, doc_b, n_inter,
    na, nb)`` for every candidate pair with ``n_inter >= 1``, via
    per-document token ARRAYS and one ``array_intersect`` per pair.

    Two 1-row-per-doc hash joins replace the exploded token re-join
    + (doc_a, doc_b) hash aggregate: the old shape shuffled
    ``candidates x avg_doc_len`` rows into a GROUP BY (at the 100x
    rehearsal, ~600M rows — the dominant verify spill on both
    engines); this shape shuffles the candidate pairs once and the
    1-row-per-doc list table twice, and the intersection itself is
    JVM-side per-row work. The DuckDB oracle twin is
    ``list_intersect`` over ``list(tok)`` (queries.dedup.
    _prefix_inter_sql) — BOTH engines use distinct-set intersection
    semantics, so even a within-document 60-bit hash collision
    (duplicate (doc_id, tok) rows, ~|toks|^2/2^61) cannot diverge
    them; ``na``/``nb`` count rows (duplicates included) identically
    on both sides.

    ``lists`` (doc_id, n, lst) can be passed when the caller already
    holds per-document token arrays (the MinHash paths carry ``hvs``
    from the signature front end) — then ``toks`` is not touched and
    the groupBy disappears entirely."""
    if lists is None:
        lists = toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.collect_list("tok").alias("lst"),
        )
    la = lists.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("lst").alias("lst_a"),
    )
    lb = lists.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("lst").alias("lst_b"),
    )
    return (
        candidates.join(la, "doc_a")
        .join(lb, "doc_b")
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("lst_a", "lst_b")).cast("bigint"),
        )
        .filter(F.col("n_inter") > 0)
        .select("doc_a", "doc_b", "n_inter", "na", "nb")
    )


def jaccard_pairs(
    toks: DataFrame,
    threshold: float,
    candidates: DataFrame | None = None,
    lists: DataFrame | None = None,
) -> DataFrame:
    """Exact set-Jaccard pairs over a shingle table (doc_id, tok).
    With ``candidates`` (doc_a, doc_b) the verification touches
    candidate pairs only — the verification stage of MinHash-LSH.
    Without, candidates come from :func:`prefix_filter_candidates`
    (exact — identical output to the raw token self-join, without its
    quadratic hot-token blowup). Verification is
    :func:`pair_intersections` (per-doc arrays + array_intersect —
    no exploded re-join); ``lists`` is forwarded to it when the
    caller already holds the per-doc arrays."""
    if candidates is None:
        # persist: the prefix machinery adds two more consumers of
        # the token stream (global frequency + the ranked join) on
        # top of the per-doc list aggregation — without a barrier
        # each one re-derives the corpus shingle explode. No-op if
        # the caller already persisted. Callers clear cache between
        # queries.
        from pyspark import StorageLevel

        if toks.storageLevel == StorageLevel.NONE:
            toks = toks.persist()
        candidates = prefix_filter_candidates(toks, threshold)
    inter = pair_intersections(toks, candidates, lists=lists)
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return inter.select(
        "doc_a", "doc_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int,
    perms: list[tuple[int, int]],
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash front end: returns ``(with_h, sig)`` where
    ``with_h`` is (doc_id, hvs: array<bigint>) — the 60-bit hashes of
    the document's distinct word n-gram shingles — and ``sig`` is
    (doc_id, s0..s{k-1}, n) — the permutation minima plus shingle
    count. Entirely map-side (array HOFs, no explode/groupBy);
    ``persist`` materializes ``with_h`` as the plan barrier that
    stops CollapseProject from inlining the shingle+md5 work into
    every downstream consumer."""
    src = fanout(df)
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    sh = ngram_array(arr, ngram)
    hvs = F.transform(
        F.array_distinct(sh), lambda s: hash64_expr(s) % P31
    )
    with_h = src.select(
        F.col(id_col).alias("doc_id"), hvs.alias("hvs")
    )
    if persist:
        with_h = with_h.persist()
    sig = with_h.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    F.col("hvs"), lambda h: (F.lit(a) * h + F.lit(b)) % P31
                )
            ).alias(f"s{i}")
            for i, (a, b) in enumerate(perms)
        ],
        F.size("hvs").alias("n"),
    )
    return with_h, sig


def minhash_bands(sig: DataFrame, n_sigs: int, n_bands: int) -> DataFrame:
    """LSH banding over a signature table: (doc_id, band_idx,
    band_key) with ``n_bands`` keys per document, each concatenating
    ``n_sigs // n_bands`` signature minima. A cheap per-row explode —
    the band-key equi-join downstream is what replaces the O(n^2)
    pair enumeration."""
    rows_per_band = n_sigs // n_bands
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[F.col(f"s{j * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for j in range(n_bands)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(band_keys).alias("band_idx", "band_key")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    ngram: int = 3,
    perms: list[tuple[int, int]] | None = None,
    n_bands: int = 4,
    persist_shingles: bool = True,
) -> DataFrame:
    """MinHash + LSH near-dup pairs with exact-Jaccard verification.

    signatures: ``len(perms)`` array minima over the map-side shingle
    hash array. banding: ``n_bands`` keys per doc, candidates = band
    collisions. verification: exact Jaccard on candidates only. Never
    materializes O(n^2) — the 100 TB path.

    ``persist_shingles`` (default on) materializes the (doc_id, hvs)
    projection as a plan barrier. Without it Catalyst's CollapseProject
    inlines the expensive ``hvs`` expression (shingle split + md5 per
    shingle) into all 17 downstream consumers — ~17x the per-document
    hash work, measured 3-5x wall-clock at sf0.1. The persist is
    MEMORY_AND_DISK and holds only (id, int64 array) — bounded by the
    corpus's shingle count, spilling rather than OOMing at scale; pass
    False only for one-shot plans that are never reused. The cache is
    not unpersisted here (the caller materializes the returned lazy
    plan); long-lived sessions running many such queries should
    ``spark.catalog.clearCache()`` between them, as bench.py does —
    eviction is otherwise LRU within the storage pool.
    """
    perms = perms or DEFAULT_PERMS
    # Signatures are computed ENTIRELY map-side with array HOFs: the
    # distinct shingle set, its 60-bit hashes, and the 16 permutation
    # minima all live inside one projection — no explode, no distinct
    # shuffle, no groupBy. Semantically identical to the exploded
    # formulation (distinct on shingle STRINGS first, then hash, so a
    # hash collision inside a doc behaves the same as the row form and
    # the oracle); the first exchange in the whole plan is the band
    # join. Arrays are bounded by document size, so per-row state is
    # fine at 100 TB (multi-MB docs -> thousands of shingles).
    with_h, sig = minhash_signatures(
        df, id_col, text_col, ngram, perms, persist=persist_shingles
    )
    bands = minhash_bands(sig, len(perms), n_bands)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    cand = (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify on the 60-bit shingle hashes, not the strings — and
    # straight from the per-doc hvs ARRAYS the signature front end
    # already carries: no explode, no re-groupBy; array_intersect
    # per candidate pair (collision odds ~(n^2)/2^61 — negligible,
    # and distinct-set semantics match the oracle's list_intersect)
    lists = with_h.select(
        "doc_id",
        F.size("hvs").cast("bigint").alias("n"),
        F.col("hvs").alias("lst"),
    )
    return jaccard_pairs(
        with_h, threshold, candidates=cand, lists=lists
    )


def minhash_lsh_cross(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    ngram: int = 3,
    perms: list[tuple[int, int]] | None = None,
    n_bands: int = 4,
    persist_shingles: bool = True,
) -> DataFrame:
    """Cross-corpus MinHash decontamination: near-dup pairs between a
    large ``corpus`` and a small held-out ``bench`` set (an eval
    suite), with exact-Jaccard verification of band-collided
    candidates. Returns (doc_id, bench_id, jaccard) — the documents a
    training pipeline must drop to avoid benchmark leakage.

    The asymmetry IS the scale design: the bench side is tiny by
    definition, so its band table and shingle-hash table are
    explicitly broadcast — the corpus side is touched by exactly one
    map-side band join (no shuffle of corpus data to find candidates)
    plus the candidate-only verification joins. Ids must be disjoint
    across the two inputs (the verification reuses jaccard_pairs over
    the union of both hash streams keyed by id)."""
    perms = perms or DEFAULT_PERMS
    wh_c, sig_c = minhash_signatures(
        corpus, id_col, text_col, ngram, perms, persist=persist_shingles
    )
    # bench is small: skip the persist barrier (one extra evaluation
    # of a tiny projection beats holding executor storage for it)
    wh_b, sig_b = minhash_signatures(
        bench, id_col, text_col, ngram, perms, persist=False
    )
    bands_c = minhash_bands(sig_c, len(perms), n_bands)
    bands_b = minhash_bands(sig_b, len(perms), n_bands)
    cand = (
        bands_c.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
        .join(
            F.broadcast(
                bands_b.select(
                    F.col("doc_id").alias("doc_b"), "band_idx", "band_key"
                )
            ),
            ["band_idx", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    wh = wh_c.unionByName(wh_b)
    lists = wh.select(
        "doc_id",
        F.size("hvs").cast("bigint").alias("n"),
        F.col("hvs").alias("lst"),
    )
    pairs = jaccard_pairs(wh, threshold, candidates=cand, lists=lists)
    return pairs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("bench_id"),
        "jaccard",
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    bits: int = 60,
) -> DataFrame:
    """SimHash fingerprints: (doc_id, simhash) — majority vote per bit
    over shingle hashes. One groupBy pipeline; the fingerprint is a
    drop-in clustering/banding key at scale."""
    toks = shingle(df, id_col, text_col, ngram)
    h = toks.select("doc_id", hash64_expr(F.col("tok")).alias("hv"))
    bit_rows = h.select(
        "doc_id",
        "hv",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    )
    contrib = F.when(F.expr("(hv >> bit) & 1") == 1, F.lit(1)).otherwise(
        F.lit(-1)
    )
    sums = bit_rows.groupBy("doc_id", "bit").agg(F.sum(contrib).alias("s"))
    return sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_pairs(sims: DataFrame, hamming_max: int) -> DataFrame:
    """Pairs within a Hamming radius over (doc_id, simhash). Direct
    self-join here; at scale, pre-group by simhash prefix bands so
    only prefix-sharing pairs are compared."""
    sa = sims.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    sb = sims.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
    return (
        sa.crossJoin(sb)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
    )

def simhash_pairs_banded(
    sims: DataFrame,
    hamming_max: int,
    bits: int = 60,
) -> DataFrame:
    """Scale path for :func:`simhash_pairs` — TWO-LEVEL pigeonhole
    (the HmSearch / Manku-style multi-index shape): split each
    fingerprint into few WIDE blocks and match each block within a
    small inner radius, instead of ``hamming_max + 1`` narrow bands
    matched exactly.

    Why: exact single-level banding needs ``hamming_max + 1`` bands,
    and at hamming_max = 10 over 60 bits that is eleven 6-bit bands —
    64 buckets per band, so candidate volume is ~n^2/64 per band:
    MORE work than the brute self-join once n is large (measured at
    500k docs: 1.45e9 band collisions vs 1.25e9 brute pairs vs 3.9e7
    two-level candidates — 37x under brute).

    Level 1: ``n_blocks`` blocks with ``floor(hamming_max/n_blocks)``
    = inner radius r <= 2 (n_blocks = ceil((hamming_max+1)/3)); by
    pigeonhole a qualifying pair has SOME block with Hamming <= r.
    Level 2: enumerate the radius-r ball of each block value on ONE
    side (1 + w + C(w,2) variants at r=2) and join against the other
    side's identity value — ``d(A,B) <= r  iff  B in ball_r(A)``, so
    ball-side x identity-side collisions are a complete candidate
    set. Exact Hamming verification then gives output identical to
    the direct self-join. Wide blocks spread the corpus over 2^15
    buckets instead of 2^6, which is what kills the collision term.

    Falls back to classic ``hamming_max + 1`` exact-match bands when
    they stay wide (>= 12 bits), where equality banding is cheaper
    than ball expansion (e.g. production radii of 3 on 64 bits)."""
    n_bands = hamming_max + 1
    if bits // n_bands >= 12:
        band_width = (bits + n_bands - 1) // n_bands
        mask = (1 << band_width) - 1
        bands = sims.select(
            "doc_id",
            "simhash",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_bands - 1))
            ).alias("band_idx"),
        ).select(
            "doc_id",
            "simhash",
            "band_idx",
            F.expr(
                f"(simhash >> (band_idx * {band_width})) & {mask}"
            ).alias("band_val"),
        )
        ba = bands.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sim_a"),
            "band_idx",
            "band_val",
        )
        bb = bands.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sim_b"),
            "band_idx",
            "band_val",
        )
        cand = (
            ba.join(bb, ["band_idx", "band_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sim_a", "sim_b")
            .distinct()
        )
    else:
        n_blocks = max(1, -(-n_bands // 3))  # ceil((h+1)/3) -> r <= 2
        n_blocks = min(n_blocks, bits)  # every block must own >= 1 bit
        radius = hamming_max // n_blocks
        base, rem = divmod(bits, n_blocks)
        if rem == 0:
            # uniform-width fast path (the registered 60/4 config):
            # constant fold-able offsets/masks, no padding bits exist
            bw_sql = str(base)
            off_sql = f"(block_idx * {base})"
        else:
            # balanced widths: first `rem` blocks get base+1 bits —
            # the blocks PARTITION the fingerprint exactly, so the
            # ball never flips padding bits beyond the real block
            # width (which would generate candidates that can never
            # match the identity side — wasted explode/join work)
            bw_sql = (
                f"({base} + CASE WHEN block_idx < {rem}"
                f" THEN 1 ELSE 0 END)"
            )
            off_sql = f"(block_idx * {base} + LEAST(block_idx, {rem}))"
        mask_sql = f"(shiftleft(1L, {bw_sql}) - 1)"
        blocks = sims.select(
            "doc_id",
            "simhash",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_blocks - 1))
            ).alias("block_idx"),
        ).select(
            "doc_id",
            "simhash",
            "block_idx",
            F.expr(f"(simhash >> {off_sql}) & {mask_sql}").alias("v"),
        )
        # radius-r ball of v as an array expression (r <= 2 by
        # construction: identity + single flips + ordered double
        # flips) — per-row state bounded by 1 + w + C(w,2)
        ball_terms = ["array(v)"]
        if radius >= 1:
            ball_terms.append(
                f"transform(sequence(0, {bw_sql} - 1),"
                f" i -> v ^ shiftleft(1L, i))"
            )
        if radius >= 2:
            # guard bw = 1: sequence(0, -1) would enumerate [0, -1]
            double = (
                f"flatten(transform(sequence(0, {bw_sql} - 2), i ->"
                f" transform(sequence(i + 1, {bw_sql} - 1), j ->"
                f" v ^ shiftleft(1L, i) ^ shiftleft(1L, j))))"
            )
            ball_terms.append(
                f"CASE WHEN {bw_sql} >= 2 THEN {double}"
                f" ELSE CAST(array() AS ARRAY<BIGINT>) END"
                if base < 2
                else double
            )
        ball = F.expr(f"concat({', '.join(ball_terms)})")
        ba = blocks.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sim_a"),
            "block_idx",
            F.explode(ball).alias("v"),
        )
        bb = blocks.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sim_b"),
            "block_idx",
            "v",
        )
        cand = (
            ba.join(bb, ["block_idx", "v"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sim_a", "sim_b")
            .distinct()
        )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= hamming_max
    )
