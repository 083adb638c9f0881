"""Adversarial-corpus oracle parity for the quality2 operators.

The sf* corpora are well-behaved (every document has 10-99 plain-ASCII
tokens), so they cannot exercise the edge semantics the operators
promise: empty and whitespace-only documents, single-token documents
(no bigrams), symbol-only text, exact duplicates, numeric-only tokens,
and non-ASCII case folding. This test builds a 10-document parquet
containing exactly those shapes and checks Spark against the DuckDB
oracle on it — the same compare the driver applies, on a corpus
designed to break the operators instead of one designed to be easy.
"""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bend_archiver_spark.queries import REGISTRY

from .oracle_compare import compare_frames

LONG = " ".join(
    f"the quick brown fox w{i} jumps over a lazy dog with energy"
    for i in range(6)
)

DOCS = [
    (0, "", "en", "s1"),
    (1, "   ", "en", "s1"),
    (2, "hello", "en", "s1"),
    (3, "a b", "fr", "s2"),
    (4, "the the the the", "en", "s2"),
    (5, "### ... ###", "zh", "s3"),
    (6, "Héllo Wörld héllo wörld", "de", "s3"),
    (7, "Héllo Wörld héllo wörld", "de", "s3"),
    (8, LONG, "en", "s4"),
    (9, "9 8 7 6 5", "en", "s4"),
]

QUERIES = [
    "text_gopher_quality_rules",
    "text_bigram_lm_bits",
    "pipeline_dsir_importance",
    "text_bpe_merge_candidates",
    "text_bpe_train_merges",
    "agg_kmv_distinct_sketch",
    "pipeline_curate_v2",
    # round-5 third phase: the CDC chunker (empty/whitespace docs
    # produce zero chunks and must drop out identically; the \\x01
    # marker must survive symbol-only and unicode tokens), directed
    # containment (duplicate docs 6/7 contain each other fully; docs
    # under the min-shingle floor must not emit), the vocab-amortized
    # BPE encode, and the cross-source sketch merge.
    "pipeline_cdc_chunks",
    "dedup_containment_pairs",
    "text_bpe_encode_corpus",
    "agg_kmv_merge_sources",
    # round-5 fourth/sixth phase: positional phrase search (empty/
    # whitespace docs tokenize to [''] on both engines; no match rows
    # at all on this corpus — the empty-result parity is the test),
    # exact-substring span coverage (docs under 8 tokens must emit
    # zero coverage through the left join, duplicate docs 6/7 are too
    # short to produce grams), and the langid confusion matrix
    # (division by n_words=1 token edge).
    "text_phrase_search",
    "dedup_span_coverage",
    "text_langid_confusion",
    # round-6: self-entropy (empty/whitespace docs tokenize to [''],
    # single-token docs have zero entropy, doc 4's all-identical
    # tokens are the minimum-bits case), sentence stats (docs with no
    # [.!?] delimiter are one sentence; symbol-only doc 5 is '###'
    # fragments around the dots), the Zipf fit (tiny vocabulary ->
    # few octaves, division guards), novelty (duplicate docs 6/7:
    # only the smaller doc_id owns their shared grams — but both are
    # under the 3-gram floor here, so the empty-result parity is the
    # test), the cluster-size histogram (docs 6/7 form the one size-2
    # cluster), and systematic sampling / interleave on a 10-doc
    # corpus (ranks 1..10, only rank 1 sampled).
    "text_entropy_bits",
    "text_sentence_stats",
    "text_zipf_fit",
    "text_ngram_novelty_rate",
    "dedup_cluster_size_histogram",
    "pipeline_systematic_sample",
    "pipeline_interleave_sources",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": pa.array([r[1] for r in DOCS], pa.string()),
            "lang": pa.array([r[2] for r in DOCS], pa.string()),
            "source": pa.array([r[3] for r in DOCS], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.spark(spark, edge_dir).toPandas()
    spark.catalog.clearCache()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet'"
    )
    duck_pdf = con.execute(spec.oracle).df()
    res = compare_frames(spark_pdf, duck_pdf)
    assert res["rows_match"] and res["cols_match"] and res["values_match"], res
