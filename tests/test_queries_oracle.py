"""The local mirror of the driver's correctness gate: every registered query
with an oracle is executed on Spark AND DuckDB and exact-compared
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


def _oracle_names():
    from incremental_data_pipeline_spark.plans.queries import ORACLE

    return sorted(ORACLE)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_all_queries_return_rows(spark):
    """Queries without an oracle still must run and return a DataFrame."""
    from incremental_data_pipeline_spark.plans.queries import ORACLE, QUERIES

    for name, fn in QUERIES.items():
        if name in ORACLE:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_text_repetition_filter_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "text_repetition_filter")


def test_repetition_filter_discriminates(spark):
    """The keep flag must actually split a corpus: a clean doc passes, a
    degenerate repeated-token doc fails."""
    from incremental_data_pipeline_spark.operators import text as text_ops

    clean = (
        "the quick brown fox jumps over a lazy dog near the old riverbank today "
        "while seven wild geese wander across frozen meadows seeking better "
        "grain and the farmer watches from his porch with quiet amusement as "
        "evening light settles gently over every distant rolling hill"
    )
    df = spark.createDataFrame(
        [
            (1, clean),
            (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["keep"] for r in text_ops.gopher_repetition_filter(df).collect()}
    assert got == {1: True, 2: False}


def test_sample_stratified_docs_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "sample_stratified_docs")


def test_sample_quota_longest_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "sample_quota_longest")


def test_hash_sample_determinism_and_rate(spark):
    """Same selection under repartitioning; empirical rate near nominal;
    salts decorrelate."""
    from incremental_data_pipeline_spark.operators import sampling
    from incremental_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"] for r in sampling.hash_sample(docs, ["doc_id"], 0.4).collect()}
    b = {
        r["doc_id"]
        for r in sampling.hash_sample(docs.repartition(13), ["doc_id"], 0.4).collect()
    }
    assert a == b  # partitioning-invariant
    n = docs.count()
    assert 0.3 * n < len(a) < 0.5 * n  # rate is honored statistically
    c = {r["doc_id"] for r in sampling.hash_sample(docs, ["doc_id"], 0.4, salt="s2").collect()}
    assert c != a  # independent pass selects a different set


def test_corpus_curation_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "corpus_curation")


def test_jsonl_ingest_docs_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "jsonl_ingest_docs")


def test_time_travel_versions_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "time_travel_versions")


def test_stream_click_purchase_join_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "stream_click_purchase_join")


def test_corpus_vocab_topk_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "corpus_vocab_topk")


def test_doc_chunking_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "doc_chunking")


def test_pack_sequences_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "pack_sequences")


def test_pack_offsets_contiguous(spark):
    """Offsets must tile the token stream: sorted by doc_id, each doc's
    start equals the previous doc's start + n_tokens, beginning at 0."""
    from incremental_data_pipeline_spark.operators import text as text_ops
    from incremental_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    rows = sorted(
        text_ops.pack_offsets(docs).collect(), key=lambda r: r["doc_id"]
    )
    expect = 0
    for r in rows:
        assert r["start_offset"] == expect
        assert r["seq_id"] == expect // 256
        expect += r["n_tokens"]


def test_text_pii_scrub_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "text_pii_scrub")


def test_events_value_outliers_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "events_value_outliers")


def test_pii_scrub_redacts_known_spans(spark):
    from incremental_data_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "reach me at jane.doe+spam@corp.example.io or +44 (20) 7946-0958 now")],
        ["doc_id", "text"],
    )
    r = text_ops.pii_scrub(df).collect()[0]
    assert r["n_redactions"] == 2
    assert r["scrubbed"] == "reach me at [EMAIL] or [PHONE] now"


def test_batch_sessionize_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "batch_sessionize")


def test_rolling_hour_stats_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "rolling_hour_stats")


def test_quality_deciles_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "quality_deciles")


def test_value_histogram_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "value_histogram")


def test_corpus_medallion_e2e_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "corpus_medallion_e2e")


def test_shipping_priority_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "shipping_priority")


def test_retention_cohorts_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "retention_cohorts")


def test_results_invariant_to_shuffle_partitioning(spark):
    """A sample of aggregation/window/dedup queries must produce identical
    results under a different shuffle partition count — any divergence
    means a fold-order-dependent accumulation leaked into an output."""
    from tests.conftest import SF_DIR, normalize
    from incremental_data_pipeline_spark.plans.queries import QUERIES

    names = [
        "pricing_summary",
        "batch_sessionize",
        "dedup_minhash_lsh",
        "revenue_percentiles",
        "text_bigram_coverage",
        "reconcile_orders_copies",
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in names:
                df = QUERIES[name](spark, SF_DIR)
                canon = normalize([tuple(r) for r in df.collect()], df.columns)
                results.setdefault(name, []).append(canon)
        for name, (a, b) in results.items():
            assert a == b, f"{name} diverged across shuffle partition counts"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
