"""Similarity-search semantics: ANN candidates are a subset of the corpus
scored exactly like brute force; bucket assignment is balanced enough to
actually prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_data_pipeline_spark.operators import similarity
from incremental_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_ann_scores_match_brute_force_for_shared_pairs(spark):
    """For any (query, neighbor) pair both strategies surface, the cosine
    must be identical — same quantized math, bucketing only prunes."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    bf = similarity.brute_force_topk(emb, queries, k=100)
    ann = similarity.lsh_topk(emb, queries, k=3)
    joined = ann.alias("a").join(
        bf.alias("b"),
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.neighbor_id") == F.col("b.neighbor_id")),
    )
    diff = joined.filter(F.col("a.cosine") != F.col("b.cosine")).count()
    assert diff == 0


def test_lsh_buckets_prune(spark):
    """Bucketing must split the corpus (not collapse into one bucket)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    planes = similarity.hyperplanes(8, 64)
    from incremental_data_pipeline_spark.functions.vector import quantize

    b = emb.select(similarity._bucket(quantize("embedding"), planes).alias("bucket"))
    stats = b.groupBy("bucket").count()
    n_buckets = stats.count()
    biggest = stats.agg(F.max("count")).first()[0]
    total = emb.count()
    assert n_buckets > 16
    assert biggest < total * 0.2


def test_multimodal_decode_batch_shape(spark):
    """The Arrow decode path must preserve row count and produce the
    declared schema even on empty partitions."""
    from incremental_data_pipeline_spark.operators import multimodal

    docs = load_table(spark, SF_DIR, "documents").repartition(8)
    out = multimodal.decode_binary_metadata(multimodal.attach_binary(docs))
    assert out.count() == docs.count()
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bytes",
        "first_byte",
        "content_md5",
    ]
