"""Benchmark decontamination for training corpora.

Training data that overlaps an evaluation benchmark silently inflates eval
scores, so every serious corpus build runs a decontamination pass: flag (or
strip) documents sharing verbatim token n-grams with any benchmark document
(the public method used by GPT-3 [Brown et al. 2020, appendix C] and The
Pile — 13-gram collision there; ``n`` is a parameter here because fixture
documents are short).

Scale shape (the part that matters at 100 TB): the benchmark side is a
fixed, small eval suite — its distinct-gram set is collected into a
broadcast hash relation, so the corpus side is ONE narrow explode + a
map-side broadcast join + a combinable count keyed by doc id. The 100 TB
corpus is never shuffled on gram; the only shuffle is the per-doc hit count
on the (already compact) matched subset. Grams can optionally be md5-hashed
before the join to shrink the broadcast to 16 bytes/gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.functions.util import fan_out
from incremental_data_pipeline_spark.operators.dedup import shingles


def _gram_col(text_col: str, n: int, hashed: bool):
    grams = F.array_distinct(shingles(text_col, n))
    if hashed:
        # hash inside the array (a generator can't be nested in md5())
        grams = F.transform(grams, F.md5)
    return F.explode(grams)


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Per-corpus-document contamination report.

    Returns every corpus row's ``id_col`` with ``n_contaminated_grams``
    (count of the document's DISTINCT n-grams that appear in ANY benchmark
    document) and the ``contaminated`` verdict (>= ``min_hits``). Keeping
    every row (zero-hit docs included) makes the output directly joinable
    as a filter mask and lets the oracle check the negatives too.
    """
    bench_grams = (
        benchmark.select(_gram_col(text_col, n, hashed).alias("__g")).distinct()
    )
    # fan_out: the corpus-side shingle explode is compute-dense over a
    # small-bytes scan — without a parallelism floor it runs on one task.
    doc_grams = fan_out(corpus).select(
        id_col, _gram_col(text_col, n, hashed).alias("__g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus rows that survive decontamination (anti-join against the
    contaminated id set — the corpus' full width passes through)."""
    bad = contamination_hits(
        corpus, benchmark, id_col, text_col, n, min_hits
    ).filter(F.col("contaminated"))
    return corpus.join(bad.select(id_col), id_col, "left_anti")
