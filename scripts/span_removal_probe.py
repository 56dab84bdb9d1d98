"""Volume audit for dedup_span_removal at scale points (VERDICT r6 #2).

The docstring claims cost ∝ duplicated text; the committed sf10 artifact
says 18.5x wall for 10x data. This probe turns the claim into measured
counts at each SF dir:

- total sliding k-windows (rows entering the count shuffle — the fixed
  linear cost, shuffled on a 32-char md5 string today);
- distinct window hashes and duplicated-window hashes (>= min_count);
- duplicated-window OCCURRENCES (rows entering the coverage explode,
  x k rows after it);
- covered (doc, pos) rows after distinct;
- affected documents / total documents (the left-semi gate selectivity —
  token explode + rebuild run only for these);
- token rows entering the rebuild (sum of affected docs' n_tokens).

Plus per-stage walls for the two corpus-sized shuffles, min-of-2, in a
pre-touched JVM (bench gotchas: -Xms=-Xmx + AlwaysPreTouch +
ReservedCodeCacheSize, warm-up pass first).

Usage: python scripts/span_removal_probe.py SF_DIR [SF_DIR...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from incremental_data_pipeline_spark.session import get_spark
from incremental_data_pipeline_spark.sources.readers import load_table

K = 10
MIN_COUNT = 2


def probe(spark, sf_dir: str) -> dict:
    docs0 = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    docs = docs0.select(
        "doc_id", toks.alias("__t"), F.size(toks).alias("__n")
    )
    out = {"sf_dir": sf_dir}
    out["n_docs"] = docs.count()
    out["total_tokens"] = docs.agg(F.sum("__n")).collect()[0][0]

    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("__n") >= K,
                F.transform(
                    F.sequence(F.lit(1), F.col("__n") - (K - 1)),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.md5(F.concat_ws(" ", F.slice("__t", i, K))).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<s:int,h:string>>"))
        ).alias("__g"),
    ).select("doc_id", F.col("__g.s").alias("s"), F.col("__g.h").alias("h"))

    t0 = time.monotonic()
    hist = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("distinct_windows"),
            F.sum(F.when(F.col("c") >= MIN_COUNT, 1).otherwise(0)).alias(
                "dup_windows"
            ),
            F.sum(F.when(F.col("c") >= MIN_COUNT, F.col("c"))).alias(
                "dup_occurrences"
            ),
            F.sum("c").alias("total_windows"),
            F.max("c").alias("max_window_count"),
        )
        .collect()[0]
    )
    out["count_shuffle_sec"] = round(time.monotonic() - t0, 1)
    out.update({k: hist[k] for k in hist.asDict()})

    dup_windows = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= MIN_COUNT)
        .select("h")
    )
    t0 = time.monotonic()
    dup_starts = grams.join(dup_windows, "h", "left_semi").select("doc_id", "s")
    covered = dup_starts.select(
        "doc_id",
        F.explode(F.sequence(F.col("s"), F.col("s") + (K - 1))).alias("j"),
    ).distinct()
    cov_stats = covered.groupBy("doc_id").count()
    agg = cov_stats.agg(
        F.count(F.lit(1)).alias("affected_docs"),
        F.sum("count").alias("covered_positions"),
    ).collect()[0]
    out["semi_join_cover_sec"] = round(time.monotonic() - t0, 1)
    out.update({k: agg[k] for k in agg.asDict()})
    out["affected_frac"] = round(out["affected_docs"] / out["n_docs"], 4)
    out["rebuild_token_rows"] = (
        docs.join(cov_stats.select("doc_id"), "doc_id", "left_semi")
        .agg(F.sum("__n"))
        .collect()[0][0]
    )
    return out


def main() -> None:
    spark = get_spark(
        app_name="span_probe",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": (
                "-Xms24g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, "/root/testdata/sf0.1")  # warm-up
    for sf_dir in sys.argv[1:]:
        print(json.dumps(probe(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
