"""Volume probe for embedding_near_dup_auto at scale points (VERDICT r6 #1).

Measures, per SF dir: N, auto B, per-table bucket-occupancy stats
(max/top totals), candidate-pair volume sum(occ*(occ-1)/2) per table,
post-union candidate count, confirmed pairs (cosine>=0.3) = output rows.
All as ONE pass of cheap aggregations — no pair materialization beyond
what the query itself does.

JVM discipline per memory: -Xms=-Xmx + AlwaysPreTouch (bench gotcha r5),
plus a warm-up run before any timing.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from incremental_data_pipeline_spark.session import get_spark
from incremental_data_pipeline_spark.operators import similarity as sim
from incremental_data_pipeline_spark.sources.readers import load_table


def probe(spark, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    b = sim.auto_planes(n, target_occupancy=64)
    out = {"sf_dir": sf_dir, "n_rows": n, "auto_planes": b}
    cand_total = 0
    for t in range(2):
        planes = sim.hyperplanes(b, 64, t)
        bk = emb.select(
            sim.let(
                sim.quantize("embedding"), lambda v: sim._bucket(v, planes)
            ).alias("bucket")
        )
        occ = bk.groupBy("bucket").count()
        stats = occ.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("count").alias("max_occ"),
            F.expr("percentile_approx(count, 0.99)").alias("p99_occ"),
            F.sum((F.col("count") * (F.col("count") - 1) / 2).cast("long")).alias(
                "cand_pairs"
            ),
        ).collect()[0]
        out[f"table{t}"] = {k: stats[k] for k in stats.asDict()}
        cand_total += stats["cand_pairs"]
    out["cand_pairs_2tables"] = cand_total
    # distinct candidate pairs after cross-table dedup + confirmed output
    res = sim.embedding_near_dup(
        emb, threshold=0.3, num_tables=2, target_occupancy=64
    )
    t0 = time.monotonic()
    out["confirmed_pairs"] = res.count()
    out["confirm_count_sec"] = round(time.monotonic() - t0, 1)
    return out


def main() -> None:
    spark = get_spark(
        app_name="near_dup_probe",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": (
                "-Xms24g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JIT + heap fault-in on a small pass
    probe(spark, "/root/testdata/sf0.1")
    for sf_dir in sys.argv[1:]:
        print(json.dumps(probe(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
