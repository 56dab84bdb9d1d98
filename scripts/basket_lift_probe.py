"""Volume probe for basket_lift at scale points (VERDICT r7 #4).

basket_lift sat just under the above-linear line at the sf1->sf10 step
(9.3x wall for 10x data, SCALE_CLAIMS.md). This probe measures, per SF
dir, every stage's cardinality so the ratio can be attributed: number of
baskets (distinct orders), basket-size distribution (max/p99/mean),
exploded-pair volume sum C(size,2) — the actual pair-generation work —
pairs surviving support>=3, and the output after the top-20 limit. The
scale fixture key-offsets replicas (scripts/make_scale10.py), so basket
SIZES should be invariant across SFs and pair volume should track order
count exactly linearly; any super-linear wall is then runtime overhead
(shuffle width, JIT, GC), not plan shape.

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

from incremental_data_pipeline_spark.plans.queries import QUERIES
from incremental_data_pipeline_spark.session import get_spark
from incremental_data_pipeline_spark.sources.readers import load_table


def probe(spark, sf_dir: str) -> dict:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_partkey")).alias("sz")
    )
    stats = baskets.agg(
        F.count(F.lit(1)).alias("n_baskets"),
        F.max("sz").alias("max_sz"),
        F.expr("percentile_approx(sz, 0.99)").alias("p99_sz"),
        F.avg("sz").alias("mean_sz"),
        F.sum((F.col("sz") * (F.col("sz") - 1) / 2).cast("long")).alias(
            "exploded_pairs"
        ),
    ).collect()[0]
    out = {"sf_dir": sf_dir, **{k: stats[k] for k in stats.asDict()}}
    out["mean_sz"] = round(out["mean_sz"], 2)
    # distinct (a,b) pairs post support>=3 (pre-limit contract output)
    pf = li.select("l_orderkey", "l_partkey").distinct()
    pairs = (
        pf.alias("a")
        .join(pf.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey"), F.col("b.l_partkey"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    out["pairs_support_ge3"] = pairs.filter("support >= 3").count()
    # wall for the actual registry query (noop-forced, post warm-up)
    t0 = time.monotonic()
    QUERIES["basket_lift"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    out["basket_lift_wall_sec"] = round(time.monotonic() - t0, 2)
    return out


def main() -> None:
    import os

    # 24g suffices through sf10; the sf30 point's support-count hash
    # aggregate needs more (measured OOM at 24g, round 9)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(
        app_name="basket_lift_probe",
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": (
                f"-Xms{mem} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
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
