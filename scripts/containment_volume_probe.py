"""Measure the containment dedup's candidate volume against its true
pair count at a scale point — the number that decides whether the
verification join (one array_intersect per candidate) is within a
constant factor of the minimum possible work.

VERDICT r5 flagged the containment pair as the top sf10 cost
(105 s capped / 127 s lossless) and asked for either a structural trim
or a committed note showing candidate volume is already within ~2x of
the true pair count (in which case the prefix+positional filters are
doing their job and the remaining cost IS the answer, not overhead).

Usage:
    python scripts/containment_volume_probe.py <sf_dir> [driver_mem]

Prints ONE JSON line per variant (capped / lossless):
    {"variant": ..., "n_candidates": ..., "n_pairs": ...,
     "cand_per_pair": ..., "seconds_full_query": ...}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    mem = sys.argv[2] if len(sys.argv) > 2 else "12g"

    from incremental_data_pipeline_spark.operators import dedup
    from incremental_data_pipeline_spark.session import get_spark
    from incremental_data_pipeline_spark.sources.readers import load_table

    spark = get_spark(
        app_name="containment_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": (
                f"-Xms{mem} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # match the registered queries' parameters exactly:
    # dedup_containment      -> threshold=0.7, max_df=10000 (capped)
    # dedup_prefix_containment -> threshold=0.7, max_df=None (lossless)
    for variant, max_df in (("capped_10000", 10000), ("lossless", None)):
        t0 = time.monotonic()
        s, cand = dedup._prefix_containment_candidates(
            docs, "doc_id", "text", 3, 0.7, max_df
        )
        n_cand = cand.count()
        full = dedup.prefix_filter_containment_pairs(
            docs, "doc_id", "text", n=3, threshold=0.7, max_df=max_df
        )
        n_pairs = full.count()
        dt = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "variant": variant,
                    "n_candidates": n_cand,
                    "n_pairs": n_pairs,
                    "cand_per_pair": round(n_cand / max(n_pairs, 1), 2),
                    "seconds_counts": round(dt, 2),
                },
                sort_keys=True,
            )
        )
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
