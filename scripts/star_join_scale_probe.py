"""Capture star_join's EXECUTED (AQE-final) plan and wall time at a scale
point — the evidence for why the 100x step's ratio moves superlinearly.

The hypothesis under test (VERDICT r5): at sf10 the orders side outgrows
the broadcast threshold, so AQE flips the orderkey join from
broadcast-hash (zero shuffle) to shuffle/sort-merge — two fact-sized
exchanges appear that sf1 never pays, and the per-query ratio reflects a
STRATEGY change at the size margin, not a code regression. A forced
broadcast would be worse: a fact-sized hash relation per task OOMs at
cluster scale (measured in round 5; see the star_join docstring).

Usage:
    python scripts/star_join_scale_probe.py <sf_dir> [driver_mem] [shuffle_parts]

Prints ONE JSON line:
    {"sf_dir": ..., "seconds": min-of-2, "joins": {"part": "...",
     "supplier": "...", "orders": "..."}, "exchanges": N,
     "orders_bytes": int, "threshold": "10485760b"}

Run each sf point in a FRESH process (heap sizing differs); the harness
uses the same honest-JVM settings as bench.py (pre-touched fixed heap,
1g code cache) so the timing is comparable to the committed artifacts.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    mem = sys.argv[2] if len(sys.argv) > 2 else "12g"
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from incremental_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="star_join_probe",
        master="local[32]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": (
                f"-Xms{mem} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> tuple[float, str]:
        df = QUERIES["star_join"](spark, sf_dir)
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        # executedPlan AFTER the action = the AQE-final strategy choices
        return dt, df._jdf.queryExecution().executedPlan().toString()

    t1, _ = run()          # warm-up (JIT, page cache)
    t2, plan = run()
    seconds = min(t1, t2)

    def strategy(build_key: str) -> str:
        for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
            for m in re.finditer(re.escape(node) + r"[^\n]*", plan):
                if build_key in m.group(0):
                    return node
        return "NOT_FOUND"

    orders_bytes = -1
    try:
        orders_bytes = sum(
            f.stat().st_size
            for f in __import__("pathlib").Path(sf_dir, "orders.parquet").rglob("*")
            if f.is_file()
        )
    except OSError:
        pass

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "seconds": round(seconds, 2),
                "both_iters": [round(t1, 2), round(t2, 2)],
                "joins": {
                    "part": strategy("p_partkey"),
                    "supplier": strategy("s_suppkey"),
                    "orders": strategy("o_orderkey"),
                },
                "exchanges": plan.count("Exchange "),
                "orders_parquet_bytes": orders_bytes,
                "broadcast_threshold": spark.conf.get(
                    "spark.sql.autoBroadcastJoinThreshold"
                ),
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
