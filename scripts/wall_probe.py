"""Min-of-2 wall-clock probe for registry queries at arbitrary scale
points — the same methodology as the round-8 containment 30x spot-probe
(CONTAINMENT_SCALE.md §6): idle host, local[32], pre-touched heap,
noop-sink force, per-query min of two back-to-back reps with the
rep-spread recorded so scheduler noise is visible.

VERDICT r8 #6 asks for the next two decade-ratio leaders (basket_lift
8.8x, ann_ivf2_topk 8.7x at sf1->sf10) probed at the sf30 point to see
whether fixed-core wall keeps tracking data volume or begins
compounding past the decade table.

Usage:
    python scripts/wall_probe.py --queries basket_lift ann_ivf2_topk \
        --sf-dirs .scale/sf10 .scale/sf30 [--mem 48g] [--reps 2]

Prints ONE JSON line per (query, sf_dir):
    {"query": ..., "sf_dir": ..., "wall_sec": min, "reps": [...],
     "rep_spread": max/min}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--sf-dirs", nargs="+", required=True)
    ap.add_argument("--mem", default="48g")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--warmup-dir",
        default="/root/testdata/sf0.1",
        help="small fixture for the JIT/heap warm-up pass",
    )
    args = ap.parse_args()

    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from incremental_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="wall_probe",
        extra_conf={
            "spark.driver.memory": args.mem,
            "spark.driver.extraJavaOptions": (
                f"-Xms{args.mem} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.monotonic() - t0

    for name in args.queries:
        force(name, args.warmup_dir)  # JIT + heap fault-in, untimed

    for name in args.queries:
        for sf_dir in args.sf_dirs:
            reps = [round(force(name, sf_dir), 2) for _ in range(args.reps)]
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf_dir": sf_dir,
                        "wall_sec": min(reps),
                        "reps": reps,
                        "rep_spread": round(max(reps) / min(reps), 3),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
