"""Dump `.explain("formatted")` for named registry queries to files.

The optimization-round deliverable: plans/r10/<query>_{before,after}.txt
hold the physical plan of every query a change touched, captured at
sf0.001 (plan SHAPES are data-size independent; streaming/side-effect
queries execute their pipeline first, exactly as scripts/plan_audit.py
does).

Usage:
    python scripts/plan_dump.py --suffix before --out plans/r10 \
        --names q1 q2 ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="+", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from incremental_data_pipeline_spark.session import get_spark

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan_dump", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        df = QUERIES[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
