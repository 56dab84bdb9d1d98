"""Run one registered query by name and print its result — the
developer/debug CLI for the query registry.

Usage:
  python scripts/run_query.py NAME [SF_DIR] [--explain] [--oracle]

NAME     a key of the registry (see `python scripts/run_query.py --list`)
SF_DIR   fixture directory (default /root/testdata/sf0.001)
--explain  also print the formatted physical plan
--oracle   also run the DuckDB oracle twin and report row counts
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from incremental_data_pipeline_spark.plans.queries import ORACLE, QUERIES

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if "--list" in flags or not args:
        for name in sorted(QUERIES):
            print(name, "" if name in ORACLE else "(rows-only)")
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    if name not in QUERIES:
        sys.exit(f"unknown query {name!r} — try --list")

    from incremental_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"run_{name}", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(50, truncate=False)
    n = df.count()
    print(f"{name}: {n} rows")
    if "--oracle" in flags and name in ORACLE:
        import duckdb

        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        rows = con.execute(ORACLE[name]).fetchall()
        print(f"oracle: {len(rows)} rows -> match={len(rows) == n}")
    spark.stop()


if __name__ == "__main__":
    main()
