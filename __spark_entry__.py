"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``incremental_data_pipeline_spark.plans.queries`` — the
engine's named-query registry. The driver's verify runs ``entry(spark)`` as
a smoke check, runs each ``queries()[name]`` at sf=0.01 and compares it
against the matching ``oracle_sql()[name]`` via DuckDB.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from incremental_data_pipeline_spark.plans.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return dict(ORACLE)
