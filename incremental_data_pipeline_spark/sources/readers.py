"""Table readers over the parquet fixture layout.

Mirrors the reference's scan surface (SURVEY §2.1 S5-S7): parquet scans,
SQL-over-files, catalog-table scans — all funnel into ``spark.read.parquet``
so Catalyst gets pushdown/pruning on every path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (reference: silver_notebook.py:7-9 parquet scan)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL API path
    (reference: gold_dim_branch.py:32-37 `SELECT ... FROM PARQUET.path`)."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
