"""Generic relational operators beyond plain projections/joins/aggs.

These wrap common shapes (top-k per group, dup audit, distinct dim source)
so pipelines compose named operators instead of repeating window/agg
boilerplate. Everything stays declarative — one Catalyst plan, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-k rows per group via partitioned row_number (the scalable top-k:
    partial top-k per map task, final per reduce partition — Catalyst turns
    the rank filter into a WindowGroupLimit so only k rows per group
    survive the shuffle)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def duplicate_audit(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (reference data-quality audit,
    gold_dim_branch.py:200: groupBy(key).count().filter('count > 1'))."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)


def distinct_dim_source(df: DataFrame, cols: list[str]) -> DataFrame:
    """DISTINCT projection used to source a dimension (reference:
    gold_dim_model.py:35-40 — the one notebook that deduplicated)."""
    return df.select(*cols).distinct()
