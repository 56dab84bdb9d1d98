"""Named query registry — the engine's public query surface.

Every operator from SURVEY §2 (plus the LLM-pipeline extensions) is exposed
here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable in
``QUERIES`` with an ANSI-SQL twin in ``ORACLE`` that DuckDB runs on the same
parquet tables. The driver hash-compares the two at sf0.01.

Cross-engine determinism rules used throughout:
- money/quantity sums go through ``DECIMAL(18,2/4)`` (exact, order-independent)
  and are cast back to DOUBLE for a stable schema;
- single floating-point ops (one divide, one multiply) are IEEE-deterministic
  and left raw;
- every computed column is aliased identically in both engines (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dec_sum(col, alias: str, scale: int = 2):
    """Exact, order-independent sum of a double column: decimal-cast partial
    sums are associative/commutative, so the shuffle order can't change the
    result — which makes the value bit-identical to the DuckDB oracle."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Flagship: pricing summary (reference silver ad-hoc agg, silver_notebook.py:47-50,
# generalized to the TPC-H Q1 shape: filter → groupBy → multi-agg → sort).
# --------------------------------------------------------------------------


@query(
    "pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Decimal arithmetic end-to-end: casting the 2-dp source doubles to
    # decimal is unambiguous, and decimal * / - / sum are exact, so the
    # result is bit-identical to the oracle regardless of shuffle order.
    price_d = F.col("l_extendedprice").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(4,2)")
    disc_price = price_d * (one - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (one + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
