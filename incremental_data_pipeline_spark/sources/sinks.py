"""Sinks: atomic overwrite, idempotent append, layered table paths.

The reference's sinks are Delta MERGE / overwrite + saveAsTable
(gold_dim_branch.py:188-191) and a raw parquet append for silver
(silver_notebook.py:59-62 — re-run ⇒ duplicates, SURVEY §2.9 #7). Without
delta-spark, mutation is emulated as write-new-version + atomic swap:

- ``atomic_overwrite`` materializes the new table version to a temp dir
  FIRST, then swaps directories. This both (a) makes the overwrite atomic
  w.r.t. failures mid-write, and (b) breaks the read-overwrite cycle —
  a plan that reads the current version is fully executed before the
  target is touched (the classic Spark self-overwrite trap; SURVEY §7
  "what's hard" (a)).
- ``idempotent_append`` dedups on a key against rows already in the sink,
  so replaying a batch (at-least-once upstream) cannot duplicate the layer
  — the fix for the reference's append-mode silver.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write ``df`` as the new content of ``path`` via temp-dir + swap."""
    tmp = f"{path}.__tmp__{uuid.uuid4().hex[:8]}"
    old = f"{path}.__old__{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)  # fully materialized before swap
    try:
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
    finally:
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)


def idempotent_append(spark: SparkSession, df: DataFrame, path: str, keys: list[str]) -> None:
    """Append only rows whose key is not already present (replay-safe).

    At scale this anti-join prunes with pushdown on the sink scan; for
    time-keyed layers prefer partitioned tables + dynamic partition
    overwrite, which skips the read entirely.
    """
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*keys)
        fresh = df.join(existing, keys, "left_anti")
    else:
        fresh = df
    fresh.write.mode("append").parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Idempotent partition-level overwrite (dynamic mode): re-running a
    batch rewrites exactly the partitions it touches, nothing else."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_keys: list[str], num_buckets: int = 16
) -> None:
    """Persist as a bucketed managed table: rows are hash-partitioned into
    ``num_buckets`` files per partition BY KEY AT WRITE TIME, so any later
    equi-join or agg on the bucket keys skips its Exchange entirely — the
    pre-shuffle is amortized across every downstream consumer. This is the
    co-located-join design for repeatedly joined 100 TB fact tables.

    Uses the session catalog (in-memory or Hive); bucketing metadata lives
    with the table, Catalyst picks it up automatically.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*bucket_keys)
        .saveAsTable(table)
    )
