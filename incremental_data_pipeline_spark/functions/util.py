"""Plan-shaping utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure at least core-count partitions before a compute-dense narrow
    map (per-row hashing, shingling, vector math).

    Parquet splits are byte-based (`spark.sql.files.maxPartitionBytes`), so a
    small-bytes-but-compute-heavy table (5k documents in one 600 KB file)
    scans as ONE partition and serializes the expensive map on one core. A
    round-robin repartition of the small base table is a cheap shuffle that
    unlocks full parallelism. No-op when the scan is already parallel enough
    (the 100 TB case: thousands of input splits), so the extra shuffle never
    appears where it would actually hurt.
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    # Probe parallelism via the scan's file list — driver-side metadata,
    # no RDD conversion (df.rdd forces a full physical planning pass per
    # call). File count under-estimates split count for large files, which
    # only means the repartition no-ops sooner — the 100 TB case (many
    # files) skips the shuffle either way. Non-file plans (in-memory test
    # frames) report zero files and simply take the cheap repartition.
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)
