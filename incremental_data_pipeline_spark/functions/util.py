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


def observation_result(obs, timeout_s: float = 5.0):
    """Fetch an ``Observation``'s metrics dict, or None if unavailable
    within ``timeout_s``.

    ``Observation.get`` blocks until SOME action has executed over the
    observed DataFrame — forever if the caller's sink never ran one, and
    the public API has no non-blocking probe. So run the supported
    blocking get on a daemon thread and give up after the timeout: the
    caller then falls back to recomputing the aggregate (one extra scan).
    In the common case (the action already ran) the get returns
    immediately; a timed-out getter thread is daemonic and holds nothing
    beyond the listener observe() already registered.
    """
    import threading

    result: list = []

    def fetch() -> None:
        try:
            result.append(obs.get)
        except Exception:
            pass  # e.g. Connect-mode restrictions — caller falls back

    t = threading.Thread(target=fetch, daemon=True, name="observation-probe")
    t.start()
    t.join(timeout_s)
    return result[0] if result else None
