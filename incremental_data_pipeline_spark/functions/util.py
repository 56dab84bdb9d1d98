"""Plan-shaping utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lit_array(values, sql_type: str) -> Column:
    """One-call literal for a (possibly nested) numeric array.

    ``F.lit(python_list)`` builds the literal ELEMENT BY ELEMENT over
    py4j — a 16×64 projection matrix costs ~1k driver round-trips
    (~1 s of pure declaration time per use, measured r10) before the
    query is even analyzed. Rendering the same values as one SQL
    ``array(...)`` string and CASTing to the exact target type is a
    single round-trip and a few ms of parsing; the resulting literal
    value is identical, so plans and results are unchanged.

    Ints are emitted with the ``L`` (BIGINT) suffix and floats with the
    ``D`` (DOUBLE) suffix via ``repr`` (shortest round-trip — Spark's
    parser lands on the bit-identical double); the outer CAST restores
    the caller's exact element type (e.g. array<int>).
    """

    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return f"{v}L"
        if isinstance(v, float):
            return f"{v!r}D"
        raise TypeError(f"lit_array: unsupported element {type(v).__name__}")

    return F.expr(f"CAST({render(list(values))} AS {sql_type})")


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
