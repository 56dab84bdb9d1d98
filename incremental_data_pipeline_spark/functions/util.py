"""Plan-shaping utilities shared by operators."""

from __future__ import annotations

import math
import os

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
            # Outside int64 the L suffix would be an opaque parse error
            # downstream; fail here with the actual offending value.
            if not -(2**63) <= v < 2**63:
                raise ValueError(f"lit_array: int out of BIGINT range: {v}")
            return f"{v}L"
        if isinstance(v, float):
            # repr(nan/inf) renders invalid SQL ('nanD'/'infD'); surface a
            # descriptive error instead of Spark's parser traceback.
            if not math.isfinite(v):
                raise ValueError(f"lit_array: non-finite float: {v!r}")
            return f"{v!r}D"
        raise TypeError(f"lit_array: unsupported element {type(v).__name__}")

    return F.expr(f"CAST({render(list(values))} AS {sql_type})")


# Per-task input floors for data-sized fan_out (r11): a fan-out task that
# holds too few source bytes pays more in fixed per-task cost than its
# compute is worth — ~50-100 ms of Python worker handshake + Arrow framing
# for a mapInPandas task, a few ms of scheduling/codegen for a JVM
# expression task. Sizing the repartition by ceil(input_bytes / floor)
# instead of the core count makes the parallelism track DATA (the same
# rule adaptive_state_partitions applies to streaming state stores): a
# 1 MB payload table gets a handful of tasks on local[32] AND on a
# 4000-core cluster, while a 100 TB table is untouched (its scan already
# has more splits than any target). Env-tunable per deployment; the
# defaults encode the measured local break-even (r10 bench: 32 Arrow
# tasks over ~600 KB ran 3x slower than 8).
FAN_OUT_ARROW_BPT = int(
    os.environ.get("SPARK_GRAFT_FAN_OUT_ARROW_BPT", 128 * 1024)
)
FAN_OUT_CHEAP_MAP_BPT = int(
    os.environ.get("SPARK_GRAFT_FAN_OUT_CHEAP_MAP_BPT", 256 * 1024)
)


def _input_bytes(df: DataFrame, files: list[str]) -> int:
    """On-disk bytes behind a scan, from the driver-side file list."""
    total = 0
    for uri in files:
        path = uri[5:] if uri.startswith("file:") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return -1  # non-local URI — caller falls back to core count
    return total


def fan_out(
    df: DataFrame,
    min_parallelism: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Ensure enough partitions before a compute-dense narrow map
    (per-row hashing, shingling, vector math, Arrow-batched decode).

    Parquet splits are byte-based (`spark.sql.files.maxPartitionBytes`), so a
    small-bytes-but-compute-heavy table (5k documents in one 600 KB file)
    scans as ONE partition and serializes the expensive map on one core. A
    round-robin repartition of the small base table is a cheap shuffle that
    unlocks parallelism. No-op when the scan is already parallel enough
    (the 100 TB case: thousands of input splits), so the extra shuffle never
    appears where it would actually hurt.

    ``bytes_per_task`` caps the fan-out by data volume: the target becomes
    min(cores, ceil(input_bytes / bytes_per_task)), so tiny inputs get few
    tasks regardless of cluster width (per-task fixed cost otherwise
    dominates — the r10 ``multimodal_ahash`` inverse-scaling regression).
    Callers pick the floor by the map's per-byte cost: FAN_OUT_ARROW_BPT
    for Python-boundary maps, FAN_OUT_CHEAP_MAP_BPT for cheap JVM hash
    maps; omit it for maps whose per-byte compute justifies a task per
    core even on KB-scale input (shingle explosion, vector scoring).
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    # Probe parallelism via the scan's file list — driver-side metadata,
    # no RDD conversion (df.rdd forces a full physical planning pass per
    # call). File count under-estimates split count for large files, which
    # only means the repartition no-ops sooner — the 100 TB case (many
    # files) skips the shuffle either way. Non-file plans (in-memory test
    # frames) report zero files and simply take the cheap repartition.
    files = df.inputFiles()
    if bytes_per_task and files:
        nbytes = _input_bytes(df, files)
        if nbytes >= 0:
            want = max(1, -(-nbytes // bytes_per_task))  # ceil
            target = min(target, want)
    if len(files) >= target:
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
