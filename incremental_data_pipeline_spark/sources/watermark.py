"""High-water-mark watermark state — the reference's CDC control plane.

Rebuilds watermark_table.sql + stored_procedure.sql + the ADF
Lookup→Copy→Update flow (docs/incremental_load.PNG) as a tiny state store +
a batch runner:

- state is a 1-row parquet table (like the reference's 1-row SQL table);
- a batch processes the half-open window ``(last_load, current_load]``;
- the watermark advances ONLY after the batch's writes succeed
  (write-after-commit ordering ⇒ at-least-once; pair with an idempotent
  sink for effectively-exactly-once). The reference's sproc had
  BEGIN TRANSACTION without COMMIT (SURVEY §2.9 #6) — here the advance is
  an atomic swap.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.functions.util import observation_result
from incremental_data_pipeline_spark.operators.cdc import watermark_range


class WatermarkStore:
    """1-row state table holding the last successfully loaded watermark.

    Control-plane state, not data: reads/writes go through driver-side
    pyarrow (same parquet-directory layout a Spark scan reads), so a batch
    spends zero Spark jobs on its bookkeeping — at one job every few
    hundred ms of scheduler overhead, the control plane would otherwise
    cost as much as small batches themselves.
    """

    def __init__(self, spark: SparkSession, path: str, initial: Any):
        self.spark = spark
        self.path = path
        self.initial = initial

    def read(self) -> Any:
        """Reference: ADF Lookup of last_load (watermark_table.sql:1-4)."""
        if not os.path.exists(self.path):
            return self.initial
        import pyarrow.parquet as pq

        value = pq.read_table(self.path).column("last_load")[0].as_py()
        return value

    def advance(self, value: Any) -> None:
        """Reference: UpdateWatermarkTable sproc (stored_procedure.sql:1-12),
        minus its missing-COMMIT bug — the swap is atomic (write a fresh
        directory, rename over the old one)."""
        import shutil
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = f"{self.path}.__tmp__{uuid.uuid4().hex[:8]}"
        old = f"{self.path}.__old__"  # stable name: interrupted swaps recoverable
        os.makedirs(tmp)
        pq.write_table(
            pa.table({"last_load": [value]}), os.path.join(tmp, "part-0.parquet")
        )
        # Delete the previous state only AFTER the forward rename lands; on a
        # mid-swap failure the old state is restored, never destroyed.
        shutil.rmtree(old, ignore_errors=True)
        moved = False
        try:
            if os.path.exists(self.path):
                os.rename(self.path, old)
                moved = True
            os.rename(tmp, self.path)
        except BaseException:
            if moved and not os.path.exists(self.path):
                os.rename(old, self.path)
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)


def run_incremental_batch(
    source: DataFrame,
    ts_col: str,
    store: WatermarkStore,
    sink: Callable[[DataFrame], None],
    current_load: Any | None = None,
    count_rows: bool = True,
) -> int:
    """One incremental load: extract ``(last_load, current_load]``, deliver
    to the sink, then advance the watermark. Returns rows delivered.

    ``current_load=None`` means "everything newer than the watermark": the
    batch is the OPEN window ``ts > last_load`` and the watermark advances
    to the max(ts) OBSERVED on the sink's own action — the reference's
    second ADF Lookup (a full extra source scan) collapses into a metric
    of the batch plan itself, which is the shape that matters at 100 TB.
    An explicit ``current_load`` keeps the closed-window behavior. Either
    way the range filter is a plain comparison → pushed to the parquet
    scan, so each batch reads only new row groups. Caveat: if ``ts_col``
    is a DERIVED column (e.g. the µs conversion of a raw-nanos source),
    the comparison is not pushdown-eligible — feed a source built by
    ``readers.load_table_range`` instead, which pushes the window as raw
    int64 bounds and re-applies the exact filter post-conversion.

    Sink contract when ``count_rows=True``: the row count is observed on
    the batch the sink receives, so the cheap path assumes the sink runs
    at least one Spark action over ``batch`` itself (every sink in
    ``sources.sinks`` does). A sink that skips its write or acts on a
    re-derived DataFrame leaves the observation empty — that case falls
    back to one extra ``batch.count()`` instead of blocking forever.
    """
    from pyspark.sql import Observation

    last = store.read()
    open_window = current_load is None
    if open_window:
        batch = source.filter(F.col(ts_col) > F.lit(last))
    else:
        batch = watermark_range(source, ts_col, last, current_load)
    # Count (and, for the open window, the new watermark) via an
    # Observation piggybacked on the sink's own action: zero extra scans,
    # and the numbers reported are what the sink actually saw (a re-scan
    # after the write could diverge if the source gained rows).
    obs = Observation()
    batch = batch.observe(
        obs, F.count(F.lit(1)).alias("n"), F.max(ts_col).alias("new_wm")
    )
    sink(batch)
    # Bounded wait: Observation.get blocks forever if the sink never
    # executed an action over the observed batch, so probe it on a timed
    # daemon thread (supported API only) and recompute on timeout.
    metrics = observation_result(obs, timeout_s=5.0)
    if metrics is not None:
        n, new_wm = metrics["n"], metrics["new_wm"]
    else:
        n, new_wm = batch.agg(
            F.count(F.lit(1)).alias("n"), F.max(ts_col).alias("new_wm")
        ).first()
    if open_window:
        if new_wm is None:
            return 0  # empty batch: nothing delivered, watermark unchanged
        store.advance(new_wm)
    else:
        store.advance(current_load)
    return n if count_rows else -1
