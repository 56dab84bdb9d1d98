"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same config block is what we would ship
to a 1000-executor cluster (AQE, skew-join handling, UTC session timezone
for cross-engine determinism, Arrow for the Pandas-UDF slow path).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Three-level-namespace parity shim (reference database_notebook.py:8-23
# uses cars_catalog.gold.* names): a tiny JVM catalog plugin that aliases
# a named catalog onto the session catalog. Built by java/build.sh;
# sessions created here get it on the driver classpath automatically,
# and sources.catalog.three_part_enabled() degrades gracefully when a
# foreign session (e.g. the driver harness) lacks the jar.
ALIAS_CATALOG_JAR = Path(__file__).resolve().parent.parent / "java" / "idps.jar"
ALIAS_CATALOG_NAME = "cars_catalog"
ALIAS_CATALOG_CLASS = "idps.catalog.SessionAliasCatalog"

# Streaming state-store provider choice (100× posture):
# - The default HDFSBackedStateStoreProvider holds every key's state as
#   deserialized objects on the executor HEAP (plus an HDFS/DFS snapshot
#   per checkpoint). Fine for the fixture-scale suites here — state is a
#   few thousand rows — but at 100 TB a stream-stream join or a wide
#   dropDuplicates can hold 10^8-10^9 keys per partition-group, and heap
#   state that size means GC stalls and executor OOM.
# - RocksDBStateStoreProvider (bundled with Spark; no extra jars) keeps
#   state OFF-heap in an embedded RocksDB per partition with incremental
#   checkpointing — the provider a production deployment of the stateful
#   queries in streaming/pipeline.py should run. Enable with:
#       get_spark(extra_conf=ROCKSDB_STATE_STORE_CONF)
#   The provider only affects state STORAGE; results are identical, which
#   tests/test_streaming.py::test_rocksdb_state_store_provider_equivalent
#   pins by running a stateful query under both providers.
# - Caveat: the provider is fixed per checkpoint location — switching
#   providers requires a new checkpoint (state formats differ).
ROCKSDB_STATE_STORE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # Track changelog instead of full snapshots per batch: turns per-batch
    # checkpoint cost from O(state) into O(delta).
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def get_spark(
    app_name: str = "incremental_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` locally; on a
    real cluster callers pass the cluster master / rely on spark-submit.
    ``shuffle_partitions`` should be ~2-3x total cores on a cluster; locally
    it defaults to the core count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic cross-engine timestamps (DuckDB oracle is UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow batches for the Pandas-UDF slow path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scans: vectorized reader + aggregate pushdown where legal.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime Bloom-filter joins: a selective dim filter is pushed to
        # the fact side as a bloom probe BEFORE the shuffle. Off by
        # default in Spark; the built-in gates (creation side <10MB,
        # probe-side scan >10GB) mean it only fires in exactly the
        # big-fact/selective-dim case where it wins — a no-op on the test
        # fixtures, a large shuffle saving at 100 TB.
        # (tests/test_relational_ext.py pins the injection with the gates
        # lowered to fixture scale.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Scan-split sizing. 128 MB splits are the right default for both
        # the local fixtures and a production cluster: at 100 TB that is
        # ~800k splits — enough for any executor count — while per-task
        # overhead stays amortized. Shrink only for compute-dense narrow
        # maps over small-bytes inputs (fan_out handles that case by
        # repartitioning instead, which keeps the scan itself cheap).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # TIMESTAMP(NANOS) parquet (events.ts) is otherwise unreadable in
        # Spark 4; readers.load_table converts the raw nanos back to
        # microsecond TimestampType.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    if ALIAS_CATALOG_JAR.exists():
        builder = builder.config(
            "spark.driver.extraClassPath", str(ALIAS_CATALOG_JAR)
        ).config(f"spark.sql.catalog.{ALIAS_CATALOG_NAME}", ALIAS_CATALOG_CLASS)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
