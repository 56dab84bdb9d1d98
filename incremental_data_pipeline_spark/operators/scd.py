"""Dimension building, surrogate keys, SCD Type 1 upsert, fact building.

Rebuilds the reference's gold layer (gold_dim_*.py, gold_fact.py) as three
generic operators, fixing the reference bugs catalogued in SURVEY §2.9:
dims are always deduplicated on the natural key (#2), surrogate keys are
dense from 1 via one code path (#3), and the upsert merges on the NATURAL
key, not the surrogate (#5). delta-spark is absent, so MERGE is emulated
with join-based set algebra (SURVEY §7 step 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.operators.cdc import new_rows


def assign_surrogate_keys(
    df: DataFrame,
    key_col: str,
    order_by: list[str],
    base: int = 0,
    scalable: bool = False,
) -> DataFrame:
    """key = base + row_number() ordered by the natural key.

    Reference: gold_dim_branch.py:139-146 (`lit(max)+row_number()` over a
    global Window) and gold_dim_model.py:157-158 (`max +
    monotonically_increasing_id()`) — two inconsistent generators, one of
    which funnels all rows through a single task and the other of which
    leaves ~2^33-sized gaps. Normalized here to one generator with two
    physical strategies:

    - ``scalable=False`` (default): global-order ``row_number`` — exact,
      deterministic, matches the SQL oracle; fine for dimension-sized data
      (dims are small even at 100 TB fact scale).
    - ``scalable=True``: sort within partitions only, then offset each
      partition by the cumulative count of the partitions before it
      (zipWithIndex-style prefix sum, all DataFrame-side). Keys are still
      dense from base+1 and unique, ordering is only partition-local —
      use for billion-row key assignment where a single-task sort is
      unacceptable.
    """
    if not scalable:
        w = Window.orderBy(*order_by)
        return df.withColumn(key_col, (F.lit(base) + F.row_number().over(w)).cast("long"))

    # Scalable path: range-partition by the natural order (so keys are
    # *globally* ordered too), number within partitions, then add per-
    # partition offsets computed from a tiny driver-side count map.
    parted = df.repartitionByRange(*order_by)
    pid = F.spark_partition_id()
    wp = Window.partitionBy(pid).orderBy(*order_by)
    numbered = parted.withColumn("__pid", pid).withColumn("__rn", F.row_number().over(wp))
    counts = numbered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__off", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(key_col, (F.lit(base) + F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def build_dim(
    source: DataFrame,
    natural_keys: list[str],
    attrs: list[str],
    surrogate_key: str,
    existing: DataFrame | None = None,
    scalable_keys: bool = False,
) -> DataFrame:
    """Generic SCD1 dimension builder (replaces the four copy-pasted
    gold_dim_*.py notebooks).

    1. project natural key + attributes, dropDuplicates on the natural key
       (fixes SURVEY §2.9 #2);
    2. split new vs existing natural keys (CDC anti-join, J1);
    3. new keys get ``max(existing surrogate) + row_number`` (dense, §2.9 #3);
    4. existing keys keep their surrogate, attributes refreshed from source
       (SCD1 update-all semantics, merge on NATURAL key — fixes §2.9 #5);
    5. union with untouched existing rows.
    """
    src = source.select(*natural_keys, *attrs).dropDuplicates(natural_keys)
    if existing is None:
        return assign_surrogate_keys(src, surrogate_key, natural_keys, 0, scalable_keys).select(
            surrogate_key, *natural_keys, *attrs
        )

    max_key = existing.agg(F.max(surrogate_key)).first()[0] or 0  # A2 scalar agg
    inserts = assign_surrogate_keys(
        new_rows(src, existing, natural_keys), surrogate_key, natural_keys, max_key, scalable_keys
    )
    # SCD1 update: refreshed attrs for keys present in both; surrogate kept.
    updates = existing.select(surrogate_key, *natural_keys).join(
        src, natural_keys, "inner"
    )
    untouched = existing.join(src.select(*natural_keys), natural_keys, "left_anti")
    cols = [surrogate_key, *natural_keys, *attrs]
    return (
        untouched.select(*cols)
        .unionByName(updates.select(*cols))
        .unionByName(inserts.select(*cols))
    )


def upsert_scd1(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE ... WHEN MATCHED UPDATE ALL WHEN NOT MATCHED INSERT ALL,
    emulated without Delta (reference: gold_dim_branch.py:177-184).

    result = source ∪ (target ⟕anti source on keys). Source rows win on key
    collision (update-all); target rows without a source match survive.
    Both legs are one shuffled (or broadcast) hash join — no row-at-a-time
    logic, safe at any scale. Writing the result back atomically is the
    sink's job (sinks.atomic_overwrite breaks the read-overwrite cycle).
    """
    return target.join(source.select(*keys), keys, "left_anti").unionByName(source)


def build_fact(
    base: DataFrame,
    dims: dict[str, tuple[DataFrame, dict[str, str]]],
    measures: list[str],
) -> DataFrame:
    """Star-schema fact builder (reference: gold_fact.py:34-38 4-way left
    join). ``dims`` maps surrogate-key column -> (dim_df, {base_col:
    dim_natural_col}). Dimensions are broadcast — at 100 TB the fact side
    never shuffles for FK resolution. Left joins preserve reference
    behavior: late-arriving dims leave a NULL FK instead of dropping the
    fact row."""
    out = base
    for sk, (dim, keymap) in dims.items():
        lookup = dim.select(
            sk, *[F.col(dim_col).alias(base_col) for base_col, dim_col in keymap.items()]
        )
        out = out.join(F.broadcast(lookup), list(keymap.keys()), "left")
    return out.select(*measures, *dims.keys())
