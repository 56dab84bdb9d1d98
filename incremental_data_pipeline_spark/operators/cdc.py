"""Change-data-capture primitives.

Rebuilds the reference's CDC machinery (SURVEY §2.1 S2-S4, §2.3 J1, §2.8 I1)
as generic DataFrame operators:

- the reference's "left join + isNull/isNotNull split" new/old-row detector
  (gold_dim_branch.py:79-105) becomes explicit left_anti / left_semi joins —
  same semantics, no fan-out risk from duplicate sink keys, and Catalyst
  plans them as a single broadcast/shuffled hash join with no post-filter;
- the ADF watermark range extract (docs/incremental_load.PNG,
  watermark_table.sql:6-9) becomes a pushed-down range filter.

At 100 TB: anti/semi joins against a dimension-sized target broadcast; the
range filter lands in PushedFilters and prunes parquet row groups, so an
incremental batch reads only the new data's row groups, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def new_rows(source: DataFrame, target: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``source`` whose key is absent from ``target`` (the INSERT set).

    Reference: the ``filter(k.isNull())`` branch after the left join,
    gold_dim_branch.py:105 — expressed directly as an anti join.
    """
    return source.join(_keys_of(target, keys), keys, "left_anti")


def existing_rows(source: DataFrame, target: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``source`` whose key already exists in ``target`` (the UPDATE
    set). Reference: the ``filter(k.isNotNull())`` branch,
    gold_dim_branch.py:92 — expressed as a semi join."""
    return source.join(_keys_of(target, keys), keys, "left_semi")


def _keys_of(df: DataFrame, keys: list[str]) -> DataFrame:
    # Project to the join keys before the anti/semi join so the build side
    # is as small (and as broadcastable) as possible.
    return df.select(*keys)


def watermark_range(df: DataFrame, ts_col: str, last_load, current_load) -> DataFrame:
    """The incremental extract window ``(last_load, current_load]``
    (reference: ADF Lookup+Copy range filter, watermark_table.sql:6-9).
    Both bounds are plain comparisons → parquet predicate pushdown."""
    c: Column = F.col(ts_col)
    return df.filter((c > F.lit(last_load)) & (c <= F.lit(current_load)))


def merge_partial_aggs(
    gold: DataFrame, batch: DataFrame, keys: list[str], sum_cols: dict[str, Column]
) -> DataFrame:
    """Incremental AGGREGATE maintenance: fold a new batch into a stored
    per-key rollup WITHOUT rescanning history — the step that turns the
    medallion's gold layer from recompute-the-world into O(batch) work.

    ``sum_cols`` maps output column -> aggregation over the RAW batch
    columns; the same names must already exist in ``gold``. Works for any
    associative-commutative aggregate expressed as sums/counts (avg =
    sum/count at read time, the standard decomposition).

    Scale shape: the batch collapses to per-key partials first (map-side
    combine over only the batch), then one unionByName + re-aggregate with
    the (key-partitioned) gold table. The 100 TB gold table shuffles only
    its matched keys' rows — and none at all when both sides are bucketed
    on the key (sources/sinks.py bucketed tables).
    """
    partial = batch.groupBy(*keys).agg(
        *[c.alias(name) for name, c in sum_cols.items()]
    )
    merged = gold.unionByName(partial)
    return merged.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sum_cols]
    )


def max_rescan_under_deletes(
    base: DataFrame,
    delete_pred: Column,
    keys: list[str],
    value_col: str,
    out_col: str = "max_value",
    flag_col: str = "rescanned",
) -> DataFrame:
    """Incremental maintenance of a per-key MAX view under DELETES — the
    aggregate ``merge_partial_aggs`` / ``ivm_agg_retract`` CANNOT handle:
    sums and counts absorb a retraction as a signed partial, but MAX is
    not invertible (deleting the max tells you nothing about the runner-
    up), so the textbook IVM answer is a rescan SCOPED to the groups
    whose maximum was actually deleted.

    ``base`` is the pre-delete table, ``delete_pred`` marks the deleted
    rows (the CDC delete batch). A group is AFFECTED iff the max over
    its deleted rows equals the stored max — every other group's stored
    max is provably still valid (only non-extremal rows left). Affected
    groups are recomputed from base-minus-deletes via a semi-join whose
    key set is the affected groups only; groups whose every row was
    deleted drop out of the view. ``flag_col`` exposes the
    affected/untouched classification so the oracle can re-derive and
    hash-check the SCOPING decision itself, not just the final values.

    Scale shape: the delete batch collapses to per-key partials
    map-side; the stored view shuffles only its |keys| rows; the rescan
    scan is pruned to affected keys by a semi-join (broadcast when the
    affected set is small — the common case: |affected| ≤ |delete
    batch|)."""
    stored = base.groupBy(*keys).agg(F.max(value_col).alias(out_col))
    dmax = (
        base.filter(delete_pred)
        .groupBy(*keys)
        .agg(F.max(value_col).alias("__del_max"))
    )
    st = stored.join(dmax, keys, "left")
    untouched = st.filter(
        F.col("__del_max").isNull() | (F.col("__del_max") < F.col(out_col))
    ).select(*keys, out_col, F.lit(False).alias(flag_col))
    affected_keys = st.filter(F.col("__del_max") == F.col(out_col)).select(*keys)
    rescanned = (
        base.join(affected_keys, keys, "left_semi")
        .filter(~delete_pred)
        .groupBy(*keys)
        .agg(F.max(value_col).alias(out_col))
        .select(*keys, out_col, F.lit(True).alias(flag_col))
    )
    return untouched.unionByName(rescanned)


def reconcile_checksums(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    value_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Anti-entropy reconciliation: compare two copies of a table by
    per-bucket row counts and order-free XOR checksums instead of a
    row-by-row diff — the way you verify a 100 TB replica (bronze vs
    source, post-migration copies) without shuffling either table against
    the other.

    Each row hashes (keys + values) to a 32-bit digest; rows land in
    md5(key)-derived buckets; each side aggregates (count, bit_xor digest)
    per bucket — map-side combinable, one tiny result per side. XOR is
    commutative/associative, so the checksum is partition-order-free and
    engine-reproducible. A mismatched bucket localizes divergence to
    ~1/n_buckets of the key space for a targeted row-level follow-up
    (``snapshot_diff`` over just that bucket).

    NULL handling: each column is encoded ``coalesce('v' || value, 'n')``
    before concatenation, so NULL gets its own token instead of being
    silently skipped — rows ('a', NULL, 'b') and ('a', 'b', NULL) digest
    differently, and the encoding is the same expression in the DuckDB
    twin (``'v' || NULL`` is NULL there too, so coalesce picks 'n').
    """

    def enc(c: str) -> Column:
        return F.coalesce(
            F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n")
        )

    def digests(df: DataFrame, side: str) -> DataFrame:
        key_concat = F.concat_ws("|", *[enc(c) for c in keys])
        row_concat = F.concat_ws("|", *[enc(c) for c in [*keys, *value_cols]])
        bucket = (
            F.conv(F.substring(F.md5(key_concat), 1, 8), 16, 10).cast("long")
            % n_buckets
        )
        digest = F.conv(F.substring(F.md5(row_concat), 1, 8), 16, 10).cast("long")
        return (
            df.select(bucket.alias("bucket"), digest.alias("__d"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_{side}"),
                F.expr("bit_xor(__d)").cast("long").alias(f"xor_{side}"),
            )
        )

    joined = digests(left, "left").join(digests(right, "right"), "bucket", "full_outer")
    return joined.select(
        "bucket",
        F.coalesce(F.col("n_left"), F.lit(0)).cast("long").alias("n_left"),
        F.coalesce(F.col("n_right"), F.lit(0)).cast("long").alias("n_right"),
        F.coalesce(F.col("xor_left"), F.lit(0)).cast("long").alias("xor_left"),
        F.coalesce(F.col("xor_right"), F.lit(0)).cast("long").alias("xor_right"),
        (
            F.coalesce(F.col("n_left"), F.lit(0)).eqNullSafe(
                F.coalesce(F.col("n_right"), F.lit(0))
            )
            & F.coalesce(F.col("xor_left"), F.lit(0)).eqNullSafe(
                F.coalesce(F.col("xor_right"), F.lit(0))
            )
        ).alias("match"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Change feed between two table snapshots (Delta CDF / CDC-feed
    emulation): one row per changed key with ``op`` in
    ('insert', 'update', 'delete') and the post-image values (pre-image
    NULL-padded for deletes), so a downstream consumer can replay the diff.

    Scale shape: one full-outer join on the key (both snapshots shuffle
    once — or zero times when bucketed on the key) and a narrow column
    comparison; unchanged keys drop out before anything else sees them.
    """
    o = old.select(
        *keys,
        F.lit(True).alias("__o_present"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__n_present"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    in_old = F.coalesce(F.col("__o_present"), F.lit(False))
    in_new = F.coalesce(F.col("__n_present"), F.lit(False))
    changed = None
    for c in compare_cols:
        neq = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        changed = neq if changed is None else (changed | neq)
    op = (
        F.when(~in_old & in_new, F.lit("insert"))
        .when(in_old & ~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *keys,
            "op",
            *[F.col(f"__n_{c}").alias(c) for c in compare_cols],
        )
    )
