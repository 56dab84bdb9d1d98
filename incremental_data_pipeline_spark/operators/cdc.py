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
