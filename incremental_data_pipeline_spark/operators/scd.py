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

# Above this many rows, surrogate-key assignment auto-selects the
# range-partitioned prefix-sum path instead of one global window task.
SCALABLE_KEY_THRESHOLD = 1_000_000

# Scalable-path tuning: target rows per range bucket, hard cap on bucket
# count (the bucket-lookup when-tree has depth log2(buckets)), and sample
# rows collected per bucket to pick boundaries (Spark's own range
# exchange uses ~100 per output partition).
SCALABLE_KEY_ROWS_PER_BUCKET = 1_000_000
SCALABLE_KEY_MAX_BUCKETS = 4096
SCALABLE_KEY_SAMPLES_PER_BUCKET = 100


def _range_boundaries(df: DataFrame, order_by: list[str], n_rows: int) -> list[tuple]:
    """Driver-computed range-split points for the scalable key generator.

    Samples ~SAMPLES_PER_BUCKET key tuples per target bucket, sorts them
    on the driver, and picks evenly spaced split points. Any boundary set
    yields CORRECT keys (bucketing only has to be monotone w.r.t. the
    global sort order); sampling quality only affects balance. Tuples
    containing NULLs are excluded from the boundary set so that the
    bucket comparison's NULL semantics reduce exactly to NULLS FIRST:
    Spark compares structs with its interpreted total ordering, in which
    an inner NULL field sorts BEFORE every non-NULL value (the
    comparison returns a non-NULL boolean, not NULL), so once the prefix
    fields are equal a NULL-bearing key evaluates ``key >= boundary`` to
    false against every all-non-NULL boundary — left of the boundary,
    exactly where NULLS FIRST row_number ordering puts it.
    """
    import math

    n_buckets = min(
        SCALABLE_KEY_MAX_BUCKETS,
        max(1, math.ceil(n_rows / SCALABLE_KEY_ROWS_PER_BUCKET)),
    )
    if n_buckets == 1:
        return []
    target = n_buckets * SCALABLE_KEY_SAMPLES_PER_BUCKET
    fraction = min(1.0, 1.2 * target / max(n_rows, 1))
    sampled = [
        tuple(r)
        for r in df.select(*order_by).sample(False, fraction, seed=42).collect()
        if all(v is not None for v in r)
    ]
    sampled = sorted(set(sampled))
    if len(sampled) < 2:
        return []
    step = len(sampled) / n_buckets
    picks = []
    for i in range(1, n_buckets):
        b = sampled[min(int(i * step), len(sampled) - 1)]
        if not picks or b > picks[-1]:
            picks.append(b)
    return picks


def _bucket_expr(df: DataFrame, order_by: list[str], boundaries: list[tuple]):
    """Binary-search when-tree: bucket id = count of boundaries <= key.

    A pure function of the row's own values and frozen literals — unlike
    ``spark_partition_id()`` it is stable across plan instances, AQE
    re-planning, and task retries, so the window, the per-bucket count
    map, and the offset join all agree without any checkpoint. Depth is
    log2(buckets); each boundary appears exactly once in the tree.
    """
    key = F.struct(*[F.col(c) for c in order_by])
    types = [df.schema[c].dataType for c in order_by]

    def lit_tuple(vals: tuple):
        return F.struct(*[F.lit(v).cast(t) for v, t in zip(vals, types)])

    def build(lo: int, hi: int):
        # invariant: the answer is in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(key >= lit_tuple(boundaries[mid]), build(mid + 1, hi)).otherwise(
            build(lo, mid)
        )

    return build(0, len(boundaries))


def assign_surrogate_keys(
    df: DataFrame,
    key_col: str,
    order_by: list[str],
    base: int = 0,
    scalable: bool | None = None,
) -> DataFrame:
    """key = base + row_number() ordered by the natural key.

    Reference: gold_dim_branch.py:139-146 (`lit(max)+row_number()` over a
    global Window) and gold_dim_model.py:157-158 (`max +
    monotonically_increasing_id()`) — two inconsistent generators, one of
    which funnels all rows through a single task and the other of which
    leaves ~2^33-sized gaps. Normalized here to one generator with two
    physical strategies, chosen AUTOMATICALLY by default:

    - ``scalable=None`` (default): probe the input with an
      early-terminating ``limit(threshold+1).count()`` (reads at most
      threshold+1 rows, never a full scan) and pick the scalable path
      above ``SCALABLE_KEY_THRESHOLD`` rows — a forgotten default can no
      longer funnel a billion-row key assignment through one task, while
      dimension-sized inputs keep the cheap single-window plan.
    - ``scalable=True``: range-bucket on DRIVER-COMPUTED boundary values
      (sampled split points baked into the plan as literals), number
      within buckets, offset each bucket by the cumulative count of the
      buckets before it (zipWithIndex-style prefix sum, all
      DataFrame-side). Because the buckets are contiguous ranges of the
      same keys, the result is the EXACT global row_number whenever
      ``order_by`` is a unique ordering (which ``build_dim`` guarantees
      by deduplicating on the natural key first — the oracle-checked
      ``dim_build_scalable_keys`` proves key-for-key equality). With
      ties, keys stay dense and unique but tie order is unspecified —
      the same contract row_number itself gives. The bucket id is a pure
      function of row values, NOT ``spark_partition_id()``: the count
      map and the window therefore agree across separate evaluations and
      AQE re-plans with no ``localCheckpoint`` (the round-7 checkpoint
      fix traded an AQE row-loss bug for executor-loss fragility and an
      eager job at plan-construction time; driver-frozen boundaries have
      neither failure mode, and the operator is lazy again apart from
      the count + boundary-sample jobs). Caller contract: ``df`` itself
      must be deterministic (true everywhere in this repo — inputs are
      files, not rand()/mono_id sources).
    - ``scalable=False``: the literal single-window global sort, for
      callers that know the input is tiny and want zero extra jobs.

    Scale shape: one count job + one ~(buckets x 100)-row boundary-sample
    collect on the driver, then a single hash shuffle by bucket id for
    the window, a map-side-combined per-bucket count aggregate, and a
    broadcast join of the <= MAX_BUCKETS-row offset map. No global-sort
    single task, no checkpoint materialization. At extreme scale raise
    SCALABLE_KEY_MAX_BUCKETS (lookup cost grows as log2(buckets)).
    """
    reserved = {"__bkt", "__rn", "__off"}
    clashes = reserved & ({key_col} | set(df.columns))
    if clashes:
        # The scalable path uses these as scratch columns and drops them
        # at the end — a caller's key OR input column under one of these
        # names would be silently destroyed (the single-window path
        # would keep it, making the bug size-dependent). Fail loudly.
        raise ValueError(
            f"{sorted(clashes)} collide with assign_surrogate_keys "
            "internals ('__bkt', '__rn', '__off'); rename them first"
        )
    if scalable is None:
        probe = df.limit(SCALABLE_KEY_THRESHOLD + 1).count()
        scalable = probe > SCALABLE_KEY_THRESHOLD
    if not scalable:
        w = Window.orderBy(*order_by)
        return df.withColumn(key_col, (F.lit(base) + F.row_number().over(w)).cast("long"))

    # Scalable path: bucket rows by driver-frozen range boundaries (so
    # bucket order IS global order), number within buckets, then add
    # per-bucket offsets from a tiny broadcast count map. The bucket id
    # is data-derived, so the two consumers (window + count aggregate)
    # agree under AQE / re-evaluation — the spark_partition_id() variant
    # of this operator silently dropped rows when AQE coalesced the two
    # plan instances differently (first seen at the 100x mirror:
    # 834,610 of 1,500,000 dim rows survived).
    n_rows = df.count()
    boundaries = _range_boundaries(df, order_by, n_rows)
    if not boundaries:
        if n_rows > SCALABLE_KEY_THRESHOLD:
            import logging

            logging.getLogger(__name__).warning(
                "assign_surrogate_keys: %d rows requested the scalable path "
                "but sampling found <2 distinct non-NULL %s tuples — falling "
                "back to the single-task global window. Heavily duplicated "
                "or mostly-NULL order keys cannot be range-split; expect one "
                "straggler task at this size.",
                n_rows,
                order_by,
            )
        w = Window.orderBy(*order_by)
        return df.withColumn(key_col, (F.lit(base) + F.row_number().over(w)).cast("long"))
    bucketed = df.withColumn("__bkt", _bucket_expr(df, order_by, boundaries))
    wp = Window.partitionBy("__bkt").orderBy(*order_by)
    numbered = bucketed.withColumn("__rn", F.row_number().over(wp))
    counts = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    woff = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__off", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("__bkt", "__off")), "__bkt")
        .withColumn(key_col, (F.lit(base) + F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__bkt", "__rn", "__off")
    )


def build_dim(
    source: DataFrame,
    natural_keys: list[str],
    attrs: list[str],
    surrogate_key: str,
    existing: DataFrame | None = None,
    scalable_keys: bool | None = None,
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


def upsert_scd2(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD TYPE 2 upsert: history-keeping merge. ``target`` carries
    (keys, attrs, valid_from, valid_to, is_current); ``source`` carries
    (keys, attrs) effective at ``effective``. Rows whose attributes
    changed get their current version CLOSED (valid_to = effective,
    is_current = false) and a NEW current version inserted; new keys
    insert directly; unchanged rows and all history pass through
    untouched — the full audit trail the reference's SCD1 overwrites
    away.

    Scale shape: one key join between the CURRENT slice of the target and
    the source (both key-partitioned or broadcast), null-safe attribute
    comparison, three unionByName legs — no row-at-a-time logic, same
    join geometry as the SCD1 emulation. Historical (non-current) rows
    never join at all.
    """
    eff = F.lit(effective)
    cur = target.filter(F.col(current_col))
    hist = target.filter(~F.col(current_col))
    s = source.select(
        *keys,
        F.lit(True).alias("__s_present"),
        *[F.col(a).alias(f"__s_{a}") for a in attrs],
    )
    j = cur.join(s, keys, "full_outer")

    in_src = F.coalesce(F.col("__s_present"), F.lit(False))
    changed = None
    for a in attrs:
        neq = ~F.col(a).eqNullSafe(F.col(f"__s_{a}"))
        changed = neq if changed is None else (changed | neq)
    is_new_key = F.col(from_col).isNull()

    out_cols = [*keys, *attrs, from_col, to_col, current_col]
    # current rows without a source match, or matched-and-unchanged: pass
    unchanged = j.filter(~is_new_key & (~in_src | ~changed)).select(*out_cols)
    # matched-and-changed: close out the old version
    closed = (
        j.filter(~is_new_key & in_src & changed)
        .withColumn(to_col, eff)
        .withColumn(current_col, F.lit(False))
        .select(*out_cols)
    )
    # changed or brand-new keys: open the new current version
    opened = (
        j.filter(in_src & (is_new_key | changed))
        .select(
            *keys,
            *[F.col(f"__s_{a}").alias(a) for a in attrs],
            eff.alias(from_col),
            F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
            F.lit(True).alias(current_col),
        )
    )
    return (
        hist.select(*out_cols)
        .unionByName(unchanged)
        .unionByName(closed)
        .unionByName(opened)
    )


def upsert_scd2_ordered(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    attrs: list[str],
    eff_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Event-time-ordered SCD2 upsert: the streaming-safe variant of
    ``upsert_scd2``. Each source row carries its OWN effective timestamp
    (``eff_col``) instead of one batch-level date, and a LATE-ARRIVAL
    GUARD ignores any source row whose effective time is not strictly
    after the open version's ``valid_from`` — so micro-batches may arrive
    in any file order and replays of an already-applied batch are no-ops
    (idempotent under the at-least-once foreachBatch checkpoint, same
    contract as the SCD1 bridge).

    Semantics per key: source row (attrs, eff) vs current version:
    - no current version  -> open (attrs, valid_from=eff)
    - eff <= valid_from   -> ignore (late or replayed)
    - attrs unchanged     -> pass through
    - attrs changed       -> close current at eff, open new at eff

    Scale shape: identical join geometry to ``upsert_scd2`` — one
    key join of the CURRENT slice against the (pre-reduced, one row per
    key) source, null-safe attribute comparison, unionByName legs.
    History never joins.
    """
    cur = target.filter(F.col(current_col))
    hist = target.filter(~F.col(current_col))
    s = source.select(
        *keys,
        F.lit(True).alias("__s_present"),
        F.col(eff_col).alias("__s_eff"),
        *[F.col(a).alias(f"__s_{a}") for a in attrs],
    )
    j = cur.join(s, keys, "full_outer")

    in_src = F.coalesce(F.col("__s_present"), F.lit(False))
    changed = None
    for a in attrs:
        neq = ~F.col(a).eqNullSafe(F.col(f"__s_{a}"))
        changed = neq if changed is None else (changed | neq)
    is_new_key = F.col(from_col).isNull()
    late = F.col("__s_eff") <= F.col(from_col)
    applies = in_src & ~is_new_key & changed & ~late

    out_cols = [*keys, *attrs, from_col, to_col, current_col]
    unchanged = j.filter(~is_new_key & ~applies).select(*out_cols)
    closed = (
        j.filter(applies)
        .withColumn(to_col, F.col("__s_eff"))
        .withColumn(current_col, F.lit(False))
        .select(*out_cols)
    )
    opened = (
        j.filter(in_src & (is_new_key | (changed & ~late)))
        .select(
            *keys,
            *[F.col(f"__s_{a}").alias(a) for a in attrs],
            F.col("__s_eff").alias(from_col),
            F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
            F.lit(True).alias(current_col),
        )
    )
    return (
        hist.select(*out_cols)
        .unionByName(unchanged)
        .unionByName(closed)
        .unionByName(opened)
    )


def close_deleted(
    target: DataFrame,
    delete_keys: DataFrame,
    keys: list[str],
    as_of,
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD2 DELETE close-out: when a key disappears from the source (hard
    delete, GDPR erasure cascade), its open version is CLOSED as of
    ``as_of`` (``valid_to`` set, ``is_current`` false) — history is kept,
    nothing is physically removed. Replay-safe: a key with no open
    version is a no-op, so applying the same delete batch twice yields
    the identical table.

    Scale shape: one equi-join of the dim against the (distinct,
    key-only) delete set; closed history rows pass through the join
    untouched but match nothing. No window, no shuffle beyond the join.
    """
    marker = delete_keys.select(*keys).distinct().withColumn(
        "__deleted", F.lit(True)
    )
    hit = F.col(current_col) & F.coalesce(F.col("__deleted"), F.lit(False))
    return (
        target.join(marker, keys, "left")
        .withColumn(to_col, F.when(hit, F.lit(as_of)).otherwise(F.col(to_col)))
        .withColumn(
            current_col,
            F.when(hit, F.lit(False)).otherwise(F.col(current_col)),
        )
        .drop("__deleted")
    )


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


def upsert_scd1_evolving(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """SCD1 MERGE with SCHEMA EVOLUTION — the `mergeSchema`/autoMerge
    behavior of Delta's MERGE that the plain :func:`upsert_scd1` (and the
    reference's fixed-schema notebook merge, gold_dim_branch.py:177-184)
    lacks: columns present on only one side are null-filled on the other,
    so a source batch that grew a new attribute upserts without a manual
    ALTER TABLE, and old target columns the source dropped survive.

    Semantics: source rows win on key collision (update-all), target rows
    without a source match survive with NULL in source-only columns, new
    source columns appear for all rows (NULL for untouched target rows).
    Same two-leg shape as upsert_scd1 — one anti join + one union — with
    `allowMissingColumns` doing the null-fill; column order is target
    columns first, then new source columns, deterministic for writers.

    Scale note: schema evolution is plan-time metadata only; the executed
    plan is identical to the fixed-schema merge (no extra shuffle, no
    per-row branching)."""
    missing_keys = [k for k in keys if k not in source.columns]
    if missing_keys:
        raise ValueError(f"source is missing merge keys: {missing_keys}")
    survivors = target.join(source.select(*keys), keys, "left_anti")
    return survivors.unionByName(source, allowMissingColumns=True)
