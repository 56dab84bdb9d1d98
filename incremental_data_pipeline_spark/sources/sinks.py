"""Sinks: atomic overwrite, idempotent append, layered table paths.

The reference's sinks are Delta MERGE / overwrite + saveAsTable
(gold_dim_branch.py:188-191) and a raw parquet append for silver
(silver_notebook.py:59-62 — re-run ⇒ duplicates, SURVEY §2.9 #7). Without
delta-spark, mutation is emulated as write-new-version + atomic swap:

- ``atomic_overwrite`` materializes the new table version to a temp dir
  FIRST, then swaps directories. This both (a) makes the overwrite atomic
  w.r.t. failures mid-write, and (b) breaks the read-overwrite cycle —
  a plan that reads the current version is fully executed before the
  target is touched (the classic Spark self-overwrite trap; SURVEY §7
  "what's hard" (a)).
- ``idempotent_append`` dedups on a key against rows already in the sink,
  so replaying a batch (at-least-once upstream) cannot duplicate the layer
  — the fix for the reference's append-mode silver.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def recover_interrupted_swap(path: str) -> bool:
    """Repair a swap that crashed between its two renames: if ``path`` is
    missing but the stable backup exists, restore the backup. Returns True
    if a recovery happened. Call at startup on any atomically-swapped path."""
    old = f"{path}.__old__"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def atomic_overwrite(
    df: DataFrame, path: str, extra_files: dict[str, str] | None = None
) -> None:
    """Write ``df`` as the new content of ``path`` via temp-dir + swap.

    Failure-safe ordering: the previous version is only deleted AFTER the
    forward rename lands; a failure between the two renames leaves the old
    version under the stable ``path.__old__`` name, which
    ``recover_interrupted_swap`` (or the rollback below) restores — no
    window where both versions are gone.

    ``extra_files`` maps filename -> text content written into the temp
    dir BEFORE the swap, so they commit atomically with the data — the
    hook exactly-once consumers use to persist an applied-epoch marker in
    the same rename as the rows it covers. Use underscore-prefixed names
    (``_applied_epoch``): Spark's file index hides them from readers, the
    same convention as ``_SUCCESS``.
    """
    tmp = f"{path}.__tmp__{uuid.uuid4().hex[:8]}"
    old = f"{path}.__old__"  # stable name => interrupted swaps are detectable
    df.write.mode("overwrite").parquet(tmp)  # fully materialized before swap
    for name, content in (extra_files or {}).items():
        with open(os.path.join(tmp, name), "w") as f:
            f.write(content)
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    moved = False
    try:
        if os.path.exists(path):
            os.rename(path, old)
            moved = True
        os.rename(tmp, path)
    except BaseException:
        if moved and not os.path.exists(path):
            os.rename(old, path)  # roll back: restore the previous version
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def idempotent_append(spark: SparkSession, df: DataFrame, path: str, keys: list[str]) -> None:
    """Append only rows whose key is not already present (replay-safe).

    At scale this anti-join prunes with pushdown on the sink scan; for
    time-keyed layers prefer partitioned tables + dynamic partition
    overwrite, which skips the read entirely.
    """
    df = df.dropDuplicates(keys)  # collapse intra-batch duplicates too
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*keys)
        fresh = df.join(existing, keys, "left_anti")
    else:
        fresh = df
    fresh.write.mode("append").parquet(path)


def idempotent_overwrite_day_partitions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: list[str],
    ts_col: str,
    day_col: str = "__day",
    lo=None,
    hi=None,
    granularity: str = "day",
) -> None:
    """Replay-safe DAY-PARTITIONED bronze sink — the 100 TB shape of
    ``idempotent_append``.

    The plain append sink re-reads the ENTIRE sink for its anti-join every
    batch; here the re-read is pruned to the day partitions the batch's
    watermark window touches (``lo``/``hi`` are the window's date bounds —
    known driver-side, zero extra jobs), the batch is unioned in, deduped
    by key, and exactly those day partitions are dynamically overwritten.
    Correct for windows that split a day (the partial day's existing rows
    ride along in the pruned read) and for replays (rewriting the same
    partitions from the same union is idempotent). On a key conflict the
    BATCH row wins deterministically (existing rows are anti-joined against
    the batch's keys before the union) — a replay carrying corrected
    payloads converges on the corrected values. One shuffle on the day
    column keeps one writer task per day — bounded file counts at any
    scale.

    Guarantee is WEAKER than ``idempotent_append``'s whole-sink anti-join:
    dedup only sees the [lo, hi]-pruned partitions, so a key re-delivered
    with a timestamp landing in a *different* partition than its earlier
    occurrence is written twice. Use this sink when key uniqueness is
    stable per partition (the usual event-log shape: a key's event time
    never moves across days); use ``idempotent_append`` when keys can
    re-arrive under arbitrary timestamps.

    ``granularity`` sizes partitions to the data: 'day' at production
    volume (aim for 100 MB–1 GB per partition), 'month' when daily slices
    would be pathologically small (tiny fixtures, low-rate sources) —
    over-partitioning trades scan pruning for per-directory overhead.
    """
    trunc = {"day": F.to_date(F.col(ts_col)), "month": F.trunc(F.col(ts_col), "month")}[
        granularity
    ]
    if lo is not None and granularity == "month":
        lo = lo.replace(day=1)  # floor to the partition value, or pruning over-prunes
    batch = df.withColumn(day_col, trunc).dropDuplicates(keys)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        if lo is not None:
            existing = existing.filter(F.col(day_col) >= F.lit(lo))
        if hi is not None:
            existing = existing.filter(F.col(day_col) <= F.lit(hi))
        # Batch-wins survivor choice: drop existing rows whose key the batch
        # re-delivers, then union — deterministic, unlike dropDuplicates on
        # the union (arbitrary survivor when payloads differ).
        survivors = existing.select(*batch.columns).join(
            batch.select(*keys), keys, "left_anti"
        )
        merged = survivors.unionByName(batch)
    else:
        merged = batch
    overwrite_partitions(merged.repartition(F.col(day_col)), path, [day_col])


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Idempotent partition-level overwrite (dynamic mode): re-running a
    batch rewrites exactly the partitions it touches, nothing else."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


_VERSION_PTR = "_CURRENT"


def _current_version(path: str) -> int:
    ptr = os.path.join(path, _VERSION_PTR)
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def list_versions(path: str) -> list[int]:
    """Versions still readable under ``path`` (ascending)."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


class VersionConflictError(RuntimeError):
    """Another writer committed the version this writer was about to claim
    (or the table moved past the caller's ``expected_base``)."""


def reconcile_versions(path: str) -> int:
    """Heal a versioned table after a writer crash and return the current
    version. The commit point of the protocol is the atomic rename of the
    staged dir to ``vN``; the ``_CURRENT`` pointer flip is visibility
    bookkeeping that can lag behind after a crash. If a committed ``vN``
    dir exists beyond the pointer, flip the pointer forward to the newest
    committed version (idempotent; safe under concurrent writers because
    version dirs are immutable once renamed into place). Stale
    ``vN.commit`` markers without a ``vN`` dir — the permanent-wedge state
    of the pre-round-5 marker-first protocol — are removed as abandoned
    claims."""
    cur = _current_version(path)
    committed = list_versions(path)
    newest = committed[-1] if committed else 0
    if newest > cur:
        tmp = os.path.join(path, f".{_VERSION_PTR}.heal.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(str(newest))
        os.replace(tmp, os.path.join(path, _VERSION_PTR))
        cur = newest
    have = set(committed)
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        names = []
    for name in names:
        if name.startswith("v") and name.endswith(".commit") and name[1:-7].isdigit():
            if int(name[1:-7]) not in have and int(name[1:-7]) > cur:
                try:
                    os.remove(os.path.join(path, name))  # abandoned claim
                except FileNotFoundError:
                    pass
    return cur


def commit_staged_version(
    path: str, stage: str, version: int, keep: int = 3
) -> int:
    """Atomically publish a fully-staged directory as ``v{version}``.

    The single ``os.rename(stage, vN)`` IS the commit point: a rename
    onto an existing non-empty ``vN`` fails with ENOTEMPTY/EEXIST, which
    is the local-FS analogue of the put-if-absent Delta performs on its
    ``_delta_log`` JSON to serialize concurrent writers. The loser's
    staged data is its own private dir (never shared), so losing cleans
    up only the loser's bytes and can never corrupt the winner's. The
    ``vN.commit`` marker and the ``_CURRENT`` pointer flip happen AFTER
    the rename — a crash between them is healed by
    :func:`reconcile_versions` on the next write, so there is no wedge
    state. Raises :class:`VersionConflictError` on losing the race; only
    the race errnos (EEXIST/ENOTEMPTY/EISDIR/EPERM — "target already
    exists") are treated as a conflict, any other OSError (EACCES, EXDEV,
    I/O failure) re-raises unchanged with the staged data left intact so
    a non-retryable fault is not misreported as a retryable conflict."""
    import errno

    vdir = os.path.join(path, f"v{version:08d}")
    try:
        os.rename(stage, vdir)
    except OSError as e:
        if e.errno not in (
            errno.EEXIST,
            errno.ENOTEMPTY,
            errno.EISDIR,
            errno.EPERM,
        ):
            raise  # real I/O / permission / cross-device fault, not a race
        shutil.rmtree(stage, ignore_errors=True)  # only OUR stage, never the winner's
        raise VersionConflictError(
            f"{path}: version {version} was committed by a concurrent writer"
        ) from None
    marker = os.path.join(path, f"v{version:08d}.commit")
    with open(marker, "w"):
        pass  # bookkeeping only; the rename above already committed
    ptr = os.path.join(path, _VERSION_PTR)
    tmp = os.path.join(path, f".{_VERSION_PTR}.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(version))
    # Never flip the pointer backwards: a slow writer finishing version N
    # after a faster one already published N+1 must not roll visibility
    # back. (Can't happen for the same-number race — the rename arbiter
    # rejects it — but can for distinct numbers under reconcile healing.)
    if _current_version(path) <= version:
        os.replace(tmp, ptr)  # atomic pointer flip
    else:
        os.remove(tmp)
    for v in list_versions(path)[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(path, f"v{v:08d}"), ignore_errors=True)
        try:
            os.remove(os.path.join(path, f"v{v:08d}.commit"))
        except FileNotFoundError:
            pass
    return version


def versioned_overwrite(
    df: DataFrame, path: str, keep: int = 3, expected_base: int | None = None
) -> int:
    """Overwrite that RETAINS history: Delta-style time travel's observable
    read semantics without delta-spark (reference gold_dim_branch.py:178
    ``DeltaTable.forPath`` + ``versionAsOf``).

    Each call heals any crashed predecessor (:func:`reconcile_versions`),
    stages a fresh version directory under a PER-WRITER unique name
    (``.vN.stage-<uuid>`` — two racing writers never touch each other's
    staged bytes), then commits via :func:`commit_staged_version`, whose
    single atomic rename to ``vN`` arbitrates the race. The loser cleans
    up only its own staged data and raises :class:`VersionConflictError`
    so the caller re-reads and retries (optimistic concurrency). Readers
    that resolved the pointer before the flip keep reading their
    (immutable) version dir — writers never mutate a published version,
    the same snapshot-isolation contract Delta gives.

    ``expected_base`` opts into compare-and-swap semantics: the write
    aborts (before any data is written) unless the current version still
    equals it — the transactional-MERGE guard for read-modify-write
    updates, where blindly winning the commit race would lose the other
    writer's rows. The ``keep`` most recent versions survive pruning.
    Returns the new version number.
    """
    os.makedirs(path, exist_ok=True)
    cur = reconcile_versions(path)
    if expected_base is not None and cur != expected_base:
        raise VersionConflictError(
            f"{path}: expected base version {expected_base}, found {cur}"
        )
    nxt = cur + 1
    stage = os.path.join(path, f".v{nxt:08d}.stage-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(stage)
    return commit_staged_version(path, stage, nxt, keep=keep)


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Time-travel read: ``version=None`` reads the current pointer,
    otherwise the requested retained version (Delta's ``versionAsOf``)."""
    v = _current_version(path) if version is None else version
    vdir = os.path.join(path, f"v{v:08d}")
    if v == 0 or not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} not retained at {path}")
    return spark.read.parquet(vdir)


def write_bucketed(
    df: DataFrame, table: str, bucket_keys: list[str], num_buckets: int = 16
) -> None:
    """Persist as a bucketed managed table: rows are hash-partitioned into
    ``num_buckets`` files per partition BY KEY AT WRITE TIME, so any later
    equi-join or agg on the bucket keys skips its Exchange entirely — the
    pre-shuffle is amortized across every downstream consumer. This is the
    co-located-join design for repeatedly joined 100 TB fact tables.

    Uses the session catalog (in-memory or Hive); bucketing metadata lives
    with the table, Catalyst picks it up automatically.

    The pre-write repartition onto the bucket keys is the standard
    bucketed-write discipline (r10): without it every input task opens a
    file in every bucket it sees — tasks × num_buckets small files at
    any scale — while one key-clustered exchange leaves ~one file per
    bucket and the same bucket metadata.
    """
    (
        df.repartition(num_buckets, *bucket_keys)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*bucket_keys)
        .saveAsTable(table)
    )
