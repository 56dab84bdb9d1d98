"""End-to-end incremental-pipeline semantics: watermark convergence, replay
idempotence, SCD1 attribute refresh + key stability, fact FK resolution.
These encode the reference-shaped correctness scenarios from SURVEY §5."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_data_pipeline_spark.plans.medallion import MedallionPipeline
from incremental_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def _ts(s: str):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_watermark_batches_converge_to_full_set(spark, tmp_path):
    """Three incremental batches == one full load; rerunning the last batch
    window adds nothing (replay-safe)."""
    pipe = MedallionPipeline(spark, str(tmp_path))
    events = load_table(spark, SF_DIR, "events")

    cuts = ["2024-01-08 00:00:00", "2024-01-20 00:00:00", "2024-02-01 00:00:00"]
    total = 0
    for cut in cuts:
        total += pipe.ingest_bronze(
            events, "events", "ts", ["event_id"], _ts("2023-01-01 00:00:00"), _ts(cut)
        )

    bronze = pipe.read("bronze", "events")
    assert bronze.count() == events.count() == total

    # Replay: watermark already at the final cut → empty window; and even a
    # forced replay of the full range cannot duplicate (idempotent sink).
    n = pipe.ingest_bronze(
        events, "events", "ts", ["event_id"], _ts("2023-01-01 00:00:00"), _ts(cuts[-1])
    )
    assert n == 0
    pipe2 = MedallionPipeline(spark, str(tmp_path))  # fresh store, stale watermark
    store_path = pipe2.path("state", "events_watermark")
    spark.createDataFrame([(_ts("2023-01-01 00:00:00"),)], ["last_load"]).write.mode(
        "overwrite"
    ).parquet(store_path + ".__reset__")
    import shutil

    shutil.rmtree(store_path)
    shutil.move(store_path + ".__reset__", store_path)
    pipe2.ingest_bronze(
        events, "events", "ts", ["event_id"], _ts("2023-01-01 00:00:00"), _ts(cuts[-1])
    )
    assert pipe2.read("bronze", "events").count() == events.count()


def test_scd1_dim_upsert_refreshes_attrs_and_keeps_keys(spark, tmp_path):
    """SCD1: run twice converges; changed attributes update in place;
    surrogate keys of existing members never change; new members extend
    the key range densely."""
    pipe = MedallionPipeline(spark, str(tmp_path))
    cust = load_table(spark, SF_DIR, "customer")

    batch1 = cust.filter(F.col("c_custkey") <= 100)
    dim1 = pipe.build_gold_dim(
        "dim_customer", batch1, ["c_custkey"], ["c_name", "c_mktsegment"], "dim_customer_key"
    )
    keys1 = {r["c_custkey"]: r["dim_customer_key"] for r in dim1.collect()}
    assert sorted(keys1.values()) == list(range(1, len(keys1) + 1))  # dense from 1

    # batch2: 50 updated members (renamed) + the rest of the table as inserts
    updated = (
        cust.filter(F.col("c_custkey") <= 50)
        .withColumn("c_name", F.concat(F.lit("RENAMED-"), F.col("c_name")))
    )
    inserts = cust.filter(F.col("c_custkey") > 100)
    dim2 = pipe.build_gold_dim(
        "dim_customer",
        updated.unionByName(inserts),
        ["c_custkey"],
        ["c_name", "c_mktsegment"],
        "dim_customer_key",
    )
    rows2 = {r["c_custkey"]: r for r in dim2.collect()}
    assert dim2.count() == cust.count()
    # existing keys stable
    assert all(rows2[k]["dim_customer_key"] == v for k, v in keys1.items())
    # updated attrs refreshed, untouched attrs kept
    assert all(rows2[k]["c_name"].startswith("RENAMED-") for k in range(1, 51) if k in rows2)
    # new keys dense continuation
    new_keys = sorted(
        r["dim_customer_key"] for ck, r in rows2.items() if ck not in keys1
    )
    assert new_keys == list(range(len(keys1) + 1, cust.count() + 1))

    # convergence: re-applying the same batch changes nothing
    # (snapshot first: the swap invalidates previously returned handles)
    dim2_rows = sorted(tuple(r) for r in dim2.collect())
    dim3 = pipe.build_gold_dim(
        "dim_customer",
        updated.unionByName(inserts),
        ["c_custkey"],
        ["c_name", "c_mktsegment"],
        "dim_customer_key",
    )
    assert sorted(tuple(r) for r in dim3.collect()) == dim2_rows


def test_fact_fk_resolution_with_late_dim(spark, tmp_path):
    """Fact rows joining a missing dim member keep a NULL FK (reference
    left-join behavior, gold_fact.py:34-38) instead of being dropped."""
    pipe = MedallionPipeline(spark, str(tmp_path))
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part")

    dim_part = pipe.build_gold_dim(
        "dim_part", part.filter(F.col("p_partkey") <= 100), ["p_partkey"], ["p_brand"], "dim_part_key"
    )
    fact = pipe.build_gold_fact(
        "fact_lineitem",
        li,
        {"dim_part_key": (dim_part, {"l_partkey": "p_partkey"})},
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    assert fact.count() == li.count()  # no rows dropped
    n_null = fact.filter(F.col("dim_part_key").isNull()).count()
    n_late = li.filter(F.col("l_partkey") > 100).count()
    assert n_null == n_late


def test_atomic_overwrite_self_read(spark, tmp_path):
    """Overwriting a table with a plan derived from itself must not corrupt
    it (the Spark read-overwrite trap the temp-swap sink exists for)."""
    from incremental_data_pipeline_spark.sources.sinks import atomic_overwrite

    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    df = spark.read.parquet(p).withColumn("id", F.col("id") + 1)
    atomic_overwrite(df, p)
    out = spark.read.parquet(p)
    assert out.count() == 100
    assert out.agg(F.min("id")).first()[0] == 1


def test_partitioned_bronze_converges_with_midday_cuts(spark, tmp_path):
    """Day-partitioned bronze: batches cut MID-day still converge to the
    full set (the partial day's earlier rows survive the dynamic partition
    overwrite), and a replay adds nothing."""
    pipe = MedallionPipeline(spark, str(tmp_path))
    events = load_table(spark, SF_DIR, "events")

    cuts = ["2024-01-08 13:30:00", "2024-01-20 07:45:00", "2024-02-01 00:00:00"]
    for cut in cuts:
        pipe.ingest_bronze(
            events, "events", "ts", ["event_id"],
            _ts("2023-01-01 00:00:00"), _ts(cut), partition_daily=True,
        )
    bronze = pipe.read("bronze", "events")
    assert bronze.count() == events.count()
    assert bronze.select("event_id").distinct().count() == events.count()
    # partition layout: one __day directory per event day
    assert "__day" in bronze.columns

    # forced replay of the final window cannot duplicate
    import shutil
    store_path = pipe.path("state", "events_watermark")
    shutil.rmtree(store_path)
    n = pipe.ingest_bronze(
        events, "events", "ts", ["event_id"],
        _ts("2024-01-20 07:45:00"), _ts(cuts[-1]), partition_daily=True,
    )
    assert n > 0  # the window re-delivers rows...
    assert pipe.read("bronze", "events").count() == events.count()  # ...but no dupes


def test_merge_partial_aggs_equals_full_rebuild_any_split(spark):
    """The incremental-maintenance invariant: gold(pre) + batch(post) must
    equal the from-scratch aggregate, for ANY watermark split — including
    an empty batch (no-op) and an all-in-batch split (bootstrap)."""
    import datetime

    from incremental_data_pipeline_spark.operators import cdc
    from incremental_data_pipeline_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    sums = {
        "sum_cents": F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint"),
        "n_events": F.count(F.lit(1)).cast("bigint"),
    }
    keys = ["user_id", "event_type"]
    full = {
        tuple(r)[:2]: tuple(r)[2:]
        for r in ev.groupBy(*keys)
        .agg(*[c.alias(n) for n, c in sums.items()])
        .collect()
    }
    for cut in ("2023-01-01", "2024-01-20", "2030-01-01"):
        w = datetime.datetime.fromisoformat(cut)
        gold = (
            ev.filter(F.col("ts") <= F.lit(w))
            .groupBy(*keys)
            .agg(*[c.alias(n) for n, c in sums.items()])
        )
        merged = cdc.merge_partial_aggs(
            gold, ev.filter(F.col("ts") > F.lit(w)), keys, sums
        )
        got = {tuple(r)[:2]: tuple(r)[2:] for r in merged.collect()}
        assert got == full, cut


def test_snapshot_diff_classifies_and_handles_nulls(spark):
    from incremental_data_pipeline_spark.operators import cdc

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "c", 31.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    rows = {r["k"]: r for r in cdc.snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert set(rows) == {1, 3, 5}  # 2 and 4 unchanged (null-safe compare)
    assert rows[1]["op"] == "delete" and rows[1]["s"] is None
    assert rows[3]["op"] == "update" and rows[3]["v"] == 31.0
    assert rows[5]["op"] == "insert" and rows[5]["s"] == "e"


def test_reconcile_checksums_localizes_divergence(spark):
    """Identical copies reconcile clean; a perturbed replica's mismatched
    buckets are exactly the buckets of the touched keys."""
    from incremental_data_pipeline_spark.operators import cdc
    from incremental_data_pipeline_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    clean = cdc.reconcile_checksums(orders, orders, ["k"], ["status", "cents"], 32)
    assert clean.filter("NOT match").count() == 0
    assert clean.count() == clean.filter("n_left = n_right").count()

    touched = orders.filter(F.col("k") % 97 == 0)
    corrupted = orders.filter(F.col("k") % 97 != 0)
    rec = cdc.reconcile_checksums(orders, corrupted, ["k"], ["status", "cents"], 32)
    bad_buckets = {r["bucket"] for r in rec.filter("NOT match").collect()}
    expect_buckets = {
        r[0]
        for r in touched.select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("v"), F.col("k").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                )
                .cast("long") % 32
            ).alias("b")
        ).collect()
    }
    assert bad_buckets == expect_buckets


def test_reconcile_checksums_null_injective(spark):
    """('a', NULL, 'b') vs ('a', 'b', NULL) must digest differently: NULL
    is encoded as its own token, never silently skipped (the concat_ws
    pitfall), so a NULL slide between columns is detected."""
    from incremental_data_pipeline_spark.operators import cdc

    schema = "k string, v1 string, v2 string"
    left = spark.createDataFrame([("a", None, "b")], schema)
    right = spark.createDataFrame([("a", "b", None)], schema)
    rec = cdc.reconcile_checksums(left, right, ["k"], ["v1", "v2"], 8)
    assert rec.filter("NOT match").count() == 1
    # and the self-comparison with NULLs present is still clean
    same = cdc.reconcile_checksums(left, left, ["k"], ["v1", "v2"], 8)
    assert same.filter("NOT match").count() == 0


def test_scd2_idempotent_and_versions_chain(spark):
    """Re-applying an identical batch is a no-op (attributes unchanged =>
    no new version); a second real change chains a third version with
    correct validity windows."""
    import datetime

    from incremental_data_pipeline_spark.operators import scd
    from pyspark.sql import functions as F

    d0, d1, d2 = (
        datetime.date(2024, 1, 1),
        datetime.date(2024, 2, 1),
        datetime.date(2024, 3, 1),
    )
    dim0 = spark.createDataFrame(
        [(1, 100), (2, 200)], "k long, v long"
    ).select(
        "k", "v",
        F.lit(d0).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    batch1 = spark.createDataFrame([(1, 150), (3, 300)], "k long, v long")
    dim1 = scd.upsert_scd2(dim0, batch1, ["k"], ["v"], d1)
    # replay of the same batch: attribute values now match => no-op
    dim1_replay = scd.upsert_scd2(dim1, batch1, ["k"], ["v"], d2)
    assert sorted(map(tuple, dim1.collect())) == sorted(map(tuple, dim1_replay.collect()))

    batch2 = spark.createDataFrame([(1, 175)], "k long, v long")
    dim2 = scd.upsert_scd2(dim1, batch2, ["k"], ["v"], d2)
    rows = {(r["k"], r["v"]): r for r in dim2.collect()}
    assert len(rows) == 5  # k1: 3 versions; k2: 1; k3: 1
    assert rows[(1, 100)]["valid_to"] == d1 and not rows[(1, 100)]["is_current"]
    assert rows[(1, 150)]["valid_to"] == d2 and not rows[(1, 150)]["is_current"]
    assert rows[(1, 175)]["valid_from"] == d2 and rows[(1, 175)]["is_current"]
    assert rows[(2, 200)]["is_current"] and rows[(2, 200)]["valid_to"] is None
    assert rows[(3, 300)]["valid_from"] == d1 and rows[(3, 300)]["is_current"]


def test_close_deleted_replay_noop_and_history_kept(spark):
    """Closing a deleted key ends its open version only; closed history
    rows are untouched, unknown delete keys are no-ops, and replaying
    the same delete batch yields the identical table."""
    import datetime

    from incremental_data_pipeline_spark.operators import scd

    d0, d1, d2 = (
        datetime.date(2024, 1, 1),
        datetime.date(2024, 2, 1),
        datetime.date(2024, 3, 1),
    )
    dim = spark.createDataFrame(
        [
            (1, 100, d0, d1, False),   # closed history — must not change
            (1, 150, d1, None, True),  # open version of deleted key
            (2, 200, d0, None, True),  # survivor
        ],
        "k int, v int, valid_from date, valid_to date, is_current boolean",
    )
    deletes = spark.createDataFrame([(1,), (99,)], "k int")  # 99 unknown
    once = scd.close_deleted(dim, deletes, ["k"], d2)
    rows = {(r["k"], r["v"]): r for r in once.collect()}
    assert rows[(1, 100)]["valid_to"] == d1 and not rows[(1, 100)]["is_current"]
    assert rows[(1, 150)]["valid_to"] == d2 and not rows[(1, 150)]["is_current"]
    assert rows[(2, 200)]["is_current"] and rows[(2, 200)]["valid_to"] is None
    assert once.count() == 3
    twice = scd.close_deleted(once, deletes, ["k"], datetime.date(2024, 4, 1))
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


def test_signed_partial_merge_retracts_exactly(spark):
    """Folding a batch in with sign +1 and then retracting the same rows
    with sign -1 restores the base rollup exactly (decimal partials), and
    a fully-retracted key's count reaches zero."""
    from incremental_data_pipeline_spark.operators import cdc

    base_rows = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", 7.5)], "k string, v double"
    )
    batch = spark.createDataFrame(
        [("a", 2.5), ("c", 1.0)], "k string, v double"
    )
    vd = F.col("v").cast("decimal(18,2)")
    base = base_rows.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(vd).alias("s")
    )
    sums_signed = {
        "n": F.sum("sign"),
        "s": F.sum(F.col("sign") * vd),
    }
    applied = cdc.merge_partial_aggs(
        base, batch.withColumn("sign", F.lit(1)), ["k"], sums_signed
    )
    retracted = cdc.merge_partial_aggs(
        applied, batch.withColumn("sign", F.lit(-1)), ["k"], sums_signed
    )
    got = {r["k"]: (r["n"], float(r["s"])) for r in retracted.collect()}
    want = {r["k"]: (r["n"], float(r["s"])) for r in base.collect()}
    assert {k: v for k, v in got.items() if v[0] != 0} == want
    assert got["c"][0] == 0  # fully-retracted key visible as zero-count


def test_max_rescan_under_deletes_scoping(spark):
    """Groups are rescanned iff a deleted row carried the group max;
    fully-deleted groups drop out; deleting a non-max row keeps the
    stored max with rescanned=False; a TIED max (duplicate value, one
    copy deleted) rescans and lands on the same value."""
    from pyspark.sql import functions as F

    from incremental_data_pipeline_spark.operators import cdc

    base = spark.createDataFrame(
        [
            # g=a: max 9.0 deleted -> rescan to 5.0
            ("a", 9.0, 1), ("a", 5.0, 0),
            # g=b: non-max deleted -> untouched, max 8.0
            ("b", 8.0, 0), ("b", 3.0, 1),
            # g=c: everything deleted -> drops out
            ("c", 4.0, 1),
            # g=d: tied max, one copy deleted -> rescan, same value
            ("d", 7.0, 1), ("d", 7.0, 0),
            # g=e: no deletes at all
            ("e", 2.0, 0),
        ],
        "g string, v double, del int",
    )
    res = cdc.max_rescan_under_deletes(
        base, F.col("del") == 1, ["g"], "v", out_col="mx", flag_col="resc"
    )
    got = {r["g"]: (r["mx"], r["resc"]) for r in res.collect()}
    assert got == {
        "a": (5.0, True),
        "b": (8.0, False),
        "d": (7.0, True),
        "e": (2.0, False),
    }


def test_dyadic_counters_merge_equals_one_shot(spark):
    """Counter mergeability — the contract stream_rank_sketch rides:
    building the dyadic CMS on two disjoint batches and summing cells
    must equal building it on the union in one pass."""
    from pyspark.sql import functions as F

    from incremental_data_pipeline_spark.operators import sketches as sk

    vals = [(v,) for v in [3, 7, 7, 100, 255, 255, 255, 1023, 4095, 9999]]
    full = spark.createDataFrame(vals, "v long")
    a = spark.createDataFrame(vals[:4], "v long")
    b = spark.createDataFrame(vals[4:], "v long")
    one = sk.dyadic_cms_counters(full, "v", 14, 256, 3)
    merged = (
        sk.dyadic_cms_counters(a, "v", 14, 256, 3)
        .unionByName(sk.dyadic_cms_counters(b, "v", 14, 256, 3))
        .groupBy("d", "cell")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    as_map = lambda df: {(r["d"], r["cell"]): r["n"] for r in df.collect()}
    assert as_map(one) == as_map(merged)
