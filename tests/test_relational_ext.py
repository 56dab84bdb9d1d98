"""Extended relational surface: rollup/cube, analytic windows, set ops,
skew-safe salted join, as-of join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_query_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "agg_rollup",
        "agg_cube",
        "window_lag_gap",
        "except_lapsed_custs",
        "salted_join_revenue",
        "asof_join_last_order",
    ],
)
def test_extended_relational_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_salted_join_equals_plain_join(spark):
    """Salting is physical-only: row-level results match the plain join."""
    from incremental_data_pipeline_spark.operators.relational import salted_join
    from incremental_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, "o_orderkey")
    salted = salted_join(li, o, ["o_orderkey"], n_salts=4)
    assert sorted(map(repr, plain.collect())) == sorted(map(repr, salted.collect()))


def test_asof_join_tie_and_miss_semantics(spark):
    """Equal timestamps match (<=); keys with no prior right row get NULL."""
    from incremental_data_pipeline_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c")], "k int, ts double, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10.0, 100), (1, 15.0, 150), (2, 6.0, 999)], "k int, rts double, v int"
    )
    out = {r["tag"]: r["v"] for r in asof_join(left, right, ["k"], "ts", "rts", ["v"]).collect()}
    assert out == {"a": 100, "b": 150, "c": None}


def test_json_props_stats_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "json_props_stats")


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Joining two tables bucketed on the join key runs with ZERO Exchange
    operators — the write-time hash partitioning is reused by Catalyst.
    This is the co-located-join path for repeatedly joined big tables."""
    from incremental_data_pipeline_spark.sources.readers import load_table
    from incremental_data_pipeline_spark.sources.sinks import write_bucketed

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "bkt_lineitem", ["l_orderkey"], num_buckets=8)
    write_bucketed(o, "bkt_orders", ["l_orderkey"], num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (broadcast would win on fixture-sized
        # tables and hide the bucketing effect this test demonstrates)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_lineitem").join(spark.table("bkt_orders"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and the result is still the plain join
        assert joined.count() == li.join(o, "l_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_sketch_stats_accuracy(spark):
    """The query's error-contract booleans hold, and the exact anchor agrees
    with an independently computed distinct count (the booleans themselves
    are hash-audited against a literal-TRUE DuckDB oracle)."""
    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from incremental_data_pipeline_spark.sources.readers import load_table

    row = QUERIES["sketch_stats"](spark, SF_DIR).first()
    li = load_table(spark, SF_DIR, "lineitem")
    assert row["exact_orders"] == li.select("l_orderkey").distinct().count()
    for flag in ("hll_within_5pct", "p50_in_rank_bounds",
                 "p95_in_rank_bounds", "p99_in_rank_bounds"):
        assert row[flag] is True, flag


def test_expectations_split_partitions_rows(spark):
    """good + quarantined == input, disjointly; the quarantined side names
    exactly the rules each row failed (null == failure)."""
    from incremental_data_pipeline_spark.operators import expectations as dq

    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, 10.0, None), (4, -1.0, None)],
        "id int, v double, s string",
    )
    rules = {"pos_v": F.col("v") > 0, "has_s": F.col("s").isNotNull()}
    good, bad = dq.enforce_expectations(df, rules)
    assert {r["id"] for r in good.collect()} == {1}
    failed = {r["id"]: list(r["failed_rules"]) for r in bad.collect()}
    assert failed == {2: ["pos_v"], 3: ["has_s"], 4: ["pos_v", "has_s"]}

    report = {
        r["rule"]: (r["n_pass"], r["n_fail"])
        for r in dq.expectation_report(df, rules).collect()
    }
    assert report == {"pos_v": (2, 2), "has_s": (2, 2)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pos_v"):
        dq.fail_on_violation(df, rules)
    clean = df.filter("id = 1")
    assert dq.fail_on_violation(clean, rules) is clean


def test_dq_queries_match_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "dq_report_lineitem")
    assert_query_matches_oracle(spark, duck, "dq_quarantine_orders")


def test_headline_plan_shapes_no_extra_shuffles(spark):
    """Plan-shape regression guard for headline queries: the shuffle and
    join strategies are part of the design (broadcast dims, single agg
    shuffle) — an extra Exchange or a SortMergeJoin sneaking in is a
    performance regression even when results stay correct."""
    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    expect = {
        # name: (max shuffle exchanges, max sort-merge joins)
        "star_join": (0, 0),             # all-broadcast FK resolution
        "pricing_summary": (2, 0),       # agg + global sort
        "shipping_priority": (1, 0),     # one fact shuffle, dims broadcast
        "supplier_nation_profit": (1, 0),
        "window_frame_stats": (1, 0),    # one shuffle on the partition key
        # ANN family: corpus never shuffles for the candidate join (query
        # side broadcast); the only exchange is the per-query top-k window
        "ann_ivf2_topk": (1, 0),
        "ann_ivf_auto_topk": (1, 0),
        "ann_lsh_auto_topk": (1, 0),
        # round-4 additions
        "pit_join_scd2": (1, 0),          # as-of union: ONE shuffle on the key
        "basket_lift": (3, 0),            # basket agg + pair agg + part counts
        "min_cost_supplier": (2, 0),      # unit-cost agg + per-part window
        "important_parts_threshold": (2, 0),
        "skew_advisor_events": (2, 0),    # freq agg + stats partial
        "cms_heavy_hitters": (4, 0),      # sketch build + exact agg + probes
        "join_size_estimate": (3, 0),
        "interleave_sources": (3, 0),     # per-source window; NO global sort
        "profile_drift_orders": (2, 1),   # tiny full-outer takes one SMJ
        # round-4 session additions
        "market_share_brand": (1, 0),     # part broadcasts; one agg shuffle
        "custdist_orders": (2, 0),        # custkey join+agg share a shuffle
        "embedding_quantize_int8": (2, 0),  # 64-row calibration broadcasts
        # grid collapse: all 4 shuffles move the distinct-(type,price)
        # GRID (bounded by types x price range), never the part rows —
        # grid build, two join-side exchanges, final rollup
        "price_band_pairs": (4, 0),
        "session_path_bigrams": (2, 0),   # user window + 25-cell agg
        "kmv_users_by_event_type": (2, 0),  # distinct + per-group bottom-k
        "customer_balance_rank_profile": (1, 0),  # both windows share a key
        "measure_correlations": (1, 0),   # nine moments in one agg pass
        "source_lang_entropy": (2, 0),    # count grid + tiny entropy agg
        "order_span_overlap_pairs": (4, 1),  # span build + custkey self-join
        "late_order_priority_check": (1, 0),  # semi-join + tiny rollup
        "null_safe_join_counts": (2, 0),      # two pre-aggs; keys join tiny
        "ivm_agg_retract": (2, 0),            # base agg + signed-partial merge
        "inventory_clamped_balance": (1, 0),  # one key shuffle into the scan
        "bag_set_ops_priorities": (2, 1),     # tiny full-outer takes one SMJ
        "multimodal_audio_decode": (0, 0),    # pure narrow Arrow maps
        "quantile_normalize_balance": (5, 0),  # incl. 2 range (scalable rank)
        # round-4 session 2
        "discount_band_revenue": (0, 0),   # pure scan-agg, no join
        "returned_item_report": (1, 0),    # quarter broadcasts; one cust agg
        "bracketed_or_revenue": (0, 0),    # pruned dim broadcasts; scan-agg
        "excess_supply_suppliers": (5, 0),  # 2 aggs + distinct + tiny sort
        "doc_familiarity": (2, 0),         # term agg broadcasts back; doc agg
        "ann_pq_topk": (1, 0),             # codebook is a literal; one top-k window
        "benford_price_audit": (1, 0),     # 9-group count + tiny window
        "group_disjoint_split": (3, 0),    # distinct users + broadcast back
        "bpe_pair_counts": (2, 0),         # vocab agg + pair agg; TakeOrdered
        "changepoint_cusum_daily": (1, 0),  # one day agg; replay is 1 group
        "orders_above_cust_avg": (1, 0),   # agg + join SHARE the custkey shuffle
        "sample_temperature_mix": (2, 0),  # lang grid + 1-row total broadcast
        "attribution_linear_touch": (2, 0),  # both windows share the user shuffle
        "fk_orphan_audit": (0, 0),         # four anti-joins, dims broadcast
        "sequence_pattern_match": (2, 0),  # path agg + 3-row pattern rollup
        "dedup_normalized_exact": (1, 0),  # group + join-back share the shuffle
        "lang_id_prf": (2, 1),             # two |lang| grids; tiny full-outer SMJ
        "k_anonymity_audit": (1, 0),       # one QI count grid
        "pmi_top_cooccurrences": (3, 0),   # pair agg + unigram agg broadcast back
        "abc_classification_parts": (1, 0),  # part grid; window on the grid
        "multimodal_ahash": (1, 0),        # hash bucket-count window
        # array verification: the extra exchanges move doc-count-sized
        # shingle ARRAYS and candidate pairs, never the exploded
        # sum(|A|+|B|) posting rows the old verify join shuffled
        "dedup_prefix_containment": (8, 0),
        "dedup_cross_doc_spans": (3, 0),   # span df + per-doc rollup
        "topk_plus_other_brands": (1, 0),  # brand grid; fold on the grid
        "contingency_residuals": (1, 0),   # seg x nation grid + margins
        "kaplan_meier_retention": (1, 0),  # user agg; replay on life table
        "holt_forecast_daily": (2, 0),     # day agg + 1-group replay
        "item_cf_similarity": (6, 0),      # 3 logical shuffles; AQE reuses dups
        "rfm_segmentation": (1, 0),        # customer grid; windows on the grid
        "catalog_profile_columns": (3, 0),  # one expand-agg pass per table
        "ivm_join_retract": (3, 0),        # v0 + two delta terms share keys
        "salted_distinct_users": (3, 0),   # dedup + per-salt + final fold
        "l_diversity_audit": (2, 0),       # QI grid count-distinct
        "rollup_cascade_monthly": (2, 0),  # daily agg + monthly re-agg
        "ab_test_purchase_rate": (6, 0),   # 3 logical shuffles; AQE reuses dups
        "search_tf_saturated": (4, 0),     # postings + dl + 2-scalar stats
        "rate_limit_violations": (1, 0),   # one user-keyed range frame
        # round-5
        "dedup_blocked_edit": (1, 0),      # one (head, band) block shuffle
        "er_blocked_match": (0, 0),        # supplier broadcasts into the block join
        "bm25_per_term_topk": (6, 0),      # tf/dl/df aggs + top-terms + window
        "robust_outlier_profile": (4, 0),  # med agg + mad agg + final grid
        "scd1_upsert_evolving": (0, 0),    # source broadcasts; anti+union
        "local_supplier_volume": (2, 0),   # one fact shuffle pair + global sort
        "ann_ivf_index_persisted": (1, 0),  # probe reads pruned cells; 1 top-k window
        "stream_ivf_index_upsert": (1, 0),  # same probe shape, streamed build
    }
    for name, (max_shuffles, max_smj) in expect.items():
        plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        assert shuffles <= max_shuffles, (name, shuffles, plan[:2000])
        assert plan.count("SortMergeJoin") <= max_smj, (name, plan[:2000])


def test_golden_record_pairs_plan_is_qgram_prefix_join(spark):
    """Plan-shape pin for golden_record_parts' candidate stage: pairs
    MUST come from the q-gram prefix join, never a brand-blocked
    quadratic self-join. A brand block has ~25 values forever, so
    within-block pairs grow corpus-quadratically — the r8 sf10 mirror
    found the old self-join version stuck at ~8e10 levenshtein calls.
    Two pins: (a) the query source routes through qgram_edit_pairs;
    (b) the physical plan of that stage joins on the gram column __g
    (the quadratic shape has no gram column anywhere) with no
    cartesian / nested-loop join."""
    import inspect

    from incremental_data_pipeline_spark.operators import dedup as dd
    from incremental_data_pipeline_spark.plans import queries as q

    src = inspect.getsource(q.golden_record_parts)
    assert "qgram_edit_pairs" in src, "golden_record_parts no longer uses the prefix join"

    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    pairs = dd.qgram_edit_pairs(
        p.select("p_partkey", "p_brand", "p_name"),
        "p_partkey",
        "p_name",
        max_dist=3,
        q=3,
        group_cols=("p_brand",),
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "__g" in plan, plan[:2000]  # gram-keyed join present
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_observation_result_probe_and_timeout(spark):
    """observation_result returns metrics once an action ran over the
    observed frame, and None (no unbounded block) when none ever did."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from incremental_data_pipeline_spark.functions.util import observation_result

    df = spark.range(100)
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    observed.collect()
    got = observation_result(obs, timeout_s=10.0)
    assert got is not None and got["n"] == 100

    stale = Observation()
    never_run = df.observe(stale, F.count(F.lit(1)).alias("n"))
    assert never_run is not None
    assert observation_result(stale, timeout_s=0.3) is None


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    """Bloom prefilter must keep EVERY true-matching fact row (no false
    negatives), actually prune at the chosen m/k, and run as a scan-stage
    filter on the fact side rather than after the join shuffle."""
    from pyspark.sql import functions as F

    from incremental_data_pipeline_spark.operators import relational
    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from incremental_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, SF_DIR, "part").filter(F.col("p_size") <= 5)
    keys = {r[0] for r in p.select("p_partkey").distinct().collect()}

    bitmap = relational.bloom_build(p, "p_partkey", m_bits=1 << 16, n_hashes=5)
    pruned = relational.bloom_prefilter(li, bitmap, "l_partkey", n_hashes=5)

    kept = {r[0] for r in pruned.select("l_partkey").distinct().collect()}
    truly_matching = {
        r[0]
        for r in li.select("l_partkey").distinct().collect()
        if r[0] in keys
    }
    assert truly_matching <= kept, "bloom dropped a true match (false negative)"

    n_all = li.count()
    n_kept = pruned.count()
    sel = len(truly_matching) / max(
        li.select("l_partkey").distinct().count(), 1
    )
    # kept fraction should be near the true selectivity, not near 1.0
    assert n_kept < n_all * min(1.0, sel + 0.15), (n_kept, n_all, sel)

    # plan: the membership test is a Filter in the fact scan stage, below
    # the join exchange, and the join is not broadcast (merge-hinted)
    plan = (
        QUERIES["bloom_prejoin_revenue"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "xxhash64" in plan
    fact_scan = plan.find("Scan parquet")  # first scan block
    assert fact_scan != -1
    join_at = plan.find("SortMergeJoin")
    assert plan.find("xxhash64") < join_at or plan.rfind("xxhash64") > 0


def test_bfs_hops_handcrafted_graph(spark):
    """Min-hop labels on a known graph: chain 1-2-3-4 plus a shortcut 1-4
    — node 4 must label hop 1 (via the shortcut), never hop 3; node 5 is
    unreachable and must be absent."""
    from incremental_data_pipeline_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (5, 5)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, 3).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


def test_interval_count_join_before_direction_edges(spark):
    """direction='before' must be STRICT at the anchor (leakage guard) and
    inclusive at the window start: probes at t-window and t-1 count, the
    probe exactly AT the anchor does not."""
    import datetime as dt

    from incremental_data_pipeline_spark.operators.relational import (
        interval_count_join,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    anchors = spark.createDataFrame(
        [(1, 100, t0)], ["user_id", "event_id", "ts"]
    )
    probes = spark.createDataFrame(
        [
            (1, t0),                                  # at anchor: excluded
            (1, t0 - dt.timedelta(seconds=1)),        # inside
            (1, t0 - dt.timedelta(seconds=3600)),     # at window start: included
            (1, t0 - dt.timedelta(seconds=3601)),     # too old
            (1, t0 + dt.timedelta(seconds=1)),        # future: excluded
        ],
        ["user_id", "ts"],
    )
    out = interval_count_join(
        anchors, probes, ["user_id"], "ts", 3600, "event_id",
        count_alias="n", direction="before",
    ).collect()
    assert out[0]["n"] == 2


def test_hard_negatives_excludes_same_label(spark):
    """No returned negative may share the query's label, and ranks must be
    contiguous from 1 per query."""
    from incremental_data_pipeline_spark.operators.similarity import hard_negatives
    from incremental_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, emb.filter("vec_id < 10"), k=3).collect()
    by_q = {}
    for r in out:
        assert labels[r["neighbor_id"]] == r["neg_label"]
        assert r["neg_label"] != labels[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_band_join_lossless_on_boundaries(spark):
    """The band ±1 fan-out must find EXACTLY the pairs the all-pairs
    theta join finds, including diffs exactly at the threshold and
    prices exactly on band edges."""
    import itertools

    from incremental_data_pipeline_spark.plans.queries import QUERIES

    prices = [10.0, 11.0, 11.5, 12.0, 12.5, 13.999, 15.0, 16.0, 16.0]
    rows = [(i, "T", p) for i, p in enumerate(prices)]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_type string, p_retailprice double"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "part.parquet"))
        got = {
            (r["p_type"], r["n_pairs"])
            for r in QUERIES["price_band_pairs"](spark, d).collect()
        }
    brute = [
        (a, b)
        for a, b in itertools.combinations(range(len(prices)), 2)
        if abs(prices[a] - prices[b]) <= 1.0
    ]
    assert got == {("T", len(brute))}


def test_kmv_by_group_exact_under_k(spark):
    """A group with fewer than k distinct values must report the EXACT
    distinct count (the sketch is the whole value set)."""
    from incremental_data_pipeline_spark.operators import sketches

    rows = [("g1", v % 5) for v in range(50)] + [("g2", v) for v in range(30)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        r["g"]: (r["k_used"], r["est_distinct"])
        for r in sketches.kmv_distinct_by_group(df, ["g"], ["v"], k=16).collect()
    }
    assert got["g1"] == (5, 5.0)          # 5 < k: exact
    assert got["g2"][0] == 16             # filled sketch: k rows retained
    assert 15 <= got["g2"][1] <= 90       # estimate in a sane band for n=30


def test_dpp_plan_has_runtime_partition_filter(spark):
    """`dynamic_partition_pruning_join` must carry a dynamicpruning
    partition filter on the fact scan — losing it silently turns a
    2-partition read into a full-table scan at real scale."""
    from incremental_data_pipeline_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    plan = (
        QUERIES["dynamic_partition_pruning_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_skyline_duplicate_and_tie_semantics(spark):
    """Skyline edge semantics: duplicate (price, size) points do NOT
    dominate each other (both members count under one frontier point);
    equal-price smaller-size dominates; equal-size cheaper dominates."""
    import os
    import tempfile

    from incremental_data_pipeline_spark.plans.queries import QUERIES

    rows = [
        (1, "T", 1.0, 5),   # frontier (duplicated below)
        (2, "T", 1.0, 5),   # same point — shares the frontier cell
        (3, "T", 1.0, 7),   # dominated: same price, larger size
        (4, "T", 2.0, 3),   # frontier: smaller size than anything cheaper
        (5, "T", 2.0, 4),   # dominated by (2.0, 3)
        (6, "T", 3.0, 3),   # dominated by (2.0, 3): same size, pricier
        (7, "T", 0.5, 9),   # frontier: cheapest overall
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_type string, p_retailprice double, p_size int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "part.parquet"))
        got = {
            (r["price"], r["sz"]): r["n_parts"]
            for r in QUERIES["skyline_parts_pareto"](spark, d).collect()
        }
    assert got == {(0.5, 9): 1, (1.0, 5): 2, (2.0, 3): 1}


def test_runtime_bloom_filter_injected_on_selective_join(spark):
    """Catalyst's runtime Bloom-filter join (the engine-native cousin of
    operators/relational.py's explicit Bloom prefilter): with the optimizer
    flag on and a selective build side, the probe-side scan must carry a
    BloomFilterMightContain runtime filter so fact rows are dropped before
    the shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the matching slice."""
    from incremental_data_pipeline_spark.sources.readers import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # fixture-sized thresholds so injection triggers at test scale:
        # the probe side must look "big" (default gate is 10GB of scan)
        # and the filtered build side "small"
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 400000  # selective build side
        )
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
        # filter is an optimization, never a semantics change
        n_with = joined.count()
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        li2 = load_table(spark, SF_DIR, "lineitem")
        o2 = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        assert li2.join(o2, F.col("l_orderkey") == F.col("o_orderkey")).count() == n_with
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)
