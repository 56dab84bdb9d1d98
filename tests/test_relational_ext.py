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
