"""The local mirror of the driver's correctness gate: every registered query
with an oracle is executed on Spark AND DuckDB and exact-compared
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


def _oracle_names():
    from incremental_data_pipeline_spark.plans.queries import ORACLE

    return sorted(ORACLE)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_all_queries_return_rows(spark):
    """Queries without an oracle still must run and return a DataFrame."""
    from incremental_data_pipeline_spark.plans.queries import ORACLE, QUERIES

    for name, fn in QUERIES.items():
        if name in ORACLE:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
