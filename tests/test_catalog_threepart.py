"""3-level-namespace parity: the SessionAliasCatalog plugin resolves the
reference's verbatim ``cars_catalog.gold.*`` identifiers
(reference databricks_notebooks/database_notebook.py:8-23) against the
same warehouse the 2-part session-catalog names serve.

The plugin wraps metastore parquet tables as V2 ParquetTable with a
truncate-capable write builder (java/idps/catalog/*.java), so create /
insert / overwrite / drop all work through the 3-part name AND stay
consistent with 2-part access — which is what these tests pin in both
directions.
"""

from __future__ import annotations

import pytest

from incremental_data_pipeline_spark.sources.catalog import (
    LayerCatalog,
    three_part_enabled,
)


@pytest.fixture()
def cat(spark):
    c = LayerCatalog(spark)
    yield c
    spark.sql("DROP TABLE IF EXISTS cars_catalog.gold.tp_probe")


def test_plugin_available_in_engine_sessions(spark):
    """Sessions built by get_spark carry java/idps.jar on the driver
    classpath, so the 3-part surface must be live in the test session."""
    assert three_part_enabled(spark)


def test_three_part_roundtrip_and_two_part_consistency(spark, cat):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df.write.mode("overwrite").saveAsTable("cars_catalog.gold.tp_probe")
    assert spark.catalog.tableExists("cars_catalog.gold.tp_probe")
    got3 = sorted(spark.sql("SELECT * FROM cars_catalog.gold.tp_probe").collect())
    got2 = sorted(spark.table("gold.tp_probe").collect())
    assert got3 == got2 == sorted(df.collect())


def test_three_part_insert_visible_both_ways(spark, cat):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    df.write.mode("overwrite").saveAsTable("cars_catalog.gold.tp_probe")
    spark.sql("INSERT INTO cars_catalog.gold.tp_probe VALUES (2, 'b')")
    assert spark.sql("SELECT count(*) AS n FROM cars_catalog.gold.tp_probe").first()["n"] == 2
    # the V2 commit refreshes the session catalog's cached V1 relation
    assert spark.table("gold.tp_probe").count() == 2


def test_three_part_overwrite_replaces(spark, cat):
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.mode(
        "overwrite"
    ).saveAsTable("cars_catalog.gold.tp_probe")
    spark.createDataFrame([(9, "z")], "k int, v string").write.mode(
        "overwrite"
    ).saveAsTable("cars_catalog.gold.tp_probe")
    assert [tuple(r) for r in spark.table("gold.tp_probe").collect()] == [(9, "z")]
    assert [
        tuple(r) for r in spark.sql("SELECT * FROM cars_catalog.gold.tp_probe").collect()
    ] == [(9, "z")]


def test_two_part_write_visible_through_three_part(spark, cat):
    spark.createDataFrame([(1, "a")], "k int, v string").write.mode(
        "overwrite"
    ).saveAsTable("cars_catalog.gold.tp_probe")
    spark.createDataFrame([(2, "b")], "k int, v string").write.mode(
        "append"
    ).saveAsTable("gold.tp_probe")
    assert (
        spark.sql("SELECT count(*) AS n FROM cars_catalog.gold.tp_probe").first()["n"]
        == 2
    )


def test_three_part_drop_and_show(spark, cat):
    spark.createDataFrame([(1, "a")], "k int, v string").write.mode(
        "overwrite"
    ).saveAsTable("cars_catalog.gold.tp_probe")
    names = [r["tableName"] for r in spark.sql("SHOW TABLES IN cars_catalog.gold").collect()]
    assert "tp_probe" in names
    spark.sql("DROP TABLE cars_catalog.gold.tp_probe")
    assert not spark.catalog.tableExists("cars_catalog.gold.tp_probe")
    assert not spark.catalog.tableExists("gold.tp_probe")
