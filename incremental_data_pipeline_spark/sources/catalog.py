"""Layer-aware table catalog (reference S7/S12/S13: cars_catalog.silver/gold
namespaces, tableExists gates, CREATE SCHEMA — database_notebook.py:8-23,
gold_dim_branch.py:51).

Spark's default session catalog is two-level (database.table), so the
reference's 3-level ``catalog.schema.table`` maps to ``{layer}`` databases:
``silver.events``, ``gold.dim_user``. Tables are parquet-backed managed or
path-based external tables; bucketed variants go through
sinks.write_bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class LayerCatalog:
    """bronze/silver/gold databases in the session catalog."""

    LAYERS = ("bronze", "silver", "gold", "state")

    def __init__(self, spark: SparkSession):
        self.spark = spark
        for layer in self.LAYERS:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}")

    def qualified(self, layer: str, table: str) -> str:
        return f"{layer}.{table}"

    def exists(self, layer: str, table: str) -> bool:
        """Reference: spark.catalog.tableExists('cars_catalog.gold.dim_branch')
        gating initial vs incremental builds (gold_dim_branch.py:51)."""
        return self.spark.catalog.tableExists(self.qualified(layer, table))

    def read(self, layer: str, table: str) -> DataFrame:
        return self.spark.table(self.qualified(layer, table))

    def write(self, df: DataFrame, layer: str, table: str, path: str | None = None) -> None:
        """Managed table (warehouse-dir) or external table at ``path``
        (reference S10: overwrite + option('path') + saveAsTable)."""
        if path is None and not self.exists(layer, table):
            # An in-memory session catalog forgets tables at process exit
            # but their warehouse directories survive; saveAsTable then
            # fails with LOCATION_ALREADY_EXISTS. Clear the orphaned
            # location — it belongs to no live table.
            import os
            import shutil
            from urllib.parse import urlparse

            wh = urlparse(self.spark.conf.get("spark.sql.warehouse.dir")).path
            shutil.rmtree(os.path.join(wh, f"{layer}.db", table), ignore_errors=True)
        writer = df.write.mode("overwrite").format("parquet")
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(self.qualified(layer, table))

    def drop(self, layer: str, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.qualified(layer, table)}")
