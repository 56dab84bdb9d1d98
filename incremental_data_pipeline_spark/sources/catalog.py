"""Layer-aware table catalog (reference S7/S12/S13: cars_catalog.silver/gold
namespaces, tableExists gates, CREATE SCHEMA — database_notebook.py:8-23,
gold_dim_branch.py:51).

Spark's default session catalog is two-level (database.table); the
reference's 3-level ``catalog.schema.table`` maps to ``{layer}`` databases:
``silver.events``, ``gold.dim_user``. When the SessionAliasCatalog JVM
plugin (java/idps.jar, registered by session.get_spark) is on the
classpath, reference-style THREE-part names also resolve verbatim:
``cars_catalog.gold.dim_x`` aliases the same warehouse tables —
``three_part_enabled`` probes for it. Tables are parquet-backed managed or
path-based external tables; bucketed variants go through
sinks.write_bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def three_part_enabled(spark: SparkSession) -> bool:
    """True when the 3-level-namespace alias catalog can serve this
    session: the plugin class must be on the JVM classpath (driver
    extraClassPath is fixed at JVM launch, so a foreign session — e.g.
    the driver harness — may lack it; callers degrade to 2-part names).
    Registers the catalog conf on first success, which is safe because
    ``spark.sql.catalog.*`` is read lazily at first catalog lookup."""
    from incremental_data_pipeline_spark.session import (
        ALIAS_CATALOG_CLASS,
        ALIAS_CATALOG_NAME,
    )

    try:
        spark._jvm.java.lang.Class.forName(ALIAS_CATALOG_CLASS)  # noqa: SLF001
    except Exception:
        return False
    key = f"spark.sql.catalog.{ALIAS_CATALOG_NAME}"
    if spark.conf.get(key, None) is None:
        spark.conf.set(key, ALIAS_CATALOG_CLASS)
    return True


class LayerCatalog:
    """bronze/silver/gold databases in the session catalog."""

    LAYERS = ("bronze", "silver", "gold", "state")

    def __init__(self, spark: SparkSession):
        self.spark = spark
        for layer in self.LAYERS:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}")

    def qualified(self, layer: str, table: str) -> str:
        return f"{layer}.{table}"

    def three_part(self, layer: str, table: str) -> str | None:
        """Reference-style ``catalog.schema.table`` name
        (database_notebook.py:8-23), or None when the alias-catalog
        plugin is absent from this session's JVM."""
        if not three_part_enabled(self.spark):
            return None
        from incremental_data_pipeline_spark.session import ALIAS_CATALOG_NAME

        return f"{ALIAS_CATALOG_NAME}.{self.qualified(layer, table)}"

    def exists(self, layer: str, table: str) -> bool:
        """Reference: spark.catalog.tableExists('cars_catalog.gold.dim_branch')
        gating initial vs incremental builds (gold_dim_branch.py:51)."""
        return self.spark.catalog.tableExists(self.qualified(layer, table))

    def read(self, layer: str, table: str) -> DataFrame:
        return self.spark.table(self.qualified(layer, table))

    # Dot-prefixed so parquet readers ignore it; proves a warehouse dir was
    # created by THIS framework and is safe to clear when orphaned.
    _MARKER = ".layer_catalog_managed"

    def _managed_location(self, layer: str, table: str) -> str:
        import os
        from urllib.parse import urlparse

        wh = urlparse(self.spark.conf.get("spark.sql.warehouse.dir")).path
        return os.path.join(wh, f"{layer}.db", table)

    def write(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        path: str | None = None,
        reclaim: bool = False,
    ) -> None:
        """Managed table (warehouse-dir) or external table at ``path``
        (reference S10: overwrite + option('path') + saveAsTable).

        ``reclaim=True`` lets the caller assert ownership of an unmarked
        orphaned warehouse directory (e.g. scratch tables a pre-marker run
        of this framework left behind); default is to refuse to delete
        anything we cannot prove we created.
        """
        import os
        import shutil

        loc = self._managed_location(layer, table)
        if path is None and not self.exists(layer, table) and os.path.isdir(loc):
            # An in-memory session catalog forgets tables at process exit
            # but their warehouse directories survive; saveAsTable then
            # fails with LOCATION_ALREADY_EXISTS. Clear the orphaned
            # location ONLY if our marker proves a previous run of this
            # framework created it — tableExists is per-session state, so
            # an unmarked directory may belong to another live session or
            # to user data a shared warehouse dir points at.
            if reclaim or os.path.exists(os.path.join(loc, self._MARKER)):
                shutil.rmtree(loc, ignore_errors=True)
            else:
                raise FileExistsError(
                    f"warehouse location {loc!r} exists but was not created by "
                    f"LayerCatalog (no {self._MARKER} marker); refusing to delete "
                    "it. Drop the foreign table/directory or write to an "
                    "explicit external path instead."
                )
        writer = df.write.mode("overwrite").format("parquet")
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(self.qualified(layer, table))
        if path is None:
            with open(os.path.join(loc, self._MARKER), "w") as f:
                f.write("managed by incremental_data_pipeline_spark.LayerCatalog\n")

    def drop(self, layer: str, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.qualified(layer, table)}")
