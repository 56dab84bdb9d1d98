package idps.catalog;

import java.util.Map;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.analysis.NamespaceAlreadyExistsException;
import org.apache.spark.sql.catalyst.catalog.CatalogTable;
import org.apache.spark.sql.connector.catalog.V1Table;
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat;
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.connector.catalog.CatalogPlugin;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Three-level-namespace parity shim: registers a NAMED catalog (e.g.
 * {@code cars_catalog}) that forwards every table and namespace call to
 * the active session's V2 session catalog, so reference-style
 * {@code catalog.schema.table} identifiers
 * (reference databricks_notebooks/database_notebook.py:8-23,
 * {@code cars_catalog.gold.dim_*}) resolve verbatim against the engine's
 * warehouse. The delegate is looked up per call from
 * {@code SparkSession.active()} rather than captured at initialize time,
 * because catalog plugins are constructed before the session is fully
 * built.
 *
 * Registration (see incremental_data_pipeline_spark/session.py):
 *   spark.sql.catalog.cars_catalog=idps.catalog.SessionAliasCatalog
 * with java/idps.jar on the driver classpath.
 */
public class SessionAliasCatalog implements TableCatalog, SupportsNamespaces {
  private String name = "session_alias";

  @Override
  public void initialize(String name, CaseInsensitiveStringMap options) {
    this.name = name;
  }

  @Override
  public String name() {
    return name;
  }

  @Override
  public String[] defaultNamespace() {
    return new String[] {"default"};
  }

  private CatalogPlugin session() {
    return SparkSession.active().sessionState().catalogManager().v2SessionCatalog();
  }

  private TableCatalog tables() {
    return (TableCatalog) session();
  }

  private SupportsNamespaces namespaces() {
    return (SupportsNamespaces) session();
  }

  /**
   * V1 metastore tables carry no V2 read/write capabilities when served
   * by a NON-session catalog (Spark's V1 fallback is keyed on the
   * spark_catalog name), so a parquet-provider V1Table is re-presented
   * as Spark's own V2 ParquetTable over the same storage location and
   * metastore schema — BATCH_READ / BATCH_WRITE / TRUNCATE all work, and
   * two-part access through the session catalog sees the same files.
   * Non-parquet providers pass through unwrapped (metadata ops still
   * delegate; this engine's saveAsTable surface is parquet-only).
   */
  private Table wrap(Table t) {
    if (!(t instanceof V1Table)) {
      return t;
    }
    CatalogTable v1 = ((V1Table) t).v1Table();
    if (v1.provider().isEmpty()
        || !"parquet".equalsIgnoreCase(v1.provider().get())
        || v1.storage().locationUri().isEmpty()) {
      return t;
    }
    String path = v1.storage().locationUri().get().toString();
    java.util.List<String> pathList = java.util.Collections.singletonList(path);
    ParquetTable pt =
        ParquetTable.apply(
            t.name(),
            SparkSession.active(),
            new CaseInsensitiveStringMap(java.util.Collections.singletonMap("path", path)),
            scala.jdk.javaapi.CollectionConverters.asScala(pathList).toSeq(),
            scala.Option.apply(v1.schema()),
            ParquetFileFormat.class);
    return new WritableParquetTable(pt, path, v1.identifier().quotedString());
  }

  @Override
  public Identifier[] listTables(String[] namespace) throws NoSuchNamespaceException {
    return tables().listTables(namespace);
  }

  @Override
  public Table loadTable(Identifier ident) throws NoSuchTableException {
    return wrap(tables().loadTable(ident));
  }

  @Override
  public boolean tableExists(Identifier ident) {
    return tables().tableExists(ident);
  }

  @Override
  @SuppressWarnings("deprecation")
  public Table createTable(
      Identifier ident, StructType schema, Transform[] partitions, Map<String, String> properties)
      throws TableAlreadyExistsException, NoSuchNamespaceException {
    return wrap(tables().createTable(ident, schema, partitions, properties));
  }

  @Override
  public Table alterTable(Identifier ident, TableChange... changes) throws NoSuchTableException {
    return tables().alterTable(ident, changes);
  }

  @Override
  public boolean dropTable(Identifier ident) {
    return tables().dropTable(ident);
  }

  @Override
  public void invalidateTable(Identifier ident) {
    tables().invalidateTable(ident);
  }

  @Override
  public void renameTable(Identifier oldIdent, Identifier newIdent)
      throws NoSuchTableException, TableAlreadyExistsException {
    tables().renameTable(oldIdent, newIdent);
  }

  @Override
  public String[][] listNamespaces() throws NoSuchNamespaceException {
    return namespaces().listNamespaces();
  }

  @Override
  public String[][] listNamespaces(String[] namespace) throws NoSuchNamespaceException {
    return namespaces().listNamespaces(namespace);
  }

  @Override
  public boolean namespaceExists(String[] namespace) {
    return namespaces().namespaceExists(namespace);
  }

  @Override
  public Map<String, String> loadNamespaceMetadata(String[] namespace)
      throws NoSuchNamespaceException {
    return namespaces().loadNamespaceMetadata(namespace);
  }

  @Override
  public void createNamespace(String[] namespace, Map<String, String> metadata)
      throws NamespaceAlreadyExistsException {
    namespaces().createNamespace(namespace, metadata);
  }

  @Override
  public void alterNamespace(String[] namespace, NamespaceChange... changes)
      throws NoSuchNamespaceException {
    namespaces().alterNamespace(namespace, changes);
  }

  @Override
  public boolean dropNamespace(String[] namespace, boolean cascade)
      throws NoSuchNamespaceException, NonEmptyNamespaceException {
    return namespaces().dropNamespace(namespace, cascade);
  }
}
