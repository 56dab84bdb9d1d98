package idps.catalog;

import java.io.IOException;
import java.io.UncheckedIOException;
import java.util.EnumSet;
import java.util.Map;
import java.util.Set;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.connector.catalog.Column;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Decorates Spark's V2 ParquetTable with a TRUNCATE capability so that
 * overwrite writes (ReplaceTableAsSelect / OverwriteByExpression with an
 * always-true delete filter) work through a NON-session catalog.
 * FileTable only advertises BATCH_READ + BATCH_WRITE and its write
 * builder has no SupportsTruncate, because the built-in file path relies
 * on the V1 fallback that Spark reserves for the session catalog. The
 * decorator's builder clears the table location right before the batch
 * write starts, which is the same delete-then-write contract the V1
 * InsertIntoHadoopFsRelation overwrite uses.
 */
public class WritableParquetTable implements Table, SupportsRead, SupportsWrite {
  private static final Set<TableCapability> CAPS =
      EnumSet.of(
          TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE);

  private final ParquetTable inner;
  private final String location;
  // session-catalog name (e.g. `gold`.`dim_x`) whose cached V1 relation
  // and file listing must be refreshed after a V2 write commits, so
  // two-part reads through the session catalog see the new files
  private final String refreshName;

  public WritableParquetTable(ParquetTable inner, String location, String refreshName) {
    this.inner = inner;
    this.location = location;
    this.refreshName = refreshName;
  }

  @Override
  public String name() {
    return inner.name();
  }

  @Override
  @SuppressWarnings("deprecation")
  public StructType schema() {
    return inner.schema();
  }

  @Override
  public Column[] columns() {
    return inner.columns();
  }

  @Override
  public Transform[] partitioning() {
    return inner.partitioning();
  }

  @Override
  public Map<String, String> properties() {
    return inner.properties();
  }

  @Override
  public Set<TableCapability> capabilities() {
    return CAPS;
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    return inner.newScanBuilder(options);
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new TruncatingWriteBuilder(inner.newWriteBuilder(info), location, refreshName);
  }

  private static final class TruncatingWriteBuilder implements WriteBuilder, SupportsTruncate {
    private final WriteBuilder inner;
    private final String location;
    private final String refreshName;
    private boolean truncate = false;

    TruncatingWriteBuilder(WriteBuilder inner, String location, String refreshName) {
      this.inner = inner;
      this.location = location;
      this.refreshName = refreshName;
    }

    @Override
    public WriteBuilder truncate() {
      this.truncate = true;
      return this;
    }

    @Override
    public Write build() {
      return new RefreshingWrite(inner.build(), refreshName, location, truncate);
    }
  }

  /** Forwards the write; performs a requested truncate at EXECUTION
   * start (first createBatchWriterFactory call), not at plan time — a
   * write that fails planning or is aborted before execution must leave
   * the table intact, matching V1 overwrite's delete-then-write timing.
   * On successful commit, drops the session catalog's cached V1
   * relation + file listing for this table. */
  private static final class RefreshingWrite implements Write {
    private final Write inner;
    private final String refreshName;
    private final String location;
    private final boolean truncate;

    RefreshingWrite(Write inner, String refreshName, String location, boolean truncate) {
      this.inner = inner;
      this.refreshName = refreshName;
      this.location = location;
      this.truncate = truncate;
    }

    private void truncateLocation() {
      try {
        Path p = new Path(location);
        Configuration conf = SparkSession.active().sessionState().newHadoopConf();
        FileSystem fs = p.getFileSystem(conf);
        if (fs.exists(p)) {
          for (FileStatus st : fs.listStatus(p)) {
            fs.delete(st.getPath(), true);
          }
        }
      } catch (IOException e) {
        throw new UncheckedIOException("truncate of " + location + " failed", e);
      }
    }

    @Override
    public String description() {
      return inner.description();
    }

    @Override
    public BatchWrite toBatch() {
      BatchWrite b = inner.toBatch();
      String name = refreshName;
      boolean wantTruncate = truncate;
      return new BatchWrite() {
        private boolean truncated = false;

        @Override
        public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
          synchronized (this) {
            if (wantTruncate && !truncated) {
              truncateLocation();
              truncated = true;
            }
          }
          return b.createBatchWriterFactory(info);
        }

        @Override
        public boolean useCommitCoordinator() {
          return b.useCommitCoordinator();
        }

        @Override
        public void onDataWriterCommit(WriterCommitMessage message) {
          b.onDataWriterCommit(message);
        }

        @Override
        public void commit(WriterCommitMessage[] messages) {
          b.commit(messages);
          try {
            SparkSession.active().catalog().refreshTable(name);
          } catch (Exception e) {
            // cache refresh is best-effort: a failed refresh only means
            // the NEXT two-part read re-lists on its own
          }
        }

        @Override
        public void abort(WriterCommitMessage[] messages) {
          b.abort(messages);
        }
      };
    }
  }
}
