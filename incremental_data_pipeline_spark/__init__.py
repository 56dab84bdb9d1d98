"""incremental_data_pipeline_spark — a PySpark-native incremental analytics engine.

Re-implements the capabilities of the reference medallion-architecture
incremental ETL pipeline (watermark CDC ingestion, SCD Type 1 dimension
upserts, star-schema fact building — see /root/reference) as a generic,
reusable Spark library, and extends it with the operators a large-scale
LLM-training-data pipeline needs: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search over embeddings, multimodal
binary-column plumbing, and text analysis.

Design principles (100 TB scale):
- DataFrame/SQL-first: every operator is a declarative logical plan so
  Catalyst does pushdown, pruning, join selection, and AQE re-planning.
- Shuffle-aware: dimension joins broadcast; surrogate-key assignment has a
  scalable (no global sort) path; dedup/similarity use bucketed candidate
  generation so nothing goes quadratic.
- JVM-side hot path: built-in functions everywhere; Pandas UDFs only for
  genuinely non-relational work (multimodal decode).
"""

from incremental_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
