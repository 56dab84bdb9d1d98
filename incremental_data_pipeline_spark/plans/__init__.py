from incremental_data_pipeline_spark.plans.queries import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
