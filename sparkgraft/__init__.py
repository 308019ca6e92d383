"""sparkgraft — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (`bewannabe96/spark-hive-demo`, an ETL + OLAP clickstream pipeline:
CSV ingest -> 5-min-gap sessionization -> partitioned Hive parquet table ->
weekly-active-user SQL queries), re-expressed Spark-first:

- ``sparkgraft.session``   SparkSession factory (AQE, UTC, dynamic overwrite)
- ``sparkgraft.io``        schema-explicit readers (csv / parquet, ns-ts safe)
- ``sparkgraft.catalog``   partitioned-table spec + idempotent overwrite loader
- ``sparkgraft.ops``       relational / window / temporal / sessionize ops
- ``sparkgraft.queries``   WAU + TPC-H-style analytic queries
- ``sparkgraft.ext``       dedup, similarity search, text analysis, multimodal
- ``sparkgraft.streaming`` Structured Streaming sessionization

Everything is declarative DataFrame/SQL so Catalyst plans the physical
execution (predicate pushdown, column pruning, partition pruning, AQE,
broadcast joins, whole-stage codegen).
"""

from sparkgraft.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
