"""mahjong_etl_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of ``kackyt/mahjong-etl``
(reference snapshot at /root/reference, read-only), re-expressed
Spark-first:

- the reference's batch ETL (Tenhou XML -> 9 relational tables ->
  Hive-partitioned Parquet) becomes a ``binaryFile`` scan +
  ``mapInPandas`` parser + ``partitionBy("dt")`` Parquet sinks
  (see ``plans.etl``);
- the reference's delegated Athena SQL plane (README.md:2 of the
  reference) becomes Spark SQL / DataFrame queries over the same
  partitioned layout (see ``plans.queries``);
- an extension plane adds LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal columns) designed
  for 100 TB scale (see ``operators``).

Everything is declarative DataFrame code: Catalyst handles pushdown,
pruning, join selection, and AQE handles skew/coalescing at runtime.
"""

__version__ = "0.1.0"
