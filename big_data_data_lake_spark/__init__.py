"""big_data_data_lake_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference data-lake pipeline (Deep-KALYAN/big-data-data-lake): medallion
ingest (bronze/silver/gold), the full relational operator surface of its
five services (see SURVEY.md §2), plus the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) the north
star mandates.

Design principles:
- DataFrame/SQL first: every operator is a declarative plan for Catalyst;
  no hand-scheduled execution, no RDDs.
- JVM-side expressions: ``pyspark.sql.functions`` everywhere; Pandas UDFs
  only where built-ins genuinely cannot express the semantics
  (multimodal decode).
- Scale posture: broadcast dimension joins, partial aggregation,
  AQE-friendly shuffles, predicate pushdown — written for a
  1000-executor cluster, tested on local mode.
"""

__version__ = "0.1.0"
