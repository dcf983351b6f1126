"""airflow_spark — a PySpark-native pipeline/analytics engine.

Re-expresses the capabilities of the reference workflow-orchestrator
(jnstockley/airflow: DAG orchestration + JSON-payload dataflow checks)
as a Spark-first engine:

- ``session`` / ``catalog``: SparkSession factory + parquet catalog with
  the Spark-4.1 nanosecond-timestamp normalization.
- ``queries``: the declared relational query registry (SURVEY.md §2.12)
  implemented with the DataFrame API, each paired with an ANSI-SQL
  oracle text for DuckDB hash-verification.
- ``pipeline``: DAG-of-tasks orchestration (schedule, retries, timeouts,
  dynamic fan-out, expectations, failure notification) — the analog of
  the reference's Airflow surface (SURVEY.md §2.9).
- ``operators``: LLM-data-pipeline operators (dedup family, similarity
  search, text analysis, multimodal column plumbing) designed for
  100 TB scale (partition-local work, LSH instead of cross joins).
- ``streaming``: Structured-Streaming freshness/staleness monitors
  (watermarks, windows, stateful per-key alerting) — the streaming form
  of the reference's cron-polling checks.
"""

__version__ = "0.1.0"
