"""Bucketed-table layout: co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both sides bucketed (and sorted) by the join key lets Spark plan a
SortMergeJoin with **no Exchange on either side** — the join becomes
partition-local. Same for groupBy on the bucket key: no shuffle before
the final aggregate.

Bucketed tables must live in the session catalog (``saveAsTable``);
``ensure_warehouse`` points the catalog at a writable location.
Plan-shape proof lives in tests/test_bucketing.py (audit asserts zero
Exchanges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) catalog table keyed for
    co-located joins/aggs on ``key``."""
    keys = [key] if isinstance(key, str) else key
    w = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — shuffle-free
    when both were written with the same key and bucket count."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
