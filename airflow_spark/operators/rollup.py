"""Continuous aggregate / hypertable-style rollup.

The pattern TimescaleDB calls a continuous aggregate: a materialized
per-bucket aggregate table maintained incrementally, plus a hybrid
query path that answers long-range aggregations from the (tiny)
rollup and touches raw events only for the partial bucket at the
range edges.

100 TB shape: the rollup table is ``buckets × groups`` rows — orders
of magnitude smaller than raw. ``refresh_rollup`` aggregates ONLY
buckets newer than the last materialized one (one filtered scan of
the raw tail, pushed to the parquet reader as a timestamp predicate),
so maintenance cost tracks arrival rate, not corpus size.
``hybrid_range_count`` then reads raw data solely for the in-progress
bucket.

Only complete buckets are materialized: the current in-progress
bucket would otherwise need invalidation on every refresh.

Reference analog: behavior contract only — the reference polls and
re-aggregates from scratch each DagRun (e.g. the freshness checks in
dags/DNS_Requests.py:97-136); this is the engine-native incremental
form. Declared in the build brief as a custom operator Spark lacks
(SURVEY.md M5 family).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_aggregate(
    events: DataFrame,
    bucket: str = "hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Per-(bucket, groups) aggregate: count, sum, min, max — the
    mergeable statistics a rollup can serve without rescanning raw
    (avg = sum/count downstream; percentiles need sketches, not this)."""
    groups = group_cols or ["event_type"]
    return (
        events.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"), *groups
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def refresh_rollup(
    spark: SparkSession,
    events: DataFrame,
    path: str,
    bucket: str = "hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> dict:
    """Incrementally maintain the rollup at ``path``: aggregate only
    complete buckets newer than the last materialized one and append
    them. Returns {"new_buckets": n, "high_water": ts|None}."""
    # existence via the reader, NOT os.path: driver-local os.path.isdir
    # is always False for remote stores (s3://, hdfs://), which would
    # silently re-append every complete bucket on every refresh —
    # duplicate rollup rows and 2x/3x counts downstream
    from pyspark.errors import AnalysisException

    high_water = None
    try:
        high_water = spark.read.parquet(path).agg(F.max("bucket")).first()[0]
    except AnalysisException:
        # PATH_NOT_FOUND / empty table only: a transient read failure
        # (credentials, corrupt footer) must PROPAGATE — treating it as
        # "no rollup yet" would re-append every bucket
        high_water = None

    # the in-progress bucket (the one holding max ts) is excluded
    frontier = events.agg(
        F.date_trunc(bucket, F.max(ts_col)).alias("b")
    ).first()["b"]
    if frontier is None:
        return {"new_buckets": 0, "high_water": high_water}

    tail = events.where(F.date_trunc(bucket, F.col(ts_col)) < F.lit(frontier))
    if high_water is not None:
        # timestamp predicate on the raw scan: only the new tail is read
        tail = tail.where(F.col(ts_col) >= F.lit(high_water) + F.expr("INTERVAL 1 SECOND"))
        tail = tail.where(
            F.date_trunc(bucket, F.col(ts_col)) > F.lit(high_water)
        )
    # persist: the count action and the append would otherwise each
    # rescan and re-aggregate the raw tail (2x the refresh budget)
    agg = bucket_aggregate(tail, bucket, ts_col, group_cols, value_col).persist()
    try:
        n_new = agg.select("bucket").distinct().count()
        if n_new:
            agg.write.mode("append").parquet(path)
    finally:
        agg.unpersist()
    return {"new_buckets": n_new, "high_water": high_water}


def hybrid_range_count(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    start,
    end,
    bucket: str = "hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event counts per group over ``[start, end)``: complete buckets
    come from the rollup; only the range edges and any buckets past
    the rollup's high-water mark read raw events. Equals the direct
    aggregation of raw (asserted in tests)."""
    groups = group_cols or ["event_type"]
    rollup = spark.read.parquet(rollup_path)
    hw = rollup.agg(F.max("bucket")).first()[0]

    start_l, end_l = F.lit(start), F.lit(end)
    # full buckets inside [start, end) that the rollup has
    b = F.col("bucket")
    from_rollup = rollup.where(
        (b >= F.date_trunc(bucket, start_l))
        & (b + F.expr(f"INTERVAL 1 {bucket}") <= end_l)
        & (b >= start_l)  # drop a partial leading bucket
    )
    ts = F.col(ts_col)
    in_range = events.where((ts >= start_l) & (ts < end_l))
    bucket_expr = F.date_trunc(bucket, ts)
    covered = (
        (bucket_expr >= F.date_trunc(bucket, start_l))
        & (bucket_expr >= start_l)
        & (bucket_expr + F.expr(f"INTERVAL 1 {bucket}") <= end_l)
        & (bucket_expr <= F.lit(hw))
    )
    from_raw = in_range.where(~covered)
    return (
        from_rollup.groupBy(*groups)
        .agg(F.sum("n").alias("n"))
        .unionByName(
            from_raw.groupBy(*groups).agg(F.count(F.lit(1)).alias("n"))
        )
        .groupBy(*groups)
        .agg(F.sum("n").cast("long").alias("n"))
    )
