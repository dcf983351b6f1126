"""Incremental view maintenance for JOIN views.

``rollup.py`` maintains aggregate views incrementally; this module does
the same for an inner equi-join view over two APPEND-ONLY tables: after
new rows land on either side, the view's delta is exactly

    ΔJ = ΔL ⋈ (R ∪ ΔR)  ∪  L_old ⋈ ΔR

(the classic delta-join decomposition: new-left against all of right,
old-left against new-right — together they cover ΔL⋈R, L⋈ΔR and
ΔL⋈ΔR exactly once). Appending ΔJ to the view equals recomputing the
full join from scratch, asserted batch-by-batch in tests.

High-water marks: both inputs must carry a monotonically increasing
id/timestamp column (event ids, ingestion time). The marks live in a
tiny ``_meta`` parquet next to the view — they canNOT be derived from
the view itself (an unmatched left row leaves no trace in an inner
join's output, so max(l_id)-in-view under-reports what was processed
and rows would be re-joined on the next refresh).

100 TB shape: the deltas are batch-sized; ``ΔL ⋈ R`` broadcasts ΔL's
key set to semi-reduce the big scan (``relational.reduced_join``
pattern) before the join, so each refresh costs ~one pruned scan per
side, never a full re-join. Requires append-only inputs — updates or
deletes need the SCD2/CDC machinery (``versioning.py``), not this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_meta(spark: SparkSession, meta_path: str):
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(meta_path).first()
        return (row["hw_l"], row["hw_r"]) if row else (None, None)
    except AnalysisException:
        return (None, None)


def _write_meta(spark: SparkSession, meta_path: str, hw_l, hw_r) -> None:
    spark.createDataFrame(
        [(hw_l, hw_r)], "hw_l long, hw_r long"
    ).coalesce(1).write.mode("overwrite").parquet(meta_path)


def refresh_join_view(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    view_path: str,
    on: str,
    l_id: str,
    r_id: str,
) -> dict:
    """Bring the inner-join view at ``view_path`` up to date with the
    current contents of ``left`` and ``right`` (append-only, each with
    a monotonic ``l_id`` / ``r_id`` column). First call materializes
    the full join. Returns {"appended": n, "hw_l": .., "hw_r": ..}.

    Output columns: the join key, then left columns, then right columns
    (key deduplicated)."""
    meta_path = view_path.rstrip("/") + "_meta"
    hw_l, hw_r = _read_meta(spark, meta_path)

    new_hw_l = left.agg(F.max(l_id)).first()[0]
    new_hw_r = right.agg(F.max(r_id)).first()[0]

    if hw_l is None:
        delta = left.join(right, on)
    else:
        delta_l = left.where(F.col(l_id) > hw_l)
        old_l = left.where(F.col(l_id) <= hw_l)
        delta_r = right.where(F.col(r_id) > hw_r)
        # ΔL ⋈ (R ∪ ΔR): new-left rows against everything on the right
        part1 = delta_l.join(right, on)
        # L_old ⋈ ΔR: the big old-left scan is semi-reduced by the
        # (tiny) delta key set BEFORE the join — the refresh never pays
        # a full re-join
        keys = F.broadcast(delta_r.select(on).distinct())
        part2 = old_l.join(keys, on, "left_semi").join(delta_r, on)
        delta = part1.unionByName(part2)

    n = delta.count()
    if n:
        delta.write.mode("append").parquet(view_path)
    elif hw_l is None:
        # materialize an empty view so readers see a table, not an error
        delta.write.mode("overwrite").parquet(view_path)
    _write_meta(spark, meta_path, new_hw_l, new_hw_r)
    return {"appended": n, "hw_l": new_hw_l, "hw_r": new_hw_r}


def refresh_agg_view(
    spark: SparkSession,
    source: DataFrame,
    view_path: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
) -> dict:
    """Incremental GROUPED-AGGREGATE view over an append-only source:
    the view stores mergeable partials (cnt, sum, min, max) per key;
    a refresh aggregates ONLY rows past the high-water mark and merges
    them into the stored partials by union + re-aggregate — classic
    partial-aggregate IVM (avg and friends derive from the partials at
    read time; ``rollup.py`` is the time-bucketed sibling).

    Cost per refresh: one scan of the delta + a key-count-sized merge,
    never a re-scan of history. The high-water mark lives in a _meta
    parquet (derivable here, but stored anyway so a refresh needs no
    view read before pruning the source scan)."""
    import os

    meta_path = os.path.join(view_path, "_meta")
    data_path = os.path.join(view_path, "data")
    hw, _ = _read_meta(spark, meta_path)

    delta = source if hw is None else source.where(F.col(id_col) > hw)
    new_hw_row = source.agg(F.max(id_col).alias("m")).first()
    new_hw = new_hw_row["m"]
    delta_partials = delta.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("double")).alias("sum_v"),
        F.min(F.col(value_col).cast("double")).alias("min_v"),
        F.max(F.col(value_col).cast("double")).alias("max_v"),
    )
    # ONLY a missing view means "first refresh" — any other failure
    # (transient IO, schema mismatch, a failing action) must propagate:
    # falling back to delta-only partials here would silently OVERWRITE
    # the view's accumulated history with one batch's data
    from pyspark.errors import AnalysisException

    try:
        old = spark.read.parquet(data_path)
    except AnalysisException:
        old = None
    if old is not None:
        merged = (
            old.unionByName(delta_partials)
            .groupBy(*key_cols)
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        n_delta = delta_partials.count()
    else:
        merged = delta_partials
        n_delta = None
    # localCheckpoint cuts lineage BEFORE the overwrite touches the
    # directory the plan still reads from (the store-swap contract
    # used across the repo's table stores)
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(data_path)
    if new_hw is not None:
        _write_meta(spark, meta_path, int(new_hw), 0)
    return {"high_water": new_hw, "delta_groups": n_delta}


def read_agg_view(spark: SparkSession, view_path: str) -> DataFrame:
    """Read the aggregate view with derived columns (avg from the
    stored partials)."""
    import os

    df = spark.read.parquet(os.path.join(view_path, "data"))
    return df.withColumn("avg_v", F.col("sum_v") / F.col("cnt"))
