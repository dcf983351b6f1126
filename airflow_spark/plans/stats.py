"""Catalyst-statistics helpers: size estimates and broadcast advice.

Spark broadcasts a join side automatically only when its ESTIMATE is
under ``spark.sql.autoBroadcastJoinThreshold`` — and estimates go bad
after filters, aggregations, and UDF-ish projections, which is how a
10 MB dimension ends up in a 100 TB sort-merge join. These helpers
surface the optimizer's own estimate so pipeline code can decide
explicitly (and testably) instead of hoping:

- ``estimated_size_bytes``: the optimized logical plan's sizeInBytes.
- ``should_broadcast``: that estimate vs the session's threshold.
- ``broadcast_if_small``: apply the hint only when it is actually safe
  — the guard for "this dimension is usually small but might not be"
  feeds, where an unconditional hint OOMs the driver the day the feed
  is 100× bigger.

Estimates, not truth: parquet scans estimate from file sizes (good);
post-shuffle stages estimate structurally (cruder). For exact control
at a known-small table, ``F.broadcast`` directly is still right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def estimated_size_bytes(df: DataFrame) -> int:
    """The optimizer's size estimate for this frame's result (bytes) —
    driver-side plan statistics, nothing executed."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()  # noqa: SLF001
    return int(str(stats.sizeInBytes()))


def _session_threshold(df: DataFrame) -> int:
    raw = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    if raw.endswith(("k", "K")):
        return int(raw[:-1]) * 1024
    if raw.endswith(("m", "M")):
        return int(raw[:-1]) * 1024 * 1024
    if raw.endswith(("g", "G")):
        return int(raw[:-1]) * 1024 * 1024 * 1024
    if raw.endswith("b"):
        return int(raw[:-1])
    return int(raw)


def should_broadcast(df: DataFrame, threshold_bytes: int | None = None) -> bool:
    """Whether this frame's estimate fits the broadcast threshold
    (session ``autoBroadcastJoinThreshold`` unless given; -1 = never)."""
    if threshold_bytes is None:
        threshold_bytes = _session_threshold(df)
    if threshold_bytes < 0:
        return False
    return estimated_size_bytes(df) <= threshold_bytes


def broadcast_if_small(
    df: DataFrame, threshold_bytes: int | None = None
) -> DataFrame:
    """The frame with a broadcast hint applied ONLY when its estimate
    fits — unconditional hints on variable-size feeds are how drivers
    OOM; this makes the hint self-limiting."""
    return F.broadcast(df) if should_broadcast(df, threshold_bytes) else df
