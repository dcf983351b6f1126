"""Streaming alert runner: monitors → foreachBatch → notifier sink.

The streaming form of O9 (failure notification): a monitor query's
violation rows become notifier calls per micro-batch, with the batch id
for idempotent delivery (foreachBatch may retry a batch; notifiers can
dedupe on (batch_id, key)).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def _start_writer(
    source: DataFrame,
    emit,
    query_name: str,
    checkpoint_dir: str | None,
    trigger_available_now: bool,
    processing_time: str | None,
):
    """Shared foreachBatch writer configuration for the alert paths."""
    writer = source.writeStream.queryName(query_name).foreachBatch(emit)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.outputMode("update").start()


def alert_stream(
    violations: DataFrame,
    notifier: Callable[[dict], None],
    query_name: str = "alerts",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
    max_alerts_per_batch: int = 1000,
):
    """Start a streaming query that notifies once per violation row.

    ``violations`` must be a streaming DataFrame (e.g. the output of a
    windowed freshness monitor on a readStream source). Returns the
    StreamingQuery handle.
    """

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic truncation: an unordered limit would drop an
        # ARBITRARY subset (different on replay, silently losing
        # alerts); sort by every column and over-fetch by one so the
        # cut is reported
        ordered = batch_df.orderBy(*batch_df.columns)
        rows = ordered.limit(max_alerts_per_batch + 1).collect()
        truncated = len(rows) > max_alerts_per_batch
        for r in rows[:max_alerts_per_batch]:
            ctx = r.asDict(recursive=True)
            ctx["batch_id"] = batch_id
            notifier(ctx)
        if truncated:
            notifier(
                {
                    "batch_id": batch_id,
                    "alert": "TRUNCATED",
                    "detail": f"batch exceeded max_alerts_per_batch="
                    f"{max_alerts_per_batch}; remaining alerts dropped",
                }
            )

    return _start_writer(
        violations, _emit, query_name, checkpoint_dir,
        trigger_available_now, processing_time,
    )


def drift_alert_stream(
    stream_df: DataFrame,
    baseline: DataFrame,
    notifier: Callable[[dict], None],
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    nbins: int = 10,
    psi_threshold: float = 0.25,
    query_name: str = "drift_alerts",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
):
    """Per-micro-batch distribution-drift alerting: each batch's value
    distribution is PSI-compared against the static ``baseline``
    snapshot, and drifted groups are notified.

    PSI needs a complete pass over the comparison window, so it runs
    inside foreachBatch (the batch frame is a plain DataFrame there) —
    the micro-batch IS the drift window. The flagged output is at most
    |groups| rows per batch, so the collect is bounded by cardinality,
    not data volume. Returns the StreamingQuery handle.
    """
    from .monitors import drift_monitor

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        flagged = drift_monitor(
            batch_df,
            baseline,
            group_col=group_col,
            value_col=value_col,
            lo=lo,
            hi=hi,
            nbins=nbins,
            psi_threshold=psi_threshold,
        ).collect()
        for r in flagged:
            ctx = r.asDict()
            ctx["batch_id"] = batch_id
            notifier(ctx)

    return _start_writer(
        stream_df, _emit, query_name, checkpoint_dir,
        trigger_available_now, processing_time,
    )
