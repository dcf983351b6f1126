"""Streaming alert runner: monitors → foreachBatch → notifier sink.

The streaming form of O9 (failure notification): a monitor query's
violation rows become notifier calls per micro-batch, with the batch id
for idempotent delivery (foreachBatch may retry a batch; notifiers can
dedupe on (batch_id, key)).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


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
        rows = batch_df.limit(max_alerts_per_batch).collect()
        for r in rows:
            ctx = r.asDict(recursive=True)
            ctx["batch_id"] = batch_id
            notifier(ctx)

    writer = violations.writeStream.queryName(query_name).foreachBatch(_emit)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.outputMode("update").start()
