"""Streaming freshness/threshold monitors over an event stream.

The reference approximates streaming by polling every 5-60 min and
checking event-time staleness (dags/DNS_Requests.py:97-136 per-client
freshness; dags/Cloudflare_Apps.py:54 5-min polls). These operators are
the Structured-Streaming-native forms, built so the SAME function works
on a batch DataFrame (tests, backfill) and a streaming one (readStream)
— the transformations are identical; only the source/sink differ.

Late data: watermarks bound state (`withWatermark`) — the
catchup=False "drop what's too old" posture. Stateful per-key
alert-once monitoring uses applyInPandasWithState with per-key
timeouts (last_seen_monitor).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_window_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-window per-key counts (W3). Works batch or streaming; the
    watermark only applies on a streaming source."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window_len).alias("win"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def windowed_distinct_counts(
    events: DataFrame,
    distinct_col: str = "user_id",
    window_len: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "1 hour",
    rsd: float = 0.02,
) -> DataFrame:
    """Per-window per-key APPROXIMATE distinct counts (unique users per
    hour per event type). Exact count(DISTINCT) is not supported on a
    stream (unbounded per-window value state); the HLL±± sketch behind
    ``approx_count_distinct`` is — fixed-size mergeable state per
    (window, key), map-side combined like any partial aggregate. Works
    batch or streaming from the same code; batch callers get the same
    estimate (tolerance-tested vs exact)."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window_len).alias("win"), F.col(key_col)
    ).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("n_distinct"),
        F.count(F.lit(1)).alias("cnt"),
    )


def sliding_window_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Sliding-window counts — the '5-min checks of hourly freshness'
    shape (dags/Cloudflare_Apps.py:54)."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window_len, slide).alias("win"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("cnt"))


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows per key (activity bursts separated by ≥ gap)."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("win"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("cnt"))


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    within: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time range bound — the
    Structured Streaming correlation shape (click ↔ conversion,
    request ↔ response). Both sides carry a watermark and the join
    predicate bounds right_ts to [left_ts, left_ts + within), so state
    on each side is droppable once the watermark passes — bounded
    memory at any stream length. Works identically on batch frames
    (watermarks skipped), so the SAME function backs tests/backfills.
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key_col] == right[key_col])
        & (rt >= lt)
        & (rt < lt + F.expr(within))
    )
    return left.join(right, cond, how).drop(right[key_col])


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: the dimension side is broadcast
    to every task per micro-batch (re-read each batch, so slowly-
    changing dims stay fresh without restarting the query). Works on
    batch frames identically."""
    return stream.join(F.broadcast(dim), key, how)


def freshness_monitor(
    events: DataFrame,
    keys: DataFrame,
    cutoff: dt.datetime,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Stale keys: expected keys whose latest event is missing or older
    than ``cutoff`` (A1 — the DNS_Requests per-client freshness check,
    dags/DNS_Requests.py:129-136, with run_ts injected as ``cutoff``).
    Returns (key, last_seen nullable)."""
    latest = events.groupBy(key_col).agg(F.max(ts_col).alias("last_seen"))
    return (
        keys.join(latest, key_col, "left")
        .where(
            F.col("last_seen").isNull() | (F.col("last_seen") < F.lit(cutoff))
        )
        .select(key_col, "last_seen")
    )


def threshold_monitor(
    readings: DataFrame,
    limits: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    limit_col: str = "limit",
) -> DataFrame:
    """Per-key threshold violations (P9 — Speedtest per-device limits,
    dags/Speedtest.py:91-96): readings joined to broadcast limits,
    violation where value < limit."""
    return (
        readings.join(F.broadcast(limits), key_col)
        .where(F.col(value_col) < F.col(limit_col))
        .select(key_col, value_col, limit_col)
    )


def drift_monitor(
    readings: DataFrame,
    baseline: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    nbins: int = 10,
    psi_threshold: float = 0.25,
) -> DataFrame:
    """Groups whose incoming value distribution has drifted from a
    baseline snapshot: PSI(baseline, readings) ≥ ``psi_threshold``
    (0.25 = the conventional retrain-worthy bar).

    ``baseline`` is a static (group_col, value_col) frame — e.g. a
    sample of the last accepted corpus snapshot. Both frames are
    tagged and unioned so :func:`~airflow_spark.operators.timeseries.
    distribution_psi` computes the two-period PSI in one shuffle.

    Batch form (PSI needs a full window over the comparison frame, so
    the streaming entry point is per-micro-batch:
    :func:`~airflow_spark.streaming.runner.drift_alert_stream`)."""
    from ..operators.timeseries import distribution_psi

    a = baseline.select(
        F.col(group_col), F.col(value_col), F.lit("a").alias("__period")
    )
    b = readings.select(
        F.col(group_col), F.col(value_col), F.lit("b").alias("__period")
    )
    out = distribution_psi(
        a.unionByName(b), group_col, "__period", value_col, lo, hi, nbins
    )
    return out.where(F.col("psi") >= psi_threshold)


def dedupe_events(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id semantics for at-least-once sources (the
    streaming side of catchup=False late-data handling, SURVEY §2.11):
    duplicates within the watermark horizon are dropped with bounded
    state (``dropDuplicatesWithinWatermark``); batch frames just
    ``dropDuplicates``."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


LAST_SEEN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("alerted", T.BooleanType()),
    ]
)

LAST_SEEN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("status", T.StringType()),  # alive | stale_alert
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _last_seen_fn(
    stale_after_s: int,
    ts_col: str = "ts",
    key_name: str = "user_id",
    drop_after_alert: bool = True,
):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, alerted = state.get
            out = None
            if not alerted:
                out = pd.DataFrame(
                    [{key_name: user_id, "status": "stale_alert",
                      "last_ts": last_ts}]
                )
            # drop the entry after alerting: a key that never returns
            # would otherwise hold state forever (unbounded growth
            # under key churn); a returning key is treated as new
            if drop_after_alert:
                state.remove()
            elif not alerted:
                state.update((last_ts, True))
            if out is not None:
                yield out
            return
        max_ts = None
        for pdf in pdfs:
            m = pd.to_datetime(pdf[ts_col]).max()
            if max_ts is None or m > max_ts:
                max_ts = m
        prev = state.get if state.exists else (None, False)
        if prev[0] is not None and (max_ts is None or prev[0] > max_ts):
            max_ts = prev[0]
        state.update((max_ts, False))  # fresh data clears the alert latch
        state.setTimeoutDuration(stale_after_s * 1000)
        yield pd.DataFrame(
            [{key_name: user_id, "status": "alive", "last_ts": max_ts}]
        )

    return fn


def last_seen_monitor(
    events: DataFrame,
    stale_after_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful per-key last-seen with alert-once semantics (the
    streaming form of the DNS freshness DAG): emits 'alive' on new
    data, one 'stale_alert' when a key goes quiet past the timeout,
    re-arms when the key returns. The alerted entry is REMOVED from
    the state store (a permanently-quiet key would otherwise leak
    state forever under key churn). Output schema follows the actual
    key column's name and type. Requires a streaming source with
    update output mode (processing-time timeouts)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, events.schema[key_col].dataType),
            T.StructField("status", T.StringType()),
            T.StructField("last_ts", T.TimestampType()),
        ]
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _last_seen_fn(stale_after_s, ts_col=ts_col, key_name=key_col),
        outputStructType=out_schema,
        stateStructType=LAST_SEEN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def last_seen_monitor_eventtime(
    events: DataFrame,
    stale_after_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """JVM-native staleness alerts: the event-time recomposition of
    :func:`last_seen_monitor` for rates its Python-state form cannot
    reach (~57k rows/s at the 100x stream-bench leg — every
    micro-batch crosses the Arrow boundary per key group; this
    pipeline is pure HashAggregate/session-window state, the ~1M
    rows/s tier).

    Mechanism: a key's events group into ``session_window``s separated
    by >= ``stale_after_s`` of event-time quiet. When the watermark
    passes a session's close (last event + gap), Spark finalizes the
    session and this query emits exactly ONE row for it — that row IS
    the stale alert for that quiet period (alert-once). A key that
    returns starts a new session (re-arm, built in); a key still
    active emits nothing; finalized state is evicted by the session
    store (the leak-free property the Python form implements by hand).

    Semantic differences from the processing-time form, by design:
    alerts are EVENT-time (deterministic and replayable — at 100 TB
    the property that matters), and an alert is delivered once the
    watermark clears the session close, i.e. after ``watermark``'s
    late-data allowance (default: the gap itself) of further event
    time, not after a wall-clock timer. The final in-flight session of
    a finite replay never finalizes (no later event advances the
    watermark) — the same append-mode caveat as
    :func:`session_window_counts`. Streaming output mode: append.
    """
    gap = f"{int(stale_after_s)} seconds"
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark or gap)
    return (
        df.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("__session"),
        )
        .agg(F.max(ts_col).alias("last_ts"))
        .select(
            F.col(key_col),
            F.lit("stale_alert").alias("status"),
            F.col("last_ts"),
        )
    )


EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("acc", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _ewma_fn(
    alpha: float,
    ts_col: str = "ts",
    value_col: str = "value",
    key_name: str = "user_id",
):
    """Per-key streaming EWMA fold: state is ONE (acc, n) pair per key
    — O(1) regardless of stream length, the property that makes the
    recursion streaming-legal where the batch form needs a bounded
    window frame. Batch rows are folded in (ts) order so replays of
    the same batches reproduce the same value."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        acc, n = state.get if state.exists else (None, 0)
        n0 = n
        # ONE sort over the whole micro-batch: a key's rows can span
        # several Arrow chunks in arbitrary order — sorting per chunk
        # would fold later-timestamped values before earlier ones
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks, ignore_index=True)
            for v in allrows.sort_values(ts_col)[value_col]:
                x = float(v)
                acc = x if acc is None else acc * (1.0 - alpha) + alpha * x
                n += 1
        if n > n0:  # emit only when this invocation consumed rows
            state.update((acc, n))
            yield pd.DataFrame([{key_name: user_id, "ewma": acc, "n": n}])

    return fn


def ewma_monitor(
    events: DataFrame,
    alpha: float = 0.25,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Stateful streaming EWMA per key (update mode): emits the running
    smoothed value after each micro-batch that touched the key. The
    batch-mode twin is ``operators/timeseries.py:ewma`` (bounded-frame
    restart); this is the unbounded-memory-free streaming recursion."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, events.schema[key_col].dataType),
            T.StructField("ewma", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _ewma_fn(alpha, ts_col, value_col, key_name=key_col),
        outputStructType=out_schema,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOKEN_BUCKET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _token_bucket_fn(
    capacity: float,
    refill_per_s: float,
    ts_col: str = "ts",
    key_name: str = "user_id",
):
    """Per-key token-bucket fold: state is ONE (tokens, last_us) pair.
    Buckets refill in EVENT time (not wall clock), so replays of the
    same batches reproduce the same allow/throttle verdicts exactly —
    the streaming-legal form of rate limiting. Rows fold in ts order
    across the whole micro-batch (same one-sort contract as the EWMA
    monitor)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            tokens, last_us = state.get
        else:
            tokens, last_us = float(capacity), None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        allrows = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
        out_ts, out_ok, out_left = [], [], []
        for ts in allrows[ts_col]:
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and us > last_us:
                tokens = min(
                    float(capacity),
                    tokens + (us - last_us) / 1e6 * refill_per_s,
                )
            last_us = us if last_us is None else max(last_us, us)
            if tokens >= 1.0:
                tokens -= 1.0
                ok = True
            else:
                ok = False
            out_ts.append(ts)
            out_ok.append(ok)
            out_left.append(tokens)
        state.update((tokens, last_us))
        yield pd.DataFrame(
            {
                key_name: [k] * len(out_ts),
                ts_col: out_ts,
                "allowed": out_ok,
                "tokens_left": out_left,
            }
        )

    return fn


def rate_limit_monitor(
    events: DataFrame,
    capacity: float = 10.0,
    refill_per_s: float = 1.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming per-key rate limiter (update mode): every event gets
    an allow/throttle verdict from an event-time token bucket
    (capacity ``capacity``, ``refill_per_s`` tokens/second). O(1)
    state per key; verdicts are replay-deterministic because refill
    uses event time. The ingest-protection / abuse-flagging primitive
    the reference's cron-polling monitors can't express."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, events.schema[key_col].dataType),
            T.StructField(ts_col, events.schema[ts_col].dataType),
            T.StructField("allowed", T.BooleanType()),
            T.StructField("tokens_left", T.DoubleType()),
        ]
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _token_bucket_fn(capacity, refill_per_s, ts_col, key_name=key_col),
        outputStructType=out_schema,
        stateStructType=TOKEN_BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
