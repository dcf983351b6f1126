"""Event-stream (batch) time-series operators: sessionization,
rolling features, anomaly scores.

All window-function compositions — one shuffle on the partition key,
then O(1) per row; at 100 TB the per-user/per-type partitions are
independent, so the shape parallelizes to any executor count. No UDFs.

Reference analog: the reference polls metric feeds (speedtest, DNS
timings) on a schedule and asserts on the latest values
(/root/reference/dags/Speedtest.py:47-67); these operators are the
engine-side generalization a large corpus of such telemetry needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import safe_corr, snap_zero


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session index per user: a new session starts when the
    gap since the previous event exceeds ``gap_minutes`` (the classic
    gaps-and-islands form: lag → boundary flag → running sum).

    Scale shape: one shuffle on ``user_col``; both window functions
    share the same (partition, order) so Spark evaluates them in a
    single Window physical node — no second sort."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("session_idx", F.sum(is_new).over(w))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: event count, span seconds, first/last ts.
    Composes ``sessionize`` with a grouped agg (partial-agg friendly)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("span_s"),
    )


def rolling_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 10,
    quantize_pow2: int | None = None,
) -> DataFrame:
    """Trailing-N rolling mean/min/max per key (ROWS frame — rank-based,
    no time-range scan).

    ``quantize_pow2=q`` replaces the decimal-rounded double outputs with
    tie-safe exact integers: each value is quantized once to the BIGINT
    ``floor(x · 2^q)`` (power-of-two scaling and floor are exact IEEE
    ops on the same input bits in every engine), and the rolling mean
    is restated as the integer pair ``(roll_sum_fp, n_w)`` — a BIGINT
    sum is associative and exact, so it is immune both to the engines'
    windowed-avg accumulation order (segment tree vs sequential) and to
    their differing ``round(double, d)`` half-tie conventions (the r8 /
    r10 driver hash-flake class; see ``double_exponential_forecast``)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    if quantize_pow2 is not None:
        v_fp = F.floor(F.col(value_col) * F.lit(float(2**quantize_pow2)))
        return df.select(
            key_col,
            ts_col,
            v_fp.alias("value_fp"),
            F.sum(v_fp).over(w).alias("roll_sum_fp"),
            F.count(F.lit(1)).over(w).alias("n_w"),
            F.min(v_fp).over(w).alias("roll_min_fp"),
            F.max(v_fp).over(w).alias("roll_max_fp"),
        )
    return df.select(
        key_col,
        ts_col,
        value_col,
        F.round(F.avg(value_col).over(w), 4).alias("roll_mean"),
        F.min(value_col).over(w).alias("roll_min"),
        F.max(value_col).over(w).alias("roll_max"),
    )


def distribution_psi(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two periods ('a' vs 'b') of a
    value distribution, per group — the standard drift check a corpus
    refresh runs before a new training snapshot is accepted (PSI < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 retrain-worthy).

    Values are bucketed into ``nbins`` fixed-width bins over [lo, hi)
    (edges are plan literals, so the result is deterministic and
    portable — no data-derived quantile edges). Per bin,
    ``p = (count + smooth) / (total + smooth * nbins)`` (additive
    smoothing keeps empty bins finite), and
    ``PSI = Σ (p_a - p_b) * ln(p_a / p_b)``.

    Scale shape: ONE shuffle — a single groupBy(group, bin) with
    conditional sums for the two periods (map-side combine applies);
    everything after operates on |groups| × nbins rows. Missing bins
    are restored by exploding a literal bin sequence per group so
    smoothing covers all nbins, not just observed ones.

    Output: (group_col, n_a, n_b, psi) ordered by group."""
    width = (hi - lo) / nbins
    bin_ = F.least(
        F.greatest(F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("int")
    counts = (
        df.select(F.col(group_col), F.col(period_col).alias("__p"), bin_.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(
            F.sum(F.when(F.col("__p") == "a", 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("__p") == "b", 1).otherwise(0)).alias("cb"),
        )
    )
    all_bins = (
        counts.select(group_col)
        .distinct()
        .select(
            group_col,
            F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin"),
        )
    )
    full = (
        all_bins.join(counts, [group_col, "bin"], "left")
        .select(
            group_col,
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = Window.partitionBy(group_col)
    pa = (F.col("ca") + F.lit(smooth)) / (
        F.sum("ca").over(tot) + F.lit(smooth * nbins)
    )
    pb = (F.col("cb") + F.lit(smooth)) / (
        F.sum("cb").over(tot) + F.lit(smooth * nbins)
    )
    return (
        full.withColumn("__term", (pa - pb) * F.log(pa / pb))
        .groupBy(group_col)
        .agg(
            F.sum("ca").alias("n_a"),
            F.sum("cb").alias("n_b"),
            F.round(F.sum("__term"), 4).alias("psi"),
        )
        .orderBy(group_col)
    )


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates ≥ z_threshold population stddevs from
    their group mean. Two-pass shape (grouped agg then broadcast-join
    the tiny stats back) — the aggregation has map-side combine, the
    join side is |groups| rows."""
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sigma"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        df.join(F.broadcast(stats), key_col)
        .where(F.col("__sigma") > 0)
        .withColumn("z", F.round(z, 4))
        .where(F.abs(F.col("z")) >= z_threshold)
        .drop("__mu", "__sigma")
    )


def gap_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    step: str = "INTERVAL 1 HOUR",
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Resample an event stream onto a dense per-key time grid with
    forward fill: bucket-average the observed values, explode each
    key's [min, max] bucket range into a spine (``sequence`` — bounded
    by the key's own time span, no global spine), left-join observed
    buckets, and carry the last observation forward
    (``last(..., ignorenulls)`` over an unbounded-preceding ROWS
    frame). Output: (key, bucket, value, was_filled).

    ``agg_cols`` overrides the per-bucket aggregates: a mapping of
    output name → aggregate Column, every one forward-filled together
    (used e.g. to carry the exact (sum·100, count) integer pair
    instead of the rounded bucket mean — the mean of cents data is a
    half-cent, exactly on a %.2f rounding tie; tie_audit class fix).

    Scale: one grouped agg + one per-key window — both shuffle on the
    key; the spine explode adds rows proportional to each key's time
    span, never |keys| × global range.
    """
    if agg_cols is None:
        agg_cols = {"value": F.avg(value_col)}
    names = list(agg_cols)
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    actual = df.groupBy(F.col(key_col), b).agg(
        *[expr.alias(f"__{n}") for n, expr in agg_cols.items()]
    )
    bounds = actual.groupBy(key_col).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__b0"), F.col("__b1"), F.expr(step))
        ).alias("bucket"),
    )
    j = spine.join(actual, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key_col,
        "bucket",
        *[
            F.last(f"__{n}", ignorenulls=True).over(w).alias(n)
            for n in names
        ],
        F.col(f"__{names[0]}").isNull().alias("was_filled"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    window_rows: int = 10,
    order_cols: list[str] | None = None,
    quantize_pow2: int | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average per key, restarted at the
    head of a trailing ``window_rows`` frame: the recursive
    ``acc ← acc·(1−α) + α·x`` fold applied left-to-right over the
    frame's values. Truncating the memory to a bounded frame is what
    makes EWMA legal as a window expression — the full-history
    recursion has no per-row frame — and with (1−α)^10 ≈ 6% the
    truncation is already inside float noise for trend-smoothing use.

    Executes as collect_list over a ROWS frame + an ``aggregate``
    higher-order fold — all codegen, no UDF, and the fold's FP
    operation sequence is deterministic (frame order is fixed by the
    window sort), so the value is portable to the SQL oracle via
    ``list_reduce``. Prefer an α whose (1−α) is binary-exact (0.25,
    0.5) when hash-attesting across engines.

    ``order_cols`` appends tie-breakers after ``ts_col`` so the frame
    order (and therefore the fold) is unique even with duplicate
    timestamps.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    folded = F.aggregate(
        rest,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + F.lit(alpha) * x,
    )
    if quantize_pow2 is not None:
        # tie-safe attestation form (see double_exponential_forecast):
        # the fold is bit-identical cross-engine with binary-exact α,
        # and floor(x·2^q) carries no round(double, d) half-tie surface
        return df.select(
            key_col,
            ts_col,
            value_col,
            F.floor(folded * F.lit(float(2**quantize_pow2))).alias(
                "ewma_fp"
            ),
        )
    return df.select(
        key_col,
        ts_col,
        value_col,
        F.round(folded, 6).alias("ewma"),
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 10,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Exact trailing-N rolling median per key. Spark has no percentile
    window aggregate, so the frame is collected (bounded: ≤ N values),
    sorted, and the middle element(s) averaged — all codegen array
    expressions, and the same list spelling reproduces in the SQL
    oracle (engine-native median-over-window functions differ in
    interpolation, the explicit form cannot)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.array_sort(
        F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    n = F.size(arr)
    # Column `/` is double division; the truncating int cast restores
    # floor semantics (operands are positive)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return df.select(
        key_col,
        ts_col,
        value_col,
        F.round(med, 6).alias("roll_median"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Open/high/low/close bars per (key, bucket) — the downsampling
    shape for any metric stream. Open/close are picked by row_number
    over the (ts, tiebreak) sort in both directions and folded into
    the SAME grouped aggregate as high/low/volume (conditional min) —
    one shuffle, no self-joins, and a spelling every engine orders
    identically (struct-min argmax portability varies; row_number does
    not)."""
    b = F.date_trunc(bucket, F.col(ts_col))
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    wa = Window.partitionBy(key_col, "bucket").orderBy(*order)
    wd = Window.partitionBy(key_col, "bucket").orderBy(
        *[c.desc() for c in order]
    )
    staged = (
        df.select(
            F.col(key_col),
            b.alias("bucket"),
            F.col(ts_col),
            F.col(value_col).cast("double").alias("__v"),
            *[F.col(c) for c in (order_cols or [])],
        )
        .withColumn("__ra", F.row_number().over(wa))
        .withColumn("__rd", F.row_number().over(wd))
    )
    return (
        staged.groupBy(key_col, "bucket")
        .agg(
            F.min(F.when(F.col("__ra") == 1, F.col("__v"))).alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.min(F.when(F.col("__rd") == 1, F.col("__v"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(key_col, "bucket")
    )


def period_growth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "month",
) -> DataFrame:
    """Period-over-period activity growth per key: bucket counts, the
    previous period's count, and the relative change — one grouped agg
    feeding one lag window over the (tiny) per-key period frame.
    Growth is a single division of exact integer counts."""
    b = F.date_trunc(bucket, F.col(ts_col))
    counts = (
        df.select(F.col(key_col), b.alias("bucket"))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(key_col).orderBy("bucket")
    prev = F.lag("n").over(w)
    return counts.select(
        key_col,
        "bucket",
        "n",
        prev.alias("prev_n"),
        F.round((F.col("n") - prev) / prev, 6).alias("growth"),
    ).orderBy(key_col, "bucket")


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    ref: float,
    threshold: float,
    window_rows: int = 20,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One-sided CUSUM drift statistic per key over a trailing frame:
    ``S_t = max(0, S_{t−1} + (x_t − ref))`` restarted at the frame
    head (same bounded-recursion trick as :func:`ewma` — the full
    recursion has no per-row frame), with an alarm flag when S_t
    exceeds ``threshold``. The classic change-detection accumulator:
    drifts above ``ref`` accumulate, dips reset toward zero.

    Codegen fold; the SQL oracle reproduces the exact FP sequence via
    ``list_reduce`` over a zero-prepended list."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    s = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + (x - F.lit(ref))),
    )
    return df.select(
        key_col,
        ts_col,
        value_col,
        F.round(s, 6).alias("cusum"),
        (s > F.lit(threshold)).alias("alarm"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average per (key, bucket) for IRREGULARLY sampled
    series — the TSDB aggregate where a plain avg over-weights bursts:
    each observation holds its value until the next one (last one holds
    to the bucket end), and the average weights values by held seconds.

    One window (lead over the (key, bucket) sort) + one grouped agg,
    both on the same shuffle key. Output:
    (key, bucket, n_samples, twa)."""
    b = F.date_trunc(bucket, F.col(ts_col))
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col, "bucket").orderBy(*order)
    bucket_end = F.col("bucket") + F.expr(f"INTERVAL 1 {bucket}")
    staged = df.select(
        F.col(key_col),
        b.alias("bucket"),
        F.col(ts_col),
        F.col(value_col).cast("double").alias("__v"),
        *[F.col(c) for c in (order_cols or [])],
    ).withColumn(
        # microsecond-exact weights (unix_timestamp would truncate the
        # sub-second part and skew the weighting): integer micro
        # difference, ONE division — the FP form the oracle's
        # epoch_us(...) / 1e6 reproduces bit-for-bit
        "__w",
        (
            F.unix_micros(
                F.coalesce(F.lead(ts_col).over(w), bucket_end).cast(
                    "timestamp"
                )
            )
            - F.unix_micros(F.col(ts_col).cast("timestamp"))
        )
        / F.lit(1_000_000.0),
    )
    return (
        staged.groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(
                F.sum(F.col("__v") * F.col("__w")) / F.sum("__w"), 4
            ).alias("twa"),
        )
        .orderBy(key_col, "bucket")
    )


def merge_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    pad_s: int = 900,
) -> DataFrame:
    """Coverage islands: each event opens an activity interval
    ``[ts, ts + pad_s)``; overlapping/touching intervals per key merge
    into islands (the union-of-intervals aggregate TSDBs ship as
    ``range_agg``). Returns one row per island:
    (key, island_idx, n_events, start_s, end_s, covered_s).

    Classic gaps-and-islands on the running maximum: an island starts
    where the interval start exceeds the cumulative max end of all
    EARLIER intervals. Integer epoch-second arithmetic throughout —
    no FP, so results are engine-exact. One shuffle on ``key_col``;
    the two windows and the grouped agg share it."""
    start = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = Window.partitionBy(key_col).orderBy("__start", "__end")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    staged = (
        df.select(
            F.col(key_col),
            start.alias("__start"),
            (start + F.lit(int(pad_s))).alias("__end"),
        )
        .withColumn("__prev_max_end", F.max("__end").over(w_prev))
        .withColumn(
            "__is_new",
            F.when(
                F.col("__prev_max_end").isNull()
                | (F.col("__start") > F.col("__prev_max_end")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island_idx", F.sum("__is_new").over(w))
    )
    return (
        staged.groupBy(key_col, "island_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__start").alias("start_s"),
            F.max("__end").alias("end_s"),
            (F.max("__end") - F.min("__start")).alias("covered_s"),
        )
        .orderBy(key_col, "island_idx")
    )


def state_durations(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Run-length encoding of a state column per key: consecutive
    events with the same state collapse into one run with its span
    (the state-machine/uptime view of an event stream). Returns
    (key, run_idx, state, n_events, start_s, duration_s).

    ``order_cols`` breaks timestamp ties deterministically (pass the
    event id). Same single-shuffle shape as ``sessionize`` — the
    boundary flag is lag(state) != state instead of a time gap."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_state = F.lag(state_col).over(w)
    is_new = F.when(
        prev_state.isNull() | (prev_state != F.col(state_col)), F.lit(1)
    ).otherwise(F.lit(0))
    epoch = F.unix_timestamp(F.col(ts_col)).cast("long")
    staged = df.withColumn("run_idx", F.sum(is_new).over(w)).withColumn(
        "__epoch", epoch
    )
    return (
        staged.groupBy(key_col, "run_idx")
        .agg(
            F.first(state_col).alias("state"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("__epoch").alias("start_s"),
            (F.max("__epoch") - F.min("__epoch")).alias("duration_s"),
        )
        .orderBy(key_col, "run_idx")
    )


def downsample_minmax(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_buckets: int = 100,
) -> DataFrame:
    """Visual-fidelity downsampling: split each series into
    ``n_buckets`` equal time buckets and keep the min-value and
    max-value point per bucket (the MinMax variant of viz
    downsampling — unlike LTTB it has no sequential dependence on the
    previously selected point, so it stays a pure two-window
    projection: engine-exact, shuffle-once, no Arrow batches).

    Ties on value keep the earliest (ts) point. Returns one row per
    kept point: (key, bucket_idx, ts, value, kind ∈ {'min','max'});
    a single-point bucket emits both kinds for that point.

    Scale: one shuffle on (key); bucket bounds come from a per-key
    min/max window on the same shuffle, so the whole thing is one
    exchange + one sort regardless of corpus size."""
    wk = Window.partitionBy(key_col)
    ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lo = F.min(ep).over(wk)
    hi = F.max(ep).over(wk)
    span = F.greatest(hi - lo, F.lit(1))
    bucket = F.least(
        (F.lit(int(n_buckets)) * (ep - lo) / span).cast("long"),
        F.lit(int(n_buckets) - 1),
    )
    staged = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn("__bucket", bucket)
    wmin = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col("__v").asc(), F.col(ts_col).asc()
    )
    wmax = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col("__v").desc(), F.col(ts_col).asc()
    )
    ranked = staged.withColumn("__rmin", F.row_number().over(wmin)).withColumn(
        "__rmax", F.row_number().over(wmax)
    )
    mins = ranked.where(F.col("__rmin") == 1).select(
        F.col(key_col),
        F.col("__bucket").alias("bucket_idx"),
        F.col(ts_col),
        F.col("__v").alias("value"),
        F.lit("min").alias("kind"),
    )
    maxs = ranked.where(F.col("__rmax") == 1).select(
        F.col(key_col),
        F.col("__bucket").alias("bucket_idx"),
        F.col(ts_col),
        F.col("__v").alias("value"),
        F.lit("max").alias("kind"),
    )
    return mins.unionByName(maxs)


def seasonal_baseline_mae(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    season: int = 24,
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each bucket's mean
    value as the value one season earlier (t − ``season`` buckets) and
    report the mean absolute error per key — the standard sanity
    baseline every fancier forecaster must beat, and a drift alarm
    when MAE jumps.

    One bucket aggregate (corpus pass) + a lag window over the tiny
    per-key bucket frame. Buckets with no seasonal predecessor ROW are
    excluded (lag semantics: the previous bucket row in sequence, so
    gaps shift the reference — acceptable for a baseline; gap_fill
    exists when exact calendar alignment matters).
    Returns (key, n_buckets, mae)."""
    b = F.date_trunc(bucket, F.col(ts_col))
    per_bucket = (
        df.select(F.col(key_col), b.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(F.avg(value_col).alias("__v"))
    )
    w = Window.partitionBy(key_col).orderBy("bucket")
    with_pred = per_bucket.withColumn(
        "__pred", F.lag("__v", season).over(w)
    ).where(F.col("__pred").isNotNull())
    return (
        with_pred.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.avg(F.abs(F.col("__v") - F.col("__pred"))), 4).alias(
                "mae"
            ),
        )
        .orderBy(key_col)
    )


def double_exponential_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    window_rows: int = 8,
    horizon: int = 1,
    order_cols: list[str] | None = None,
    quantize_pow2: int | None = None,
) -> DataFrame:
    """Brown's double exponential smoothing: trend-aware one-pass
    forecast from two stacked EWMA folds — S1 = EWMA(x),
    S2 = EWMA(S1), level = 2·S1 − S2, trend = α/(1−α)·(S1 − S2),
    forecast = level + horizon·trend. Unlike Holt's coupled (l, b)
    recursion this DECOMPOSES into scalar folds, so it stays a pure
    codegen window expression (and its FP sequence ports to the SQL
    oracle via the same ``list_reduce`` spelling as ``ewma``).

    Same bounded-frame restart contract as ``ewma``; rows whose frame
    has a single element carry a NULL forecast (no trend evidence).
    Prefer binary-exact α (0.5, 0.25) for cross-engine hashing.

    ``quantize_pow2=q`` replaces the decimal-rounded double outputs
    with tie-safe fixed-point BIGINTs ``floor(x · 2^q)``: with a
    binary-exact α the fold is pure IEEE ``*``/``+`` (bit-identical on
    every compliant engine), scaling by a power of two is exact, and
    floor is exact — so the attested integers carry NO rounding-tie
    surface, unlike ``round(x, d)`` whose tie handling differs across
    engine builds (the class of the r8 driver hash flake)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )

    def fold(arr):
        rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
        return F.aggregate(
            rest,
            F.element_at(arr, 1),
            lambda acc, x: acc * F.lit(1.0 - alpha) + F.lit(alpha) * x,
        )

    s1 = fold(F.collect_list(F.col(value_col).cast("double")).over(w))
    staged = df.withColumn("__s1", s1).withColumn(
        "__n", F.count(F.lit(1)).over(w)
    )
    s2 = fold(F.collect_list("__s1").over(w))
    level = 2.0 * F.col("__s1") - F.col("__s2")
    trend = F.lit(alpha / (1.0 - alpha)) * (F.col("__s1") - F.col("__s2"))
    if quantize_pow2 is not None:
        scale = F.lit(float(2**quantize_pow2))
        return (
            staged.withColumn("__s2", s2)
            .select(
                key_col,
                ts_col,
                value_col,
                F.floor(F.col("__s1") * scale).alias("s1_fp"),
                F.floor(F.col("__s2") * scale).alias("s2_fp"),
                F.when(
                    F.col("__n") >= 2,
                    F.floor(
                        (level + F.lit(float(horizon)) * trend) * scale
                    ),
                ).alias("forecast_fp"),
            )
        )
    return (
        staged.withColumn("__s2", s2)
        .select(
            key_col,
            ts_col,
            value_col,
            F.round("__s1", 6).alias("s1"),
            F.round("__s2", 6).alias("s2"),
            F.when(
                F.col("__n") >= 2,
                F.round(level + F.lit(float(horizon)) * trend, 4),
            ).alias("forecast"),
        )
    )


def rolling_corr(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    x_col,
    y_col,
    window_rows: int = 20,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Rolling Pearson correlation of two series per key over a
    trailing ROWS frame (regime-change detection: a correlation that
    flips sign flags decoupling). One Window node; ``corr`` is a
    native window aggregate in both engines. Frames with < 2 rows or
    zero variance yield NULL."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    c = F.corr(x, y).over(w)
    # zero-variance frames: Spark's corr yields NaN where SQL engines
    # yield NULL — normalize undefined to NULL (it IS undefined)
    c = F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)
    return df.select(
        key_col,
        ts_col,
        # + 0.0 canonicalizes IEEE negative zero (a corr of -1e-17
        # rounds to -0.0, which engines render differently)
        (F.round(c, 4) + F.lit(0.0)).alias("roll_corr"),
        F.count(F.lit(1)).over(w).alias("n_frame"),
    )


def autocorrelation(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    max_lag: int = 3,
) -> DataFrame:
    """Sample autocorrelation of each key's value series at lags
    1..``max_lag`` — Pearson corr between the series and its lagged
    self (the pair-wise ACF estimator). Near-zero everywhere ⇒ white
    noise; slow decay ⇒ trend/seasonality worth a seasonal baseline
    (see ``seasonal_baseline``).

    Shape: ONE window shuffle on ``key_col`` produces all lag columns
    (single Window node), then one grouped aggregate computes every
    ``corr`` in the same pass. Ordering is made deterministic with
    ``order_tiebreak`` so equal timestamps can't reorder between runs
    or engines."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    v = F.col(value_col)
    lagged = df.select(
        key_col,
        value_col,
        *[F.lag(v, k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for k in range(1, max_lag + 1):
        # safe_corr: NULL on zero variance like ANSI engines (built-in
        # corr raises under ANSI mode), complete-pairs masking;
        # snap_zero: a true-zero ACF estimate's sign is reduction-order
        # FP noise that would split engines on "-0.0" vs "0.0"
        aggs.append(
            snap_zero(safe_corr(v, F.col(f"__l{k}"))).alias(f"acf_{k}")
        )
    return lagged.groupBy(key_col).agg(*aggs)


def hourly_cross_correlation(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    type_a: str = "view",
    type_b: str = "purchase",
    max_lag: int = 3,
) -> DataFrame:
    """Lead-lag cross-correlation between two event streams' hourly
    rates: one row with corr(a_t, b_{t+k}) for k in [-max_lag,
    +max_lag]. A peak at k > 0 means series A LEADS series B by k
    hours (views foreshadow purchases); at k < 0, A lags.

    Missing hours count as 0 — the hour spine is generated from the
    observed [min, max] range (``sequence`` + explode), NOT taken from
    the hours that happen to have events, so quiet hours can't
    silently splice distant timestamps into adjacent lag pairs.
    The single ordered window runs over the spine frame (hours between
    min and max — bounded by calendar time, never by event count), the
    same small-frame trade as ``op_ks_test``. corr is covar/(σ·σ)
    under try_divide (degenerate series → NULL), near-zero snapped to
    0.0 — see ``autocorrelation``."""
    hour = F.date_trunc("hour", F.col(ts_col))
    bounds = df.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    cnt = lambda t: (  # noqa: E731
        df.where(F.col(type_col) == t)
        .groupBy(hour.alias("hour"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    joined = (
        spine.join(cnt(type_a).withColumnRenamed("c", "a"), "hour", "left")
        .join(cnt(type_b).withColumnRenamed("c", "b"), "hour", "left")
        .select(
            "hour",
            F.coalesce(F.col("a"), F.lit(0)).cast("double").alias("a"),
            F.coalesce(F.col("b"), F.lit(0)).cast("double").alias("b"),
        )
    )
    w = Window.orderBy("hour")
    shifted = joined.select(
        "a",
        *[
            (
                F.lead("b", k).over(w) if k >= 0 else F.lag("b", -k).over(w)
            ).alias(f"b_{k + max_lag}")
            for k in range(-max_lag, max_lag + 1)
        ],
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_hours")]
    for k in range(-max_lag, max_lag + 1):
        c = safe_corr(F.col("a"), F.col(f"b_{k + max_lag}"))
        name = f"xc_{'m' if k < 0 else 'p'}{abs(k)}" if k != 0 else "xc_0"
        aggs.append(snap_zero(c).alias(name))
    return shifted.agg(*aggs)


def seasonality_strength(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Share of each key's hourly-rate variance explained by its
    hour-of-day profile (the ANOVA decomposition): strength =
    1 − var(residual)/var(total) over hourly counts, residual = count
    minus that (key, hour-of-day)'s mean. ≈0 ⇒ no daily rhythm (plain
    z-scores fine); →1 ⇒ strongly periodic (use seasonal baselines or
    the false-positive rate explodes).

    Shape: the DENSE hourly frame (``dense_hourly_counts`` — a
    1-hour-a-day stream's seasonality lives in its 23 silent hours,
    which a sparse frame would drop entirely), one (key, hour-of-day)
    mean via a window, one final variance agg — all map-side-
    combinable, frames bounded by calendar hours × keys. var_pop of
    exact group means guarantees strength ∈ [0, 1]; a constant series
    (zero variance) → NULL."""
    hourly = dense_hourly_counts(df, key_col, ts_col)
    w = Window.partitionBy(key_col, F.hour("h"))
    resid = hourly.select(
        key_col,
        "c",
        (F.col("c") - F.avg("c").over(w)).alias("r"),
    )
    strength = F.lit(1.0) - F.try_divide(F.var_pop("r"), F.var_pop("c"))
    # snap_zero: a no-seasonality share is 0 up to FP cancellation
    # whose sign is reduction-order noise
    snapped = snap_zero(strength)
    return (
        resid.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            snapped.alias("seasonality"),
        )
        .orderBy(key_col)
    )


def burstiness(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Goh-Barabási burstiness of each key's inter-event gaps:
    B = (σ−μ)/(σ+μ) over the gap distribution — −1 = perfectly
    periodic, 0 = Poisson, →1 = heavy bursts (bot vs human cadence,
    scraper detection). Keys with fewer than ``min_gaps`` gaps are
    dropped (σ needs ≥ 2 samples).

    One window shuffle on the key produces the lag column; one grouped
    aggregate computes μ/σ/B. All-zero gaps → σ+μ = 0 → NULL via
    try_divide.

    The gap total is attested as the exact BIGINT ``gap_sum_s`` (gaps
    are integer seconds; an integer sum is associative, so it carries
    none of the accumulation-order / round-half-tie surface a rounded
    ``avg`` double does — the r10 tie audit found the old
    ``round(avg(g), 4)`` sitting machine-exactly on a 4th-decimal tie).
    The mean is ``gap_sum_s / n_gaps``."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    ts = F.unix_timestamp(F.col(ts_col))
    gap = ts - F.lag(ts).over(w)
    gaps = df.select(F.col(key_col), gap.alias("g")).where(
        F.col("g").isNotNull()
    )
    gd = F.col("g").cast("double")
    mu, sd = F.avg(gd), F.stddev_samp(gd)
    # snap_zero: a Poisson-like cadence sits at B ≈ 0 where the sign
    # is FP noise
    b = snap_zero(F.try_divide(sd - mu, sd + mu))
    return (
        gaps.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("g").cast("bigint").alias("gap_sum_s"),
            b.alias("burstiness"),
        )
        .where(F.col("n_gaps") >= min_gaps)
        .orderBy(key_col)
    )


def mean_shift_changepoint(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Best single mean-shift changepoint per key over the hourly
    rate: the split maximizing |mean_left − mean_right| ·
    √(n_l·n_r/n) (the two-sample t-statistic numerator — binary
    segmentation's scoring function). Returns the split hour, both
    segment means, and the score; rerun on segments to find further
    breaks (classic binary segmentation).

    Shape: the DENSE hourly frame (``dense_hourly_counts`` — silent
    hours are explicit zeros, so a drop-to-zero outage is visible as
    a split), then cumulative windows per key, then an argmax row per
    key — two window passes, no self-joins. The argmax orders by the
    ROUNDED score with the hour as tiebreak, so sub-ulp FP noise
    can't flip the reported changepoint between engines."""
    hourly = dense_hourly_counts(df, key_col, ts_col)
    wcum = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(key_col)
    scored = hourly.select(
        key_col,
        "h",
        F.sum("c").over(wcum).alias("cum"),
        F.row_number()
        .over(Window.partitionBy(key_col).orderBy("h"))
        .alias("i"),
        F.sum("c").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).where(F.col("i") < F.col("n"))  # split must leave a right segment
    ml = F.col("cum") / F.col("i")
    mr = (F.col("tot") - F.col("cum")) / (F.col("n") - F.col("i"))
    score = F.abs(ml - mr) * F.sqrt(
        F.col("i") * (F.col("n") - F.col("i")) / F.col("n")
    )
    ranked = scored.select(
        key_col,
        "h",
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(ml, 4).alias("mean_left"),
        F.round(mr, 4).alias("mean_right"),
        F.round(score, 6).alias("score"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(key_col).orderBy(
                F.col("score").desc(), F.col("h")
            )
        ),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            key_col,
            F.col("h").alias("split_hour"),
            "n_hours",
            "mean_left",
            "mean_right",
            "score",
        )
        .orderBy(key_col)
    )


def seasonal_decompose_hourly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    trend_window: int = 24,
    interior_seasonal: bool = False,
) -> DataFrame:
    """Additive STL-lite decomposition of each key's hourly rate:
    count = trend (centered moving average over ``trend_window + 1``
    rows — ``rowsBetween(-w/2, w/2)`` is symmetric around the current
    hour, so the EFFECTIVE window is one hour wider than the
    parameter; a textbook even-order centered MA would instead use
    the 2×(w/2) half-end-point weighted form)
    + seasonal (mean detrended value per hour-of-day)
    + residual. The residual is what anomaly thresholds should watch —
    raw counts alarm on every rush hour.

    Two windows + one broadcast join, all on the DENSE hourly frame
    (``dense_hourly_counts`` — a sparse frame would let the centered
    MA silently bridge multi-day gaps as if adjacent). Edge hours
    without a full centered window use the partial average (standard
    practice; flagged via n_window).

    ``interior_seasonal=True`` estimates the hour-of-day means from
    FULL-window rows only and computes every component through exact
    integer arithmetic with one final IEEE division — counts and
    window sums are exact integers, so trend = S/n and
    seasonal = Σ(full·c − S) / (full·m) are bit-identical on every
    compliant engine and need no rounding or zero-snapping at all
    (the default spelling's seasonal mean is an order-dependent float
    fold whose 4-decimal rounding can land on a %.2f tie — the
    tie_audit hazard class). Statistically this is the textbook STL
    choice anyway: edge trend estimates are biased, so interior rows
    should carry the seasonal fit."""
    hourly = dense_hourly_counts(df, key_col, ts_col)
    half = trend_window // 2
    w_ma = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(-half, half)
    )
    if interior_seasonal:
        full = 2 * half + 1
        trended = hourly.select(
            key_col,
            "h",
            F.hour("h").alias("hod"),
            "c",
            F.sum("c").over(w_ma).cast("long").alias("__s"),
            F.count(F.lit(1)).over(w_ma).cast("long").alias("n_window"),
        )
        trend = F.col("__s").cast("double") / F.col("n_window").cast(
            "double"
        )
        seas = (
            trended.where(F.col("n_window") == full)
            .groupBy(key_col, "hod")
            .agg(
                F.sum(
                    F.lit(full) * F.col("c").cast("long") - F.col("__s")
                ).alias("__num"),
                (F.count(F.lit(1)) * full).cast("long").alias("__den"),
            )
        )
        seasonal = F.col("__num").cast("double") / F.col("__den").cast(
            "double"
        )
        resid = F.col("c") - trend - seasonal
        return (
            trended.join(F.broadcast(seas), [key_col, "hod"], "left")
            .select(
                key_col,
                "h",
                F.col("c").cast("bigint").alias("n_events"),
                trend.alias("trend"),
                seasonal.alias("seasonal"),
                resid.alias("residual"),
                "n_window",
            )
            .orderBy(key_col, "h")
        )
    trended = hourly.select(
        key_col,
        "h",
        F.hour("h").alias("hod"),
        "c",
        F.avg("c").over(w_ma).alias("trend"),
        F.count(F.lit(1)).over(w_ma).alias("n_window"),
    )
    seas = trended.groupBy(key_col, "hod").agg(
        F.avg(F.col("c") - F.col("trend")).alias("seasonal")
    )
    def _snap(col: Column) -> Column:
        # statistically-zero components: see ``snap_zero`` (tighter
        # eps — these are sums of a few dozen terms, and legitimate
        # small seasonal values start well above 1e-9)
        return snap_zero(col, eps=1e-9, digits=4)

    resid = F.col("c") - F.col("trend") - F.col("seasonal")
    return (
        trended.join(F.broadcast(seas), [key_col, "hod"])
        .select(
            key_col,
            "h",
            F.col("c").cast("bigint").alias("n_events"),
            _snap(F.col("trend")).alias("trend"),
            _snap(F.col("seasonal")).alias("seasonal"),
            _snap(resid).alias("residual"),
            F.col("n_window").cast("bigint").alias("n_window"),
        )
        .orderBy(key_col, "h")
    )


def dense_hourly_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """(key, h, c): hourly event counts with EXPLICIT ZERO rows for
    silent hours inside each key's own [min, max] hour span — the
    shared spine for every hourly-rate diagnostic (a changepoint
    detector that never sees the outage hours can't find the outage;
    neighbors-of-a-gap must compare against 0, not against whatever
    hour happens to sort next).

    Per-key spine (sequence over that key's own bounds, like
    ``gap_fill``) — rows added are proportional to each key's
    calendar span, never |keys| × global range. One grouped count +
    one left join, both keyed on (key, h)."""
    hourly = df.groupBy(
        F.col(key_col),
        F.date_trunc("hour", F.col(ts_col)).alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    bounds = hourly.groupBy(key_col).agg(
        F.min("h").alias("__h0"), F.max("h").alias("__h1")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__h0"), F.col("__h1"), F.expr("interval 1 hour")
            )
        ).alias("h"),
    )
    return spine.join(hourly, [key_col, "h"], "left").select(
        key_col, "h", F.coalesce(F.col("c"), F.lit(0.0)).alias("c")
    )
