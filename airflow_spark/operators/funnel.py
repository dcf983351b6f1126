"""Event-sequence analytics: ordered funnels and cohort retention.

Classic product-analytics operators over an event log, expressed as
join+aggregate chains (no window over a global sort, no per-user
Python):

- ``funnel``: per-user ordered step times — step *i* counts only if it
  happens strictly AFTER the user's step *i−1* time. One grouped
  aggregate per step, each keyed by user — at 100 TB each stage
  shuffles only (user, ts) survivors of the previous stage, and the
  event scan is filtered to the step's type predicate (pushed down).
- ``cohort_retention``: users bucketed by first-activity period ×
  activity offset — two grouped aggregates and one join.

Reference analog: none (north-star analytics extension over the
driver's `events` table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered funnel times: one row per user who completed at
    least step 1, with ``t1..tN`` timestamps (null once a step is not
    reached). Step *i* must occur strictly after the user's step *i−1*.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    u, ts = F.col(user_col), F.col(ts_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .select(u.alias("user"), ts.alias("__ts"))
            .join(cur, "user")
            .where(F.col("__ts") > F.col(f"t{i - 1}"))
            .groupBy("user")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "user", "left")
    return cur


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Users reaching each step, in order — the funnel report."""
    f = funnel(events, steps, user_col, ts_col, type_col)
    # one wide agg row → unpivot via explode (single pass over f)
    agg = f.agg(
        *[F.count(F.col(f"t{i}")).alias(f"__n{i}") for i in range(1, len(steps) + 1)]
    )
    out = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return agg.select(F.explode(out).alias("r")).select("r.*").orderBy("step")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """Retention triangle: distinct active users per (cohort period ×
    period offset), cohort = the user's first-activity period."""
    if bucket not in ("day", "week"):
        raise ValueError(
            f"cohort_retention supports bucket='day' or 'week', got "
            f"{bucket!r}: offsets divide by a fixed day count, which is "
            "wrong for variable-length buckets like months (use "
            "months_between-based offsets for those)"
        )
    u, ts = F.col(user_col), F.col(ts_col)
    per = F.date_trunc(bucket, ts)
    # date-typed cohort label (a week bucket IS a date; also matches
    # the DuckDB date_trunc return type for oracle parity)
    cohorts = events.groupBy(u.alias("user")).agg(
        F.min(per).cast("date").alias("cohort")
    )
    active = events.select(u.alias("user"), per.alias("period")).distinct()
    days = {"day": 1, "week": 7}[bucket]
    return (
        active.join(cohorts, "user")
        .groupBy(
            F.col("cohort"),
            (
                F.datediff(F.col("period"), F.col("cohort")) / days
            )
            .cast("bigint")
            .alias("week_offset" if bucket == "week" else "day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "week_offset" if bucket == "week" else "day_offset")
    )


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    gap_minutes: int = 30,
    n_steps: int = 3,
    k: int = 20,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Most common opening journeys: per session (inactivity-gap
    sessionization), take the first ``n_steps`` steps in event order
    and count identical paths across all sessions — the "what do users
    do first" report next to funnels (which need a predeclared step
    list; paths discover it).

    Shape: the session window and the step collection share the
    (user, ts) sort from ONE shuffle; path strings (tiny) feed a
    map-side-combined count and a TakeOrdered top-k. Ties in ``ts``
    break by ``order_cols`` so the path string is deterministic."""
    from ..operators.timeseries import sessionize
    from pyspark.sql import Window

    s = sessionize(df, user_col, ts_col, gap_minutes)
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col, "session_idx").orderBy(*order)
    stepped = (
        s.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_steps)
        # NULL steps become an explicit token: concat_ws silently DROPS
        # nulls, which would collapse [a, NULL, b] and [a, b] into the
        # same path string. Step values containing the separator would
        # be ambiguous too — acceptable for enum-like step columns,
        # use a non-printable separator otherwise.
        .withColumn(
            "__step", F.coalesce(F.col(step_col).cast("string"), F.lit("(null)"))
        )
    )
    paths = (
        stepped.groupBy(user_col, "session_idx")
        .agg(
            F.concat_ws(
                ">", F.array_sort(
                    F.collect_list(F.struct("__rn", "__step"))
                ).getField("__step")
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def association_rules(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    gap_minutes: int = 30,
    min_pair_baskets: int = 5,
    k: int = 50,
) -> DataFrame:
    """Market-basket association rules over session baskets: a basket
    is the DISTINCT item set of one inactivity-gap session; for every
    co-occurring unordered pair (x < y) report support, both
    directional confidences, and lift.

    Shape: distinct (basket, item) is one shuffle; pair counts come
    from the basket-keyed self-join (cost Σ basket_size², never
    |items|² over the catalog); per-item basket counts are tiny and
    broadcast; N is a broadcast scalar. All scores are single IEEE
    divisions of exact integer counts — oracle-portable. ``baskets``
    is PERSISTED: four consumers read it (the N scalar, the item
    counts, and both sides of the pair self-join) and an unpersisted
    plan re-runs the sessionize window + distinct once per consumer —
    4 corpus passes for a frame that is itself corpus-bounded and
    tiny after the distinct."""
    from ..operators.timeseries import sessionize

    s = sessionize(df, user_col, ts_col, gap_minutes)
    baskets = (
        s.select(
            F.concat_ws(
                "#", F.col(user_col).cast("string"), F.col("session_idx")
            ).alias("bid"),
            F.col(item_col).alias("item"),
        )
        .distinct()
        .persist()
    )
    n_baskets = baskets.select("bid").distinct().agg(
        F.count(F.lit(1)).alias("n_b")
    )
    item_counts = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    lx = baskets.select("bid", F.col("item").alias("x"))
    ly = baskets.select("bid", F.col("item").alias("y"))
    pairs = (
        lx.join(ly, "bid")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_pair_baskets)
    )
    cx = item_counts.select(F.col("item").alias("x"), F.col("c").alias("c_x"))
    cy = item_counts.select(F.col("item").alias("y"), F.col("c").alias("c_y"))
    return (
        pairs.join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(F.col("c_xy") / F.col("n_b"), 6).alias("support"),
            F.round(F.col("c_xy") / F.col("c_x"), 6).alias("conf_x_y"),
            F.round(F.col("c_xy") / F.col("c_y"), 6).alias("conf_y_x"),
            F.round(
                (F.col("c_xy") * F.col("n_b"))
                / (F.col("c_x") * F.col("c_y")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "x", "y")
        .limit(k)
    )


def conversion_latency(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    view_type: str = "view",
    buy_type: str = "purchase",
) -> DataFrame:
    """Per-user (first_view, first_buy, lat_s, viewed, converted):
    first ``view_type`` event to the first ``buy_type`` event STRICTLY
    AFTER it. The user's globally-first purchase may predate their
    first view (repeat buyers) — that must not disqualify them, so the
    view anchor rides a per-user window before the purchase reduction.
    One shuffle (the window and the groupBy share the user partitioning).
    """
    from pyspark.sql import Window

    fv = F.min(
        F.when(F.col(type_col) == view_type, F.col(ts_col))
    ).over(Window.partitionBy(user_col))
    per_user = (
        events.withColumn("__fv", fv)
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.min("__fv").alias("first_view"),
            F.min(
                F.when(
                    (F.col(type_col) == buy_type)
                    & (F.col(ts_col) > F.col("__fv")),
                    F.col(ts_col),
                )
            ).alias("first_buy"),
        )
    )
    return per_user.select(
        "user_id",
        "first_view",
        "first_buy",
        (
            F.unix_timestamp("first_buy") - F.unix_timestamp("first_view")
        ).alias("lat_s"),
        F.col("first_view").isNotNull().alias("viewed"),
        (
            F.col("first_view").isNotNull()
            & F.col("first_buy").isNotNull()
        ).alias("converted"),
    )


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    view_type: str = "view",
    buy_type: str = "purchase",
) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-conversion: S(t) =
    Π_{t_i ≤ t} (1 − d_i/n_i) over the distinct event (conversion)
    times, where users who never convert are RIGHT-CENSORED at the
    observation end instead of being dropped — the difference between
    this and a naive latency percentile is that censoring keeps the
    non-converters in the denominator for as long as they were
    observed, so the curve isn't biased toward fast converters.

    Subjects: users with a first view; duration = first view → first
    purchase strictly after it (:func:`conversion_latency` semantics);
    censor time = first view → global max timestamp.

    Shape: the per-user reduction is one user-keyed pass; the curve
    itself lives on the distinct-duration frame (bounded by distinct
    conversion latencies), with the cumulative product computed as
    exp(Σ ln(1 − d/n)) over one ordered window. n_at_risk comes from
    cumulative counts over the same frame — no per-subject window, no
    self-join.

    Output: (t_s, n_risk, n_events, survival) ordered by t_s."""
    from pyspark.sql import Window

    base = conversion_latency(
        events, user_col, ts_col, type_col, view_type, buy_type
    ).where(F.col("viewed"))
    end_ts = events.agg(F.max(ts_col).alias("__end"))
    subj = base.crossJoin(F.broadcast(end_ts)).select(
        F.when(
            F.col("converted"), F.col("lat_s").cast("double")
        )
        .otherwise(
            (
                F.unix_timestamp("__end")
                - F.unix_timestamp("first_view")
            ).cast("double")
        )
        .alias("t"),
        F.col("converted").cast("int").alias("d"),
    )
    # distinct-time frame: events and censorings collapse per time
    per_t = subj.groupBy("t").agg(
        F.sum("d").alias("d_i"),
        F.count(F.lit(1)).alias("c_i"),
    )
    w_order = Window.orderBy("t")
    cum_prev = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = subj.agg(F.count(F.lit(1)).alias("n_total"))
    risked = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d_i",
        (
            F.col("n_total")
            - F.coalesce(F.sum("c_i").over(cum_prev), F.lit(0))
        ).alias("n_i"),
    )
    # the (1 - d/n) factor is clamped away from 0: at a time where
    # EVERY remaining subject converts, ln(0) is NULL in Spark but
    # -inf in most SQL engines — the clamp makes both produce the
    # same ~0 survival that rounds to 0.0
    surv = F.exp(
        F.sum(
            F.log(
                F.greatest(
                    1.0 - F.col("d_i") / F.col("n_i"), F.lit(1e-12)
                )
            )
        ).over(w_order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        risked.where(F.col("d_i") > 0)  # KM steps only at event times
        .select(
            F.col("t").alias("t_s"),
            F.col("n_i").cast("bigint").alias("n_risk"),
            F.col("d_i").cast("bigint").alias("n_events"),
            F.round(surv, 6).alias("survival"),
        )
        .orderBy("t_s")
    )


def audience_overlap(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Jaccard overlap between every pair of event types' user
    audiences — "do the people who X also Y" (feature-adoption /
    cannibalization analytics). Distinct (type, user) pairs self-join
    on user (both sides pre-deduped, so the join output is exactly
    the intersection counts), audience sizes broadcast back.

    Shape: one distinct + one equi self-join keyed on the user — the
    |types|² result frame is tiny; nothing pairwise ever happens at
    the user level."""
    tu = events.select(
        F.col(type_col).alias("t"), F.col(user_col).alias("u")
    ).distinct()
    sizes = tu.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        tu.select(F.col("t").alias("t_a"), "u")
        .join(tu.select(F.col("t").alias("t_b"), "u"), "u")
        .where(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("t").alias("t_a"), F.col("n").alias("n_a"))),
            "t_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("t").alias("t_b"), F.col("n").alias("n_b"))),
            "t_b",
        )
        .select(
            "t_a",
            "t_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("t_a", "t_b")
    )


def power_user_concentration(
    events: DataFrame,
    user_col: str = "user_id",
    thresholds: tuple[float, ...] = (0.5, 0.8),
) -> DataFrame:
    """The 80/20 report: how few users produce each ``threshold``
    share of all events (count + user-share), one row per threshold.
    Heaviest-first cumulative share over the per-user count frame —
    a window over |users| rows, not events."""
    from pyspark.sql import Window

    per_user = events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    order = (F.col("n").desc(), F.col(user_col))
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    tot = per_user.agg(
        F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_users")
    )
    ranked = per_user.select(
        F.sum("n").over(w).alias("cum"),
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
    ).crossJoin(F.broadcast(tot))
    # ONE aggregate answers every threshold (min rank whose cumulative
    # share reaches it) — a per-threshold filter+agg would rebuild the
    # per-user count and the global sort window len(thresholds) times
    agg = ranked.agg(
        F.first("n_users").alias("n_users"),
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.col("n_events") * F.lit(th),
                    F.col("rank"),
                )
            ).alias(f"__k{i}")
            for i, th in enumerate(thresholds)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(th).alias("share_of_events"),
                F.col(f"__k{i}").cast("bigint").alias("n_top_users"),
                F.round(
                    F.col(f"__k{i}") / F.col("n_users").cast("double"), 6
                ).alias("user_share"),
            )
            for i, th in enumerate(thresholds)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("share_of_events")
    )
