"""Tests for funnel and cohort-retention operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from airflow_spark.operators import funnel


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=ts, event_type=t) for u, ts, t in rows],
        schema="user_id bigint, ts string, event_type string",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "event_type")


def test_funnel_enforces_order(spark):
    ev = _events(
        spark,
        [
            # u1 completes in order
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 11:00:00", "click"),
            (1, "2024-01-01 12:00:00", "purchase"),
            # u2 purchases BEFORE clicking: purchase must not count
            (2, "2024-01-01 10:00:00", "view"),
            (2, "2024-01-01 12:00:00", "click"),
            (2, "2024-01-01 11:00:00", "purchase"),
            # u3 never views: appears in no step
            (3, "2024-01-01 10:00:00", "click"),
            (3, "2024-01-01 11:00:00", "purchase"),
        ],
    )
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel.funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_funnel_strictly_after_excludes_ties(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:00:00", "click"),  # same instant: not after
        ],
    )
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel.funnel_counts(ev, ["view", "click"]).collect()
    }
    assert got == {"view": 1, "click": 0}


def test_funnel_requires_steps(spark):
    with pytest.raises(ValueError):
        funnel.funnel(_events(spark, []), [])


def test_cohort_retention_triangle(spark):
    ev = _events(
        spark,
        [
            # u1: first week W1, active W1+W2 ; u2: W1 only ; u3: W2 only
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-08 10:00:00", "view"),
            (2, "2024-01-02 10:00:00", "view"),
            (3, "2024-01-09 10:00:00", "view"),
        ],
    )
    rows = {
        (str(r["cohort"]), r["week_offset"]): r["n_users"]
        for r in funnel.cohort_retention(ev, bucket="week").collect()
    }
    assert rows == {
        ("2024-01-01", 0): 2,   # u1 + u2 in W1 cohort
        ("2024-01-01", 1): 1,   # u1 retained in W2
        ("2024-01-08", 0): 1,   # u3's own cohort
    }


def test_top_paths_orders_steps_and_counts_sessions(spark):
    """Paths must respect event order within a session, truncate to
    n_steps, and start a new session across the inactivity gap."""
    import datetime as dt

    from airflow_spark.operators.funnel import top_paths

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, one session: a > b > c > d (truncated to 3)
        (1, t0, "a", 1), (1, t0 + m, "b", 2), (1, t0 + 2 * m, "c", 3),
        (1, t0 + 3 * m, "d", 4),
        # user 1, second session after a 2h gap: a > b
        (1, t0 + dt.timedelta(hours=2), "a", 5),
        (1, t0 + dt.timedelta(hours=2) + m, "b", 6),
        # user 2: a > b > c again
        (2, t0, "a", 7), (2, t0 + m, "b", 8), (2, t0 + 2 * m, "c", 9),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    got = {r["path"]: r["n_sessions"] for r in
           top_paths(df, gap_minutes=30, n_steps=3, order_cols=["event_id"]).collect()}
    assert got == {"a>b>c": 2, "a>b": 1}


def test_association_rules_hand_counts(spark):
    """Pair counts/confidences must match hand computation over known
    session baskets."""
    import datetime as dt

    from airflow_spark.operators.funnel import association_rules

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)

    def sess(uid, hour, items):
        base = t0 + dt.timedelta(hours=hour * 3)
        return [(uid, base + i * m, it) for i, it in enumerate(items)]

    rows = (
        sess(1, 0, ["a", "b"]) + sess(1, 1, ["a", "b", "c"])
        + sess(2, 0, ["a", "b"]) + sess(2, 1, ["a"]) + sess(3, 0, ["b", "c"])
    )
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {(r["x"], r["y"]): r for r in
           association_rules(df, min_pair_baskets=1, k=10).collect()}
    # baskets: {ab, abc, ab, a, bc}; N=5, c_a=4, c_b=4, c_c=2
    ab = got[("a", "b")]
    assert ab["c_xy"] == 3 and ab["support"] == 0.6
    assert ab["conf_x_y"] == 0.75 and ab["conf_y_x"] == 0.75
    assert ab["lift"] == round(3 * 5 / (4 * 4), 6)
    bc = got[("b", "c")]
    assert bc["c_xy"] == 2 and bc["conf_y_x"] == 1.0  # c -> b always


def test_cohort_retention_rejects_unsupported_bucket(spark):
    import pytest as _pytest

    from airflow_spark.operators.funnel import cohort_retention

    df = spark.createDataFrame([(1, __import__("datetime").datetime(2026, 1, 1))],
                               ["user_id", "ts"])
    with _pytest.raises(ValueError, match="day.*week"):
        cohort_retention(df, bucket="month")


def test_conversion_latency_repeat_buyer_still_converts(spark):
    import datetime as dt
    from airflow_spark.operators.funnel import conversion_latency

    t0 = dt.datetime(2024, 1, 1)

    def ts(d):
        return t0 + dt.timedelta(days=d)

    rows = [
        # user 1: purchase BEFORE first view, then one after -> converts
        (1, ts(2), "purchase"), (1, ts(5), "view"), (1, ts(10), "purchase"),
        # user 2: only a pre-view purchase -> viewed but not converted
        (2, ts(1), "purchase"), (2, ts(5), "view"),
        # user 3: never viewed -> not viewed, not converted
        (3, ts(1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["user_id"]: r for r in conversion_latency(df).collect()}
    assert out[1]["converted"] and out[1]["lat_s"] == 5 * 86400
    assert out[2]["viewed"] and not out[2]["converted"]
    assert not out[3]["viewed"] and not out[3]["converted"]


def test_kaplan_meier_matches_hand_computation(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # users 1-3 convert at 10s, 20s, 20s; user 4 never converts
    # (censored at the observation end = 100s)
    for u, lat in [(1, 10), (2, 20), (3, 20)]:
        rows.append((u * 10, base, u, "view"))
        rows.append((u * 10 + 1, base + dt.timedelta(seconds=lat), u, "purchase"))
    rows.append((40, base, 4, "view"))
    rows.append((41, base + dt.timedelta(seconds=100), 5, "click"))  # sets end
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    curve = {r["t_s"]: r for r in funnel.kaplan_meier(df).collect()}
    # subjects: users 1-4 (user 5 never viewed). At t=10: n=4, d=1 -> S=0.75
    assert curve[10.0]["n_risk"] == 4 and curve[10.0]["n_events"] == 1
    assert curve[10.0]["survival"] == 0.75
    # at t=20: n=3, d=2 -> S = 0.75 * (1 - 2/3) = 0.25
    assert curve[20.0]["n_risk"] == 3 and curve[20.0]["n_events"] == 2
    assert curve[20.0]["survival"] == 0.25
    # censored user 4 never produces a step
    assert set(curve) == {10.0, 20.0}


def test_audience_overlap_known_sets(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # A audience = {1,2,3}, B = {2,3,4} -> |A∩B|=2, |A∪B|=4 -> 0.5
    rows = [(i, base, u, "A") for i, u in enumerate([1, 2, 3])] + [
        (10 + i, base, u, "B") for i, u in enumerate([2, 3, 4, 4])
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    r = funnel.audience_overlap(df).collect()[0]
    assert (r["t_a"], r["t_b"]) == ("A", "B")
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["n_both"] == 2
    assert r["jaccard"] == 0.5


def test_power_user_concentration_8020(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # user 1 fires 80 events, users 2..21 fire 1 each -> 80% of events
    # come from 1 of 21 users
    rows = [(i, base, 1, "x") for i in range(80)] + [
        (100 + u, base, u, "x") for u in range(2, 22)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {r["share_of_events"]: r for r in
           funnel.power_user_concentration(df, thresholds=(0.5, 0.8)).collect()}
    assert got[0.8]["n_top_users"] == 1
    assert got[0.8]["user_share"] == round(1 / 21, 6)
    assert got[0.5]["n_top_users"] == 1
