"""Hypothesis property tests for driver-side logic (no Spark session —
these run in milliseconds and pin the invariants the engine relies on).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from airflow_spark.oracle import value_hash
from airflow_spark.pipeline.scheduler import cron_matches, next_fire
from airflow_spark.sources.lists import delimited_list

UTC = dt.timezone.utc


@given(
    minute=st.integers(0, 59),
    hour=st.integers(0, 23),
    start=st.datetimes(
        min_value=dt.datetime(2025, 1, 1),
        max_value=dt.datetime(2026, 12, 1),
    ),
)
@settings(max_examples=50, deadline=None)
def test_next_fire_matches_and_advances(minute, hour, start):
    expr = f"{minute} {hour} * * *"
    start = start.replace(tzinfo=UTC)
    fire = next_fire(expr, start)
    assert fire > start
    assert cron_matches(expr, fire)
    assert fire.minute == minute and fire.hour == hour


@given(step=st.integers(1, 30), start=st.datetimes(
    min_value=dt.datetime(2026, 1, 1), max_value=dt.datetime(2026, 1, 2)
))
@settings(max_examples=50, deadline=None)
def test_step_schedule_interval(step, start):
    expr = f"*/{step} * * * *"
    start = start.replace(tzinfo=UTC)
    f1 = next_fire(expr, start)
    f2 = next_fire(expr, f1)
    # consecutive fires within an hour are exactly `step` apart (modulo
    # the top-of-hour reset)
    delta = (f2 - f1).total_seconds() / 60
    assert delta == step or (f2.minute == 0 and delta == 60 - (60 // step) * step + step) or f2.minute < f1.minute


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="|", blacklist_categories=("Cs",)),
    min_size=1).map(str.strip).filter(bool), max_size=10))
@settings(max_examples=100, deadline=None)
def test_delimited_list_roundtrip(items):
    assert delimited_list("|".join(items)) == items


@given(
    st.lists(
        st.tuples(st.integers(-10**6, 10**6), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_value_hash_order_insensitive(rows):
    cols = ["a", "b"]
    h1 = value_hash(cols, rows)
    h2 = value_hash(cols, list(reversed(rows)))
    # column order insensitivity too
    h3 = value_hash(["b", "a"], [(b, a) for a, b in rows])
    assert h1 == h2 == h3
