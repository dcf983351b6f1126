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


@settings(max_examples=15, deadline=None)
@given(
    hist_keys=st.lists(st.integers(0, 30), min_size=0, max_size=40),
    new_keys=st.lists(st.integers(0, 30), min_size=1, max_size=30),
    fpp=st.sampled_from([0.3, 0.01]),
)
def test_bloom_dedup_always_equals_plain_anti_join(spark, hist_keys, new_keys, fpp):
    """The bloom filter is pruning only: for ANY inputs and ANY fpp
    (even an undersized filter full of false positives) the result
    must equal the plain anti-join + min-id-per-key dedup."""
    from airflow_spark.operators.dedup import bloom_dedup_new

    hist = spark.createDataFrame(
        [(i, f"k{k}") for i, k in enumerate(hist_keys)] or [(0, "__none__")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(100 + i, f"k{k}") for i, k in enumerate(new_keys)], ["doc_id", "text"]
    )
    got = sorted(
        r["doc_id"]
        for r in bloom_dedup_new(
            new, hist, "text", expected_items=max(1, len(hist_keys)), fpp=fpp
        ).collect()
    )
    hist_set = {f"k{k}" for k in hist_keys} if hist_keys else {"__none__"}
    first_per_key = {}
    for i, k in enumerate(new_keys):
        first_per_key.setdefault(f"k{k}", 100 + i)
    want = sorted(
        v for k, v in first_per_key.items() if k not in hist_set
    )
    assert got == want
