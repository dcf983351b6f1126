"""Tests for corpus snapshot-diff operators (operators/versioning.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from airflow_spark.operators import versioning


def _snapshots(spark):
    old = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha", n=5),
            Row(doc_id=2, text="beta", n=4),
            Row(doc_id=3, text="gamma", n=5),
            Row(doc_id=4, text=None, n=0),
            Row(doc_id=5, text="eps", n=3),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha", n=5),  # unchanged
            Row(doc_id=2, text="BETA", n=4),  # changed (text)
            Row(doc_id=3, text="gamma", n=6),  # changed (n)
            Row(doc_id=4, text="", n=0),  # changed (null -> empty string)
            Row(doc_id=6, text="zeta", n=4),  # added; 5 removed
        ]
    )
    return old, new


def test_snapshot_diff_statuses(spark):
    old, new = _snapshots(spark)
    diff = versioning.snapshot_diff(
        old, new, key_cols=["doc_id"], compare_cols=["text", "n"]
    )
    got = {r["doc_id"]: r["status"] for r in diff.collect()}
    assert got == {
        2: "changed",
        3: "changed",
        4: "changed",
        5: "removed",
        6: "added",
    }


def test_snapshot_diff_include_unchanged_and_summary(spark):
    old, new = _snapshots(spark)
    diff = versioning.snapshot_diff(
        old, new, key_cols=["doc_id"], compare_cols=["text", "n"],
        include_unchanged=True,
    )
    assert diff.where(F.col("status") == "unchanged").count() == 1
    summary = {r["status"]: r["n"] for r in versioning.diff_summary(diff).collect()}
    assert summary == {"added": 1, "changed": 3, "removed": 1, "unchanged": 1}


def test_snapshot_diff_null_vs_empty_distinct(spark):
    # the null sentinel must not collide with the empty string
    old = spark.createDataFrame([Row(k=1, v=None)], schema="k bigint, v string")
    new = spark.createDataFrame(
        [Row(k=1, v="")], schema="k bigint, v string"
    )
    diff = versioning.snapshot_diff(old, new, ["k"], ["v"])
    assert [r["status"] for r in diff.collect()] == ["changed"]


def _history(spark):
    return spark.createDataFrame(
        [
            # k=1: one closed v0 + open v1 (will be unchanged)
            Row(k=1, v="a-v0", valid_from="2025-01-01", valid_to="2026-01-01",
                is_current=False),
            Row(k=1, v="a", valid_from="2026-01-01", valid_to=None,
                is_current=True),
            # k=2: open, will change
            Row(k=2, v="b", valid_from="2026-01-01", valid_to=None,
                is_current=True),
            # k=3: open, will be removed
            Row(k=3, v="c", valid_from="2026-01-01", valid_to=None,
                is_current=True),
        ],
        schema="k bigint, v string, valid_from string, valid_to string, "
        "is_current boolean",
    ).selectExpr(
        "k", "v", "cast(valid_from as timestamp) valid_from",
        "cast(valid_to as timestamp) valid_to", "is_current"
    )


def test_scd2_merge(spark):
    history = _history(spark)
    snap = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
    )
    out = versioning.scd2_merge(
        history, snap, ["k"], ["v"], run_ts="2026-02-01 00:00:00"
    ).orderBy("k", "valid_from")
    rows = [
        (r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in out.collect()
    ]
    assert rows == [
        (1, "a-v0", "2025-01-01 00:00:00", "2026-01-01 00:00:00", False),
        (1, "a", "2026-01-01 00:00:00", "None", True),  # unchanged, stays open
        (2, "b", "2026-01-01 00:00:00", "2026-02-01 00:00:00", False),  # closed
        (2, "B", "2026-02-01 00:00:00", "None", True),  # new version
        (3, "c", "2026-01-01 00:00:00", "2026-02-01 00:00:00", False),  # removed
        (4, "d", "2026-02-01 00:00:00", "None", True),  # added
    ]


def test_scd2_merge_idempotent_when_snapshot_unchanged(spark):
    """Re-merging the same snapshot must be a no-op on the history."""
    history = _history(spark)
    snap = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")])
    once = versioning.scd2_merge(history, snap, ["k"], ["v"], "2026-02-01 00:00:00")
    twice = versioning.scd2_merge(once, snap, ["k"], ["v"], "2026-03-01 00:00:00")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_single_join_plan(spark):
    """The merge must be ONE join over the current partition — no branch
    re-execution (the 3 output kinds come from one array+explode)."""
    history = _history(spark)
    snap = spark.createDataFrame([Row(k=2, v="B")])
    out = versioning.scd2_merge(history, snap, ["k"], ["v"], "2026-02-01 00:00:00")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1


def test_snapshot_diff_requires_cols(spark):
    old, new = _snapshots(spark)
    with pytest.raises(ValueError):
        versioning.snapshot_diff(old, new, [], ["text"])
    with pytest.raises(ValueError):
        versioning.snapshot_diff(old, new, ["doc_id"], [])


def test_snapshot_diff_null_keys_match_null_safe(spark):
    """A NULL-keyed row unchanged across snapshots must NOT appear as
    a phantom removed+added pair (null-safe key join)."""
    from airflow_spark.operators.versioning import snapshot_diff

    old = spark.createDataFrame(
        [(None, "x"), (1, "a")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "x"), (1, "b")], "k int, v string"
    )
    got = {(r["k"], r["status"]) for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {(1, "changed")}  # the NULL key row is unchanged
