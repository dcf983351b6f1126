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


def test_snapshot_diff_requires_cols(spark):
    old, new = _snapshots(spark)
    with pytest.raises(ValueError):
        versioning.snapshot_diff(old, new, [], ["text"])
    with pytest.raises(ValueError):
        versioning.snapshot_diff(old, new, ["doc_id"], [])
