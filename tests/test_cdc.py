"""Tests for CDC apply-changes (batch operator + streaming fold)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from airflow_spark.operators import versioning
from airflow_spark.streaming import cdc


def _history(spark):
    return spark.createDataFrame(
        [
            Row(k=1, v="a", valid_from="2026-01-01", valid_to=None, is_current=True),
            Row(k=2, v="b", valid_from="2026-01-01", valid_to=None, is_current=True),
            Row(k=3, v="c", valid_from="2026-01-01", valid_to=None, is_current=True),
        ],
        schema="k bigint, v string, valid_from string, valid_to string, "
        "is_current boolean",
    ).selectExpr(
        "k", "v", "cast(valid_from as timestamp) valid_from",
        "cast(valid_to as timestamp) valid_to", "is_current"
    )


def test_apply_changes_partial_feed(spark):
    history = _history(spark)
    changes = spark.createDataFrame(
        [
            Row(k=2, v="B", is_del=False),   # change
            Row(k=4, v="d", is_del=False),   # add
            Row(k=3, v=None, is_del=True),   # delete
            Row(k=9, v="x", is_del=True),    # delete of unknown key: no-op
        ],
        schema="k bigint, v string, is_del boolean",
    )
    out = versioning.scd2_apply_changes(
        history, changes, ["k"], ["v"], "2026-02-01 00:00:00", delete_col="is_del"
    )
    rows = sorted(
        (r["k"], r["v"], str(r["valid_to"]), r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        (1, "a", "None", True),                       # untouched key stays open
        (2, "B", "None", True),                       # new version
        (2, "b", "2026-02-01 00:00:00", False),       # closed old version
        (3, "c", "2026-02-01 00:00:00", False),       # deleted: closed, no reopen
        (4, "d", "None", True),                       # added
    ]


def test_apply_changes_idempotent(spark):
    history = _history(spark)
    changes = spark.createDataFrame([Row(k=2, v="B")], schema="k bigint, v string")
    once = versioning.scd2_apply_changes(
        history, changes, ["k"], ["v"], "2026-02-01 00:00:00"
    )
    twice = versioning.scd2_apply_changes(
        once, changes, ["k"], ["v"], "2026-03-01 00:00:00"
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_latest_per_key(spark):
    changes = spark.createDataFrame(
        [Row(k=1, v="old", seq=1), Row(k=1, v="new", seq=2), Row(k=2, v="x", seq=1)]
    )
    got = {r["k"]: r["v"] for r in cdc.latest_per_key(changes, ["k"], "seq").collect()}
    assert got == {1: "new", 2: "x"}


def test_scd2_stream_folds_batches(spark, tmp_path):
    """Two change files drained availableNow → history reflects both
    (file source delivers them; latest-wins dedup inside each batch)."""
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = "k bigint, v string, seq bigint, is_del boolean"
    b1 = spark.createDataFrame(
        [Row(k=1, v="a", seq=1, is_del=False),
         Row(k=1, v="a2", seq=2, is_del=False),   # same batch: latest wins
         Row(k=2, v="b", seq=1, is_del=False)],
        schema=schema,
    )
    b1.coalesce(1).write.mode("append").parquet(str(feed_dir))
    b2 = spark.createDataFrame(
        [Row(k=2, v=None, seq=3, is_del=True),    # delete k=2
         Row(k=3, v="c", seq=3, is_del=False)],   # add k=3
        schema=schema,
    )
    hist_base = str(tmp_path / "hist")

    stream = spark.readStream.schema(schema).parquet(str(feed_dir))
    ok = cdc.scd2_stream(
        stream, hist_base, ["k"], ["v"], "seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
        run_ts_of_batch=lambda i: f"2026-02-0{i + 1} 00:00:00",
        delete_col="is_del",
    )
    assert ok
    b2.coalesce(1).write.mode("append").parquet(str(feed_dir))
    stream = spark.readStream.schema(schema).parquet(str(feed_dir))
    ok = cdc.scd2_stream(
        stream, hist_base, ["k"], ["v"], "seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
        run_ts_of_batch=lambda i: f"2026-02-0{i + 1} 00:00:00",
        delete_col="is_del",
    )
    assert ok

    final = spark.read.parquet(cdc.current_history_path(hist_base))
    cur = {r["k"]: r["v"] for r in final.where(F.col("is_current")).collect()}
    assert cur == {1: "a2", 3: "c"}          # k=2 deleted, k=1 latest-wins
    closed = final.where(~F.col("is_current")).count()
    assert closed == 1                        # the closed k=2 row


def test_history_version_dirs_sort_numerically(tmp_path):
    """'v10' must come after 'v9' — lexicographic sorting would freeze
    the history at v9 forever."""
    from airflow_spark.streaming.cdc import current_history_path

    base = tmp_path / "hist"
    base.mkdir()
    for v in ("v0", "v9", "v10", "v2"):
        (base / v).mkdir()
    assert current_history_path(str(base)).endswith("v10")


def test_time_travel_by_version_and_timestamp(spark, tmp_path):
    """read_version reads any retained vN untouched by later swaps;
    snapshot_asof reconstructs the table at an instant from the SCD2
    validity intervals."""
    hist_base = str(tmp_path / "hist_tt")
    schema = "k bigint, v string, seq bigint"
    b1 = spark.createDataFrame(
        [Row(k=1, v="a", seq=1), Row(k=2, v="b", seq=1)], schema=schema
    )
    cdc.apply_changes_batch(
        spark, b1, hist_base, ["k"], ["v"], "seq", "2026-03-01 00:00:00"
    )
    b2 = spark.createDataFrame([Row(k=1, v="a2", seq=2)], schema=schema)
    cdc.apply_changes_batch(
        spark, b2, hist_base, ["k"], ["v"], "seq", "2026-03-02 00:00:00"
    )

    assert cdc.versions(hist_base) == [0, 1]
    v0 = {r["k"]: r["v"] for r in cdc.read_version(spark, hist_base, 0).collect()}
    assert v0 == {1: "a", 2: "b"}
    latest = cdc.read_version(spark, hist_base)
    assert latest.where(F.col("is_current")).count() == 2  # k1 v2 + k2

    # as-of between the two runs: k=1 still shows "a"
    asof = {
        r["k"]: r["v"]
        for r in cdc.snapshot_asof(latest, "2026-03-01 12:00:00").collect()
    }
    assert asof == {1: "a", 2: "b"}
    # as-of after the second run: k=1 flipped to "a2"
    asof2 = {
        r["k"]: r["v"]
        for r in cdc.snapshot_asof(latest, "2026-03-02 12:00:00").collect()
    }
    assert asof2 == {1: "a2", 2: "b"}
    # before everything: empty table
    assert cdc.snapshot_asof(latest, "2026-02-01 00:00:00").count() == 0

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cdc.read_version(spark, hist_base, 7)
