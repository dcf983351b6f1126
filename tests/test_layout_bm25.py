"""Tests for BM25 search, quantile binning, and Z-order layout."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from airflow_spark.operators import layout
from airflow_spark.operators.curation import bm25_keyword_search, quantile_bins


# ------------------------------------------------------------------ BM25

DOCS = [
    Row(doc_id=1, text="spark spark spark"),          # high tf, short
    Row(doc_id=2, text="spark " + "filler " * 50),    # same-ish tf, long
    Row(doc_id=3, text="spark join"),                  # two query terms
    Row(doc_id=4, text="nothing relevant here"),
]


def test_bm25_ranks_and_length_normalizes(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["id"]: r["score"] for r in
           bm25_keyword_search(df, ["spark", "join"], k=10).collect()}
    assert 4 not in got                       # no query term -> no row
    assert got[3] > got[2]                    # two terms beat one diluted term
    assert got[1] > got[2]                    # length normalization: short doc
    # with repeated term beats one occurrence in a 51-token doc
    assert all(s > 0 for s in got.values())   # Lucene idf is non-negative


def test_bm25_saturates_term_frequency(spark):
    # unlike raw TF-IDF, tf saturation keeps a 100x-repeated term from
    # scoring ~100x a single occurrence (k1 bounds the multiplier)
    df = spark.createDataFrame(
        [Row(doc_id=1, text="spark"), Row(doc_id=2, text=" ".join(["spark"] * 100))]
    )
    got = {r["id"]: r["score"] for r in
           bm25_keyword_search(df, ["spark"], k=10).collect()}
    assert got[2] < got[1] * (1.2 + 1)  # hard bound: tf factor < k1+1


# --------------------------------------------------------- quantile bins

def test_quantile_bins_quarters(spark):
    df = spark.createDataFrame([Row(v=float(i)) for i in range(1, 101)])
    rows = {r["bucket"]: (r["n"], r["lo"], r["hi"])
            for r in quantile_bins(df, "v").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert sum(n for n, _, _ in rows.values()) == 100
    # quartiles of 1..100: each bucket holds ~25 values in order
    assert rows[1][1] == 1.0 and rows[4][2] == 100.0
    assert all(abs(n - 25) <= 1 for n, _, _ in rows.values())


# --------------------------------------------------------------- zorder

def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([Row(x=3, y=5)])  # x=0b011, y=0b101
    z = df.select(layout.zorder_value(["x", "y"], bits=3).alias("z")).first()["z"]
    # interleave: bit i of x -> 2i, bit i of y -> 2i+1
    # x bits (1,1,0) -> positions 0,2 ; y bits (1,0,1) -> positions 1,5
    assert z == (1 << 0) | (1 << 2) | (1 << 1) | (1 << 5)


def test_zorder_value_validates(spark):
    with pytest.raises(ValueError):
        layout.zorder_value(["x"], bits=8)
    with pytest.raises(ValueError):
        layout.zorder_value(["a", "b", "c", "d"], bits=16)


def test_write_zordered_roundtrip_and_clustering(spark, tmp_path):
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    path = str(tmp_path / "z")
    layout.write_zordered(df, ["x", "y"], path, bits=5, num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # clustering property: each file's x-range and y-range must both be
    # narrower than the full domain (a single-column sort would leave
    # the other column's per-file range at full width)
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) > 1
    assert all(r["xs"] < 31 or r["ys"] < 31 for r in spans)
