"""Scale-layout tests: bucketed joins eliminate the shuffle (asserted
on the physical plan), salted joins/collects match unsalted semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_spark.operators import bucketing, skew
from airflow_spark.plans import audit_plan


@pytest.fixture(scope="module")
def warehouse_session(spark, tmp_path_factory):
    # the shared session already has a warehouse dir configured by
    # Spark defaults (spark-warehouse under cwd is not writable-safe);
    # use a database namespace under /tmp via location-less managed
    # tables — acceptable for the plan-shape test.
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_test")
    yield spark
    spark.sql("DROP DATABASE IF EXISTS bucketing_test CASCADE")


def test_bucketed_join_has_no_shuffle(warehouse_session, sf_smoke):
    spark = warehouse_session
    from airflow_spark.catalog import load_tables

    t = load_tables(spark, sf_smoke)
    bucketing.write_bucketed(
        t.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        "bucketing_test.orders_b", "o_custkey", num_buckets=8,
    )
    bucketing.write_bucketed(
        t.customer.select("c_custkey", "c_name").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        "bucketing_test.customer_b", "o_custkey", num_buckets=8,
    )
    joined = bucketing.colocated_join(
        spark, "bucketing_test.orders_b", "bucketing_test.customer_b", "o_custkey"
    )
    a = audit_plan(joined, execute=True)
    assert a["n_shuffles"] == 0, a["plan"]  # co-located: no Exchange
    # sanity: result matches the plain join
    plain = t.orders.join(
        t.customer, t.orders.o_custkey == t.customer.c_custkey
    ).count()
    assert joined.count() == plain


def test_bucketed_groupby_has_no_shuffle(warehouse_session):
    spark = warehouse_session
    agg = (
        spark.table("bucketing_test.orders_b")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    a = audit_plan(agg, execute=True)
    assert a["n_shuffles"] == 0, a["plan"]


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 2)],
        ["k", "v"],
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "name"])
    salted = skew.salted_join(big, small, "k", num_salts=4)
    plain = big.join(small, "k")
    assert salted.count() == plain.count() == 52
    assert (
        salted.groupBy("k").count().orderBy("k").collect()
        == plain.groupBy("k").count().orderBy("k").collect()
    )


def test_salted_collect_matches_plain(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", 1), ("b", 1)], ["k", "v"]
    )
    out = {
        r["k"]: sorted(r["values"])
        for r in skew.salted_collect(df, "k", "v", num_salts=8).collect()
    }
    assert out["a"] == list(range(100))
    assert out["b"] == [1, 1]
    out_set = {
        r["k"]: sorted(r["values"])
        for r in skew.salted_collect(df, "k", "v", num_salts=8, as_set=True).collect()
    }
    assert out_set["b"] == [1]


def test_salted_join_rejects_unsupported_how(spark):
    # right/full/semi/anti would duplicate (or silently drop) the
    # salt-replicated small side — must be an explicit error
    big = spark.createDataFrame([("a", 1)], ["k", "v"])
    small = spark.createDataFrame([("a", "x")], ["k", "name"])
    for how in ("right", "full", "left_semi", "left_anti", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(big, small, "k", num_salts=4, how=how)
