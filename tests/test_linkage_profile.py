"""Tests for fuzzy linkage, semi-join reduction, and the column profiler."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from airflow_spark.operators import linkage, profile, relational


# ---------------------------------------------------------------- linkage

WORDS = [
    "red widget", "red widgets", "rad widget",  # within d=2 of each other
    "blue bolt", "blue bolts",                   # d=1 pair
    "hot gear",                                  # d=2 of nothing here
    "completely different",
]


def test_delete_variants_d1(spark):
    df = spark.createDataFrame([Row(s="abc")])
    got = sorted(df.select(linkage.delete_variants("s", 1).alias("v")).first()["v"])
    assert got == ["ab", "abc", "ac", "bc"]


def test_delete_variants_d2_includes_double_deletes(spark):
    df = spark.createDataFrame([Row(s="abcd")])
    got = set(df.select(linkage.delete_variants("s", 2).alias("v")).first()["v"])
    assert {"abcd", "abc", "ab", "cd", "ad", "bc"} <= got


def _brute_pairs(words, d):
    import itertools

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1,
                    m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    return sorted(
        (min(a, b), max(a, b), lev(a, b))
        for a, b in itertools.combinations(words, 2)
        if lev(a, b) <= d
    )


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_self_pairs_match_brute_force(spark, d):
    df = spark.createDataFrame([Row(name=w) for w in WORDS])
    got = sorted(
        (r["name_a"], r["name_b"], r["distance"])
        for r in linkage.fuzzy_self_pairs(df, "name", max_distance=d).collect()
    )
    assert got == _brute_pairs(WORDS, d)


def test_fuzzy_join_cross_frames(spark):
    left = spark.createDataFrame([Row(a="red widget")])
    right = spark.createDataFrame([Row(b=w) for w in WORDS])
    got = sorted(r["name_b"] for r in
                 linkage.fuzzy_join(left, right, "a", "b", 2).collect())
    assert got == ["rad widget", "red widget", "red widgets"]


def test_fuzzy_join_excludes_overlong_values(spark):
    df = spark.createDataFrame(
        [Row(name="red widget"), Row(name="red widgets"), Row(name="x" * 500)]
    )
    got = linkage.fuzzy_self_pairs(df, "name", max_distance=2).collect()
    # the 500-char blob is excluded (O(len^2) guard), the real pair found
    assert [(r["name_a"], r["name_b"]) for r in got] == [("red widget", "red widgets")]


def test_fuzzy_join_no_cartesian_plan(spark):
    df = spark.createDataFrame([Row(name=w) for w in WORDS])
    plan = (
        linkage.fuzzy_self_pairs(df, "name", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    words=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=8),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=5, deadline=None)
def test_fuzzy_self_pairs_property(spark, words):
    """Delete-variant blocking finds EXACTLY the brute-force pair set on
    adversarial near-collision strings (tiny alphabet, empties, spaces)."""
    df = spark.createDataFrame([Row(name=w) for w in words],
                               schema="name string")
    got = sorted(
        (r["name_a"], r["name_b"], r["distance"])
        for r in linkage.fuzzy_self_pairs(df, "name", max_distance=2).collect()
    )
    assert got == _brute_pairs(words, 2)


# ---------------------------------------------------------- reduced_join

def test_reduced_join_equals_plain_inner(spark, sf_smoke):
    from airflow_spark.catalog import load_tables

    t = load_tables(spark, sf_smoke)
    dim = t.customer.where(F.col("c_acctbal") > 5000).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    got = relational.reduced_join(t.orders, dim, on=["o_custkey"])
    want = t.orders.join(dim, on=["o_custkey"], how="inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_reduced_join_plan_has_broadcast_semi(spark, sf_smoke):
    from airflow_spark.catalog import load_tables

    t = load_tables(spark, sf_smoke)
    dim = t.customer.withColumnRenamed("c_custkey", "o_custkey")
    plan = (
        relational.reduced_join(t.orders, dim, on=["o_custkey"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_reduced_join_rejects_outer(spark, sf_smoke):
    from airflow_spark.catalog import load_tables

    t = load_tables(spark, sf_smoke)
    with pytest.raises(ValueError):
        relational.reduced_join(
            t.orders, t.customer, on=["o_custkey"], how="left_outer"
        )


# -------------------------------------------------------------- profiler

def test_profile_columns(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b=None), Row(a=2, b="y")],
        schema="a bigint, b string",
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"],
                        r["min_val"], r["max_val"])
        for r in profile.profile_columns(df, ["a", "b"]).collect()
    }
    assert got["a"] == (3, 0, 2, "1", "2")
    assert got["b"] == (3, 1, 2, "x", "y")


def test_profile_columns_approx_mode(spark):
    df = spark.createDataFrame([Row(a=i % 10) for i in range(100)])
    row = profile.profile_columns(df, ["a"], approx=True).first()
    assert abs(row["n_distinct"] - 10) <= 1


def test_profile_requires_cols(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError):
        profile.profile_columns(df, [])
