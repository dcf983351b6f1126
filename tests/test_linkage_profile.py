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


# ---------------------------------------------------------------------------
# gini_by_group / rfm_segments / pareto_front / char_entropy_col
# ---------------------------------------------------------------------------


def test_gini_equal_values_is_zero(spark):
    from airflow_spark.operators.inference import gini_by_group

    df = spark.createDataFrame(
        [("g", 100, i) for i in range(8)], "grp string, v long, id long"
    )
    row = gini_by_group(df, "grp", "v", "id").collect()[0]
    assert row["gini"] == 0.0
    assert row["n"] == 8 and row["total"] == 800


def test_gini_single_holder_matches_closed_form(spark):
    from airflow_spark.operators.inference import gini_by_group

    # one member owns everything: G = (n-1)/n exactly
    n = 5
    rows = [("g", 0, i) for i in range(n - 1)] + [("g", 1000, n - 1)]
    df = spark.createDataFrame(rows, "grp string, v long, id long")
    row = gini_by_group(df, "grp", "v", "id").collect()[0]
    assert row["gini"] == round((n - 1) / n, 6)


def test_pareto_front_keeps_exactly_nondominated(spark):
    from airflow_spark.operators.profile import pareto_front

    # (price, size): frontier = (10,1), (8,0); (10,3) dominated by
    # equal-price (10,1); (9,2) dominated by (10,1); duplicate optimal
    # vectors (8,0)x2 are mutually non-dominating -> both kept
    rows = [
        ("b", 1, 10.0, 1),
        ("b", 2, 10.0, 3),
        ("b", 3, 9.0, 2),
        ("b", 4, 8.0, 0),
        ("b", 5, 8.0, 0),
    ]
    df = spark.createDataFrame(
        rows, "p_brand string, p_partkey long, p_retailprice double, p_size long"
    )
    got = sorted(
        r["p_partkey"]
        for r in pareto_front(df, "p_brand", "p_retailprice", "p_size").collect()
    )
    assert got == [1, 4, 5]


def test_rfm_best_customer_lands_in_111(spark):
    from airflow_spark.operators.profile import rfm_segments
    import datetime as dt

    d = dt.date(2024, 1, 1)
    rows = []
    # customer 0: most recent, most frequent, biggest spend
    for i in range(8):
        rows.append((0, d + dt.timedelta(days=20 + i), 1000.0))
    # customers 1..7: one stale small order each, staggered
    for c in range(1, 8):
        rows.append((c, d + dt.timedelta(days=c), 10.0 * c))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    seg = {r["segment"]: r for r in rfm_segments(df).collect()}
    assert "111" in seg and seg["111"]["n_customers"] == 1
    assert seg["111"]["total_cents"] == 8 * 100000
    assert sum(r["n_customers"] for r in seg.values()) == 8


def test_char_entropy_degenerate_and_uniform(spark):
    from airflow_spark.operators.text import char_entropy_col

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "AbAb!! 77"), (3, "....")],
        "doc_id long, text string",
    )
    n, ent = char_entropy_col("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", n.alias("n"), F.round(ent, 6).alias("e")
        ).collect()
    }
    assert out[1]["n"] == 4 and out[1]["e"] == 0.0   # one symbol: 0 bits
    assert out[2]["n"] == 4 and out[2]["e"] == 1.0   # 2 equiprobable: 1 bit
    assert out[3]["n"] == 0                           # no letters at all


def test_rfm_rejects_multi_digit_tiles(spark):
    from airflow_spark.operators.profile import rfm_segments
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 10.0)],
        "o_custkey long, o_orderdate date, o_totalprice double",
    )
    with pytest.raises(ValueError, match="2..9"):
        rfm_segments(df, n_tiles=11)


def test_gini_counts_zero_value_members(spark):
    from airflow_spark.operators.inference import gini_by_group

    # two equal holders alone: G=0; adding two zero-revenue members
    # raises concentration to exactly 0.5
    rows = [("g", 500, 1), ("g", 500, 2), ("g", 0, 3), ("g", 0, 4)]
    df = spark.createDataFrame(rows, "grp string, v long, id long")
    row = gini_by_group(df, "grp", "v", "id").collect()[0]
    assert row["gini"] == 0.5
    # an all-zero group is NULL (undefined), not a divide error
    z = spark.createDataFrame(
        [("z", 0, 1), ("z", 0, 2)], "grp string, v long, id long"
    )
    assert gini_by_group(z, "grp", "v", "id").collect()[0]["gini"] is None


def test_histogram_conserves_rows_and_bounds(spark, sf_smoke):
    from airflow_spark.operators.registry import op_histogram
    from airflow_spark.catalog import load_tables

    out = op_histogram(spark, sf_smoke).collect()
    li = load_tables(spark, sf_smoke).lineitem
    assert sum(r["cnt"] for r in out) == li.count()
    assert all(0 <= r["bin_idx"] <= 19 for r in out)
    lo = li.agg(F.min("l_extendedprice")).collect()[0][0]
    first = min(out, key=lambda r: r["bin_idx"])
    assert first["bin_idx"] == 0 and abs(first["lo"] - round(lo, 4)) < 1e-9


def test_transition_probs_rows_normalize(spark, sf_smoke):
    from airflow_spark.operators.registry import op_transition_probs

    out = op_transition_probs(spark, sf_smoke).collect()
    by_prev = {}
    for r in out:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rows in by_prev.items():
        assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-4, prev
        assert all(r["n"] > 0 for r in rows)


def test_ks_test_stat_bounds_and_counts(spark, sf_smoke):
    from airflow_spark.operators.registry import op_ks_test
    from airflow_spark.catalog import load_tables

    row = op_ks_test(spark, sf_smoke).collect()[0]
    ev = load_tables(spark, sf_smoke).events
    assert row["n_a"] + row["n_b"] == ev.count()
    assert 0.0 <= row["d_stat"] <= 1.0


def test_theil_zero_for_equal_and_positive_for_skewed(spark):
    import math
    from airflow_spark.operators.inference import theil_by_group

    eq = spark.createDataFrame(
        [("g", 100)] * 6, "grp string, v long"
    )
    assert theil_by_group(eq, "grp", "v").collect()[0]["theil"] == 0.0
    # one member holds 10x the rest: closed form over shares
    rows = [("g", 10)] * 4 + [("g", 100)]
    sk = spark.createDataFrame(rows, "grp string, v long")
    got = theil_by_group(sk, "grp", "v").collect()[0]["theil"]
    xs = [10.0] * 4 + [100.0]
    mu = sum(xs) / len(xs)
    want = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    assert abs(got - round(want, 6)) < 1e-6


def test_group_entropy_uniform_and_degenerate(spark):
    rows = (
        [(1, c) for c in ["a", "b", "c", "d"]]   # uniform over 4 -> 2 bits
        + [(2, "a")] * 5                           # single category -> 0
        + [(3, "a"), (3, "a"), (3, "b")]           # skewed 2-type
    )
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    got = {
        r["user_id"]: r
        for r in profile.group_entropy(df, "user_id", "event_type").collect()
    }
    assert got[1]["entropy_bits"] == pytest.approx(2.0, abs=1e-6)
    assert got[1]["entropy_norm"] == pytest.approx(1.0, abs=1e-6)
    assert got[2]["entropy_bits"] == 0.0 and got[2]["entropy_norm"] == 0.0
    import math as _m
    h = -(2 / 3) * _m.log2(2 / 3) - (1 / 3) * _m.log2(1 / 3)
    assert got[3]["entropy_bits"] == pytest.approx(h, abs=1e-5)
    assert got[3]["n_events"] == 3 and got[3]["n_types"] == 2


def test_sorted_neighborhood_finds_adjacent_near_misses(spark):
    names = ["widget a", "widget b", "widget c", "zzz totally else"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    out = {
        (r["name_a"], r["name_b"]): r["distance"]
        for r in linkage.sorted_neighborhood_pairs(
            df, "name", window=3, max_distance=3
        ).collect()
    }
    assert out[("widget a", "widget b")] == 1
    assert out[("widget a", "widget c")] == 1
    # the far string never pairs (distance > 3), and no self-pairs leak
    # from the frame edge where lead() is NULL
    assert all(a != b for a, b in out)
    assert not any("zzz" in a or "zzz" in b for a, b in out)
