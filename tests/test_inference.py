"""Unit tests for the statistical-inference and run-length operators
(operators/inference.py + timeseries.merge_intervals/state_durations).

The registry entries are oracle-hashed in test_oracle_queries; these
tests pin the operator semantics on hand-built frames where the
expected values are computable by eye.
"""

from __future__ import annotations

import datetime as dt

import pytest

from airflow_spark.operators import inference, timeseries


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


# ---------------------------------------------------------------------------
# merge_intervals
# ---------------------------------------------------------------------------


def test_merge_intervals_merges_overlaps_and_splits_gaps(spark):
    # pad 60 s: events at 12:00:00 and 12:00:30 overlap; 12:10 is its
    # own island; an event inside an earlier long reach still merges
    rows = [
        (1, _ts(0, 0)),
        (1, _ts(0, 30)),
        (1, _ts(10, 0)),
        (2, _ts(0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    out = timeseries.merge_intervals(df, "user_id", "ts", pad_s=60).collect()
    u1 = [r for r in out if r.user_id == 1]
    assert [r.island_idx for r in u1] == [1, 2]
    first = u1[0]
    assert first.n_events == 2
    assert first.covered_s == 90  # 00:00 .. 01:30
    assert u1[1].covered_s == 60
    assert [r.n_events for r in out if r.user_id == 2] == [1]


def test_merge_intervals_touching_endpoints_merge(spark):
    # [0, 60) and [60, 120): start == prev end is NOT > pme → merges
    rows = [(1, _ts(0, 0)), (1, _ts(1, 0))]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    out = timeseries.merge_intervals(df, "user_id", "ts", pad_s=60).collect()
    assert len(out) == 1
    assert out[0].covered_s == 120


# ---------------------------------------------------------------------------
# state_durations
# ---------------------------------------------------------------------------


def test_state_durations_run_length_encoding(spark):
    rows = [
        (1, _ts(0), "a", 1),
        (1, _ts(1), "a", 2),
        (1, _ts(2), "b", 3),
        (1, _ts(3), "a", 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, event_type STRING, event_id INT"
    )
    out = timeseries.state_durations(
        df, "user_id", "ts", "event_type", order_cols=["event_id"]
    ).collect()
    assert [(r.run_idx, r.state, r.n_events, r.duration_s) for r in out] == [
        (1, "a", 2, 60),
        (2, "b", 1, 0),
        (3, "a", 1, 0),
    ]


def test_state_durations_breaks_ties_on_order_cols(spark):
    # same timestamp: event_id decides which state comes first
    rows = [(1, _ts(0), "b", 2), (1, _ts(0), "a", 1)]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, event_type STRING, event_id INT"
    )
    out = timeseries.state_durations(
        df, "user_id", "ts", "event_type", order_cols=["event_id"]
    ).collect()
    assert [r.state for r in out] == ["a", "b"]


# ---------------------------------------------------------------------------
# grouped_regression
# ---------------------------------------------------------------------------


def test_grouped_regression_recovers_exact_line(spark):
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(10)] + [
        ("flat", float(x), 5.0) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "k STRING, x DOUBLE, y DOUBLE")
    out = {
        r.k: r
        for r in inference.grouped_regression(df, "k", "x", "y").collect()
    }
    assert out["g"].n == 10
    assert out["g"].slope == pytest.approx(2.0, abs=1e-9)
    assert out["g"].intercept == pytest.approx(1.0, abs=1e-9)
    assert out["g"].r2 == pytest.approx(1.0, abs=1e-9)
    assert out["flat"].slope == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# chisq_report
# ---------------------------------------------------------------------------


def test_chisq_zero_for_independent_uniform(spark):
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    r = inference.chisq_report(df, "a", "b").collect()[0]
    assert r.n_cells == 4 and r.n_total == 20 and r.dof == 1
    assert r.chisq == pytest.approx(0.0, abs=1e-9)


def test_chisq_positive_for_dependent(spark):
    # perfect association: a==x ⇔ b==u
    rows = [("x", "u")] * 10 + [("y", "v")] * 10
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    r = inference.chisq_report(df, "a", "b").collect()[0]
    # 2×2 perfect association → χ² = n
    assert r.chisq == pytest.approx(20.0, abs=1e-6)


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_flags_planted_outlier_robustly(spark):
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "k STRING, value DOUBLE"
    )
    r = inference.mad_outliers(df, "k", "value", 3.0).collect()[0]
    assert r.n == 6
    assert r.med == pytest.approx(12.5)
    assert r.n_outliers == 1  # only the 1000; the MAD ignores it


def test_mad_zero_spread_group_has_no_outliers(spark):
    df = spark.createDataFrame(
        [("g", 7.0)] * 5, "k STRING, value DOUBLE"
    )
    r = inference.mad_outliers(df, "k", "value", 3.0).collect()[0]
    assert r.mad == 0.0 and r.n_outliers == 0


# ---------------------------------------------------------------------------
# benford_digits
# ---------------------------------------------------------------------------


def test_benford_digit_extraction_and_shares(spark):
    vals = [1.5, 19.0, 123.0, 2.0, 0.5, 900.0]  # 0.5 excluded
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    out = {r.digit: r for r in inference.benford_digits(df, "v").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1].n == 3 and out[2].n == 1 and out[9].n == 1
    assert out[1].share == pytest.approx(0.6)
    assert out[1].benford == pytest.approx(0.3010)
    assert out[9].benford == pytest.approx(0.0458)


# ---------------------------------------------------------------------------
# corr_matrix / two_proportion_ztest
# ---------------------------------------------------------------------------


def test_corr_matrix_exact_linear_and_anti(spark):
    rows = [(float(x), 2.0 * x, -3.0 * x + 7.0) for x in range(8)]
    df = spark.createDataFrame(rows, "a DOUBLE, b DOUBLE, c DOUBLE")
    out = {
        (r.col_a, r.col_b): r.corr_ab
        for r in inference.corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == pytest.approx(1.0)
    assert out[("a", "c")] == pytest.approx(-1.0)


def test_ztest_counts_and_sign(spark):
    # variant 0: 8/10 success; variant 1: 2/10
    rows = [(0, i < 8) for i in range(10)] + [(1, i < 2) for i in range(10)]
    df = spark.createDataFrame(rows, "v INT, s BOOLEAN")
    import pyspark.sql.functions as F

    r = inference.two_proportion_ztest(df, F.col("v"), F.col("s")).collect()[0]
    assert (r.n0, r.s0, r.n1, r.s1) == (10, 8, 10, 2)
    assert r.p0 == pytest.approx(0.8) and r.p1 == pytest.approx(0.2)
    assert r.z == pytest.approx(2.6833, abs=1e-3)


def test_ztest_degenerate_rate_yields_null_z(spark):
    import pyspark.sql.functions as F

    rows = [(0, True)] * 5 + [(1, True)] * 5  # pooled rate 1.0 → SE 0
    df = spark.createDataFrame(rows, "v INT, s BOOLEAN")
    r = inference.two_proportion_ztest(df, F.col("v"), F.col("s")).collect()[0]
    assert r.z is None


# ---------------------------------------------------------------------------
# sequence_gaps / abc_classification
# ---------------------------------------------------------------------------


def test_sequence_gaps_finds_ranges(spark):
    from airflow_spark.operators import profile

    ids = [1, 2, 3, 7, 8, 12]  # gaps: 4-6, 9-11
    df = spark.createDataFrame([(i,) for i in ids], "id BIGINT")
    out = profile.sequence_gaps(df, "id").collect()
    assert [(r.gap_start, r.gap_end, r.n_missing) for r in out] == [
        (4, 6, 3),
        (9, 11, 3),
    ]


def test_sequence_gaps_dense_sequence_is_empty(spark):
    from airflow_spark.operators import profile

    df = spark.createDataFrame([(i,) for i in range(5)], "id BIGINT")
    assert profile.sequence_gaps(df, "id").count() == 0


def test_abc_classification_cuts(spark):
    from airflow_spark.operators import profile

    # weights 80 / 15 / 5 → cumulative 0.80 A, 0.95 B, 1.00 C
    rows = [("a", 80.0), ("b", 15.0), ("c", 5.0)]
    df = spark.createDataFrame(rows, "k STRING, w DOUBLE")
    out = {r.k: r for r in profile.abc_classification(df, "k", "w").collect()}
    assert out["a"].abc_class == "A"
    assert out["b"].abc_class == "B"
    assert out["c"].abc_class == "C"
    assert out["c"].cum_share == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# downsample_minmax
# ---------------------------------------------------------------------------


def test_downsample_minmax_keeps_extremes_per_bucket(spark):
    # one key, 2 buckets over [0, 40) minutes: values spike at 12:05
    # (bucket 0) and dip at 12:30 (bucket 1)
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(5), 99.0),
        (1, _ts(10), 20.0),
        (1, _ts(25), 30.0),
        (1, _ts(30), 1.0),
        (1, _ts(40), 25.0),
    ]
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP, v DOUBLE")
    out = timeseries.downsample_minmax(df, "k", "ts", "v", n_buckets=2)
    got = {
        (r.bucket_idx, r.kind): r.value for r in out.collect()
    }
    assert got[(0, "max")] == 99.0
    assert got[(0, "min")] == 10.0
    assert got[(1, "min")] == 1.0
    assert got[(1, "max")] == 30.0  # 25.0 at the exact end lands in bucket 1


def test_downsample_single_point_bucket_emits_both_kinds(spark):
    df = spark.createDataFrame([(1, _ts(0), 5.0)], "k INT, ts TIMESTAMP, v DOUBLE")
    out = timeseries.downsample_minmax(df, "k", "ts", "v", n_buckets=4).collect()
    assert sorted(r.kind for r in out) == ["max", "min"]
    assert all(r.value == 5.0 for r in out)


def test_roc_auc_perfect_and_random(spark):
    # perfectly separated scores -> AUC 1.0
    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, ["score", "y"])
    r = inference.roc_auc(df, "score", "y").collect()[0]
    assert r["n_pos"] == 5 and r["n_neg"] == 5
    assert r["auc"] == 1.0
    # inverted labels -> AUC 0.0
    df2 = spark.createDataFrame([(s, 1 - y) for s, y in rows], ["score", "y"])
    assert inference.roc_auc(df2, "score", "y").collect()[0]["auc"] == 0.0


def test_roc_auc_ties_average_rank(spark):
    # all scores identical -> every ordering is a coin flip -> AUC 0.5
    rows = [(1.0, 1)] * 3 + [(1.0, 0)] * 7
    df = spark.createDataFrame(rows, ["score", "y"])
    assert inference.roc_auc(df, "score", "y").collect()[0]["auc"] == 0.5


def test_roc_auc_matches_pairwise_definition(spark):
    # AUC = P(score_pos > score_neg) + 0.5 P(equal), checked by brute force
    rows = [
        (0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1), (0.8, 0), (0.7, 1),
    ]
    df = spark.createDataFrame(rows, ["score", "y"])
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))
    got = inference.roc_auc(df, "score", "y").collect()[0]["auc"]
    assert got == pytest.approx(brute, abs=1e-6)


def test_calibration_table_bins_and_rates(spark):
    # 20 rows, scores 0..19, positives exactly the top half
    rows = [(float(i), 1 if i >= 10 else 0, i) for i in range(20)]
    df = spark.createDataFrame(rows, ["score", "y", "rid"])
    out = inference.calibration_table(
        df, "score", "y", n_bins=4, tiebreak_col="rid"
    ).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4]
    assert all(r["n"] == 5 for r in out)
    assert [r["pos_rate"] for r in out] == [0.0, 0.0, 1.0, 1.0]


def test_mann_whitney_shifted_distribution(spark):
    # group 1 values strictly above group 0 -> U1 = n0*n1, max z
    rows = [(float(i), 0) for i in range(20)] + [(float(i + 100), 1) for i in range(20)]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = inference.mann_whitney_u(df, "v", "g").collect()[0]
    assert r["u1"] == 400.0
    assert r["z"] > 5.0
    # identical distributions -> U1 = n0*n1/2 exactly, z = 0
    same = spark.createDataFrame(
        [(float((i // 2) % 10), i % 2) for i in range(40)], ["v", "g"]
    )
    r2 = inference.mann_whitney_u(same, "v", "g").collect()[0]
    assert r2["u1"] == 200.0 and r2["z"] == 0.0


def test_cohens_d_unit_shift(spark):
    import random
    rnd = random.Random(3)
    rows = [(rnd.gauss(0, 1), 0) for _ in range(2000)] + [
        (rnd.gauss(1, 1), 1) for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = inference.cohens_d(df, "v", "g").collect()[0]
    assert 0.8 < r["cohens_d"] < 1.2  # true d = 1.0


def test_cuped_reduces_variance_preserves_effect(spark):
    import datetime as dt
    import random

    rnd = random.Random(11)
    rows = []
    eid = 0
    pre_t = dt.datetime(2024, 1, 5)
    post_t = dt.datetime(2024, 1, 20)
    # per-user baseline b; post value = b + small noise + 2.0 lift for
    # variant 1 -> CUPED should recover ~2.0 with big variance reduction
    for u in range(300):
        b = rnd.uniform(0, 100)
        v = u % 2
        rows.append((eid, pre_t, u, v, b + rnd.gauss(0, 1))); eid += 1
        rows.append((eid, post_t, u, v, b + rnd.gauss(0, 1) + (2.0 if v else 0.0))); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "v", "value"])
    r = inference.cuped_effect(
        df, "user_id", "ts", "value", "v", "2024-01-16 00:00:00"
    ).collect()[0]
    # raw diff is swamped by between-user baseline spread; CUPED isn't
    assert abs(r["effect_cuped"] - 2.0) < 0.5
    assert r["var_reduction"] > 0.9  # baseline explains ~all variance
    assert 0.9 < r["theta"] < 1.1


def test_binary_label_contract_drops_stray_values(spark):
    """Non-0/1 labels are DROPPED, not folded into a group: a stray 2
    used to contribute -1 to the negative count via sum(1-y) and
    silently corrupt AUC/U/d (advisor round-3 finding)."""
    clean = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    dirty = clean + [(0.5, 2), (0.6, -1)]
    df_c = spark.createDataFrame(clean, ["s", "y"])
    df_d = spark.createDataFrame(dirty, ["s", "y"])
    auc_c = inference.roc_auc(df_c, "s", "y").collect()[0]
    auc_d = inference.roc_auc(df_d, "s", "y").collect()[0]
    assert auc_c["auc"] == auc_d["auc"] == 1.0
    d_c = inference.cohens_d(df_c, "s", "y").collect()[0]
    d_d = inference.cohens_d(df_d, "s", "y").collect()[0]
    assert d_c["n0"] == d_d["n0"] == 2
    assert d_c["cohens_d"] == d_d["cohens_d"]


def test_cuped_drops_stray_variant_values(spark):
    import datetime as dt

    pre_t = dt.datetime(2024, 1, 5)
    post_t = dt.datetime(2024, 1, 20)
    rows = []
    for u in range(40):
        v = u % 2
        rows.append((pre_t, u, v, 10.0 + u))
        rows.append((post_t, u, v, 10.0 + u + (2.0 if v else 0.0)))
    # variant 3 users would previously be counted as CONTROL (grp != 1)
    for u in range(100, 110):
        rows.append((pre_t, u, 3, 999.0))
        rows.append((post_t, u, 3, 999.0))
    df = spark.createDataFrame(rows, ["ts", "user_id", "v", "value"])
    r = inference.cuped_effect(
        df, "user_id", "ts", "value", "v", "2024-01-16 00:00:00"
    ).collect()[0]
    assert r["n0"] == 20 and r["n1"] == 20
    assert abs(r["effect_cuped"] - 2.0) < 0.1
