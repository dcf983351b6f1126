"""Semantics tests for the composed relational operators (as-of join,
interval join, running totals, approx distinct)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_spark.operators import relational

BASE = dt.datetime(2026, 1, 1, 12, 0)


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _m(10), "l1"), (1, _m(30), "l2"), (2, _m(5), "l3")],
        ["k", "ts", "lname"],
    )
    right = spark.createDataFrame(
        [(1, _m(0), "r0"), (1, _m(10), "r1"), (1, _m(25), "r2"), (2, _m(50), "r9")],
        ["k", "ts", "rname"],
    )
    out = {
        r["lname"]: r["rname_r"]
        for r in relational.asof_join(left, right, key="k",
                                      right_cols=["rname"]).collect()
    }
    assert out["l1"] == "r1"   # equal ts matches (inclusive)
    assert out["l2"] == "r2"   # latest preceding
    assert out["l3"] is None   # nothing precedes → NULL


def test_asof_no_row_explosion(spark):
    left = spark.createDataFrame([(1, _m(i)) for i in range(10)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, _m(i), i) for i in range(0, 10, 2)], ["k", "ts", "v"]
    )
    out = relational.asof_join(left, right, key="k", right_cols=["v"])
    assert out.count() == 10  # exactly one output row per left row


def test_interval_join_bounds(spark):
    events = spark.createDataFrame(
        [(1, _m(0), "at_start"), (1, _m(59), "inside"), (1, _m(60), "at_end"),
         (1, _m(-1), "before"), (2, _m(30), "wrong_key")],
        ["k", "ts", "name"],
    )
    intervals = spark.createDataFrame(
        [(1, _m(0), _m(60), "w1")], ["k", "start", "end", "wname"]
    )
    got = {
        r["name"]
        for r in relational.interval_join(events, intervals, key="k").collect()
    }
    assert got == {"at_start", "inside"}  # [start, end) and key-matched


def test_interval_join_spanning_buckets(spark):
    # a 3h interval must catch events in every covered hourly bucket
    events = spark.createDataFrame(
        [(1, _m(30)), (1, _m(90)), (1, _m(150))], ["k", "ts"]
    )
    intervals = spark.createDataFrame(
        [(1, _m(0), _m(180), "w")], ["k", "start", "end", "wname"]
    )
    assert relational.interval_join(events, intervals, key="k").count() == 3


def test_running_total_per_key(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 5.0), (2, 1, 7.0)], ["k", "seq", "v"]
    )
    out = relational.running_total(df, key="k", order_by=["seq"], value_col="v")
    got = {(r["k"], r["seq"]): r["running_total"] for r in out.collect()}
    assert got == {(1, 1): 10.0, (1, 2): 15.0, (2, 1): 7.0}


def test_approx_count_distinct_within_tolerance(spark, sf_correct):
    from airflow_spark.catalog import load_tables

    orders = load_tables(spark, sf_correct).orders
    exact = orders.agg(F.countDistinct("o_custkey").alias("n")).first()["n"]
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.05


def test_normalize_expression_equals_pandas(spark):
    from airflow_spark.operators import grouped

    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [("b", 10.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    expr_out = {
        (r["k"], r["v"]): round(r["z"], 9)
        for r in grouped.normalize_per_key(df, "k", "v").collect()
    }
    pandas_out = {
        (r["k"], r["v"]): round(r["z"], 9)
        for r in grouped.normalize_per_key_pandas(df, "k", "v").collect()
    }
    assert expr_out == pandas_out
    assert pandas_out[("b", 10.0)] == 0.0  # zero-std guard


def test_grouped_quantiles(spark):
    from airflow_spark.operators import grouped

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)], ["k", "v"]
    )
    r = grouped.grouped_quantiles(df, "k", "v").first()
    assert r["p50"] == 50.5
    assert round(r["p95"], 2) == 95.05


def test_udtf_tick_expander(spark):
    from airflow_spark.functions.udtf import TickExpander

    spark.udtf.register("tick_expander", TickExpander)
    out = spark.sql(
        "SELECT t.* FROM VALUES ('a', 0, 10, 3), ('b', 5, 6, 1) AS v(k, s, e, st), "
        "LATERAL tick_expander(v.k, v.s, v.e, v.st) t"
    ).collect()
    got = sorted((r["key"], r["tick"]) for r in out)
    assert got == [("a", 0), ("a", 3), ("a", 6), ("a", 9), ("b", 5)]


def test_asof_join_matches_python_reference(spark):
    """Randomized check against a brute-force reference: for every left
    row, the matched right value must be the one with the greatest
    ts <= left.ts on the same key (None when absent)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        left = [
            (rng.randint(1, 3), rng.randint(0, 50)) for _ in range(rng.randint(1, 15))
        ]
        right = [
            (rng.randint(1, 3), rng.randint(0, 50), i)
            for i in range(rng.randint(1, 12))
        ]
        # unique (key, ts) on the right: as-of output is otherwise
        # ambiguous (both engines would tie-break arbitrarily)
        seen = set()
        right = [
            r for r in right if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
        ]
        ldf = spark.createDataFrame(
            [(k, _m(t), i) for i, (k, t) in enumerate(left)], ["k", "ts", "lid"]
        )
        rdf = spark.createDataFrame(
            [(k, _m(t), v) for k, t, v in right], ["k", "ts", "v"]
        )
        got = {
            r["lid"]: r["v_r"]
            for r in relational.asof_join(ldf, rdf, key="k", right_cols=["v"]).collect()
        }
        for i, (k, t) in enumerate(left):
            candidates = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
            expect = max(candidates)[1] if candidates else None
            assert got[i] == expect, (trial, i, k, t, candidates, got[i])


# ---------------------------------------------------------------------------
# mergeable HLL sketches (operators/sketches.py)
# ---------------------------------------------------------------------------


def test_hll_sparse_regime_is_exact(spark):
    from airflow_spark.operators import sketches

    df = spark.range(0, 600).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    got = {
        r["g"]: r["distinct_est"]
        for r in sketches.hll_rollup(df, "v", ["g"]).collect()
    }
    assert got == {0: 200, 1: 200, 2: 200}


def test_hll_merge_equals_direct_sketch(spark):
    from airflow_spark.operators import sketches

    # 20 fine groups folding into 4 coarse ones, with overlapping values
    df = spark.range(0, 5000).select(
        (F.col("id") % 20).alias("fine"),
        ((F.col("id") % 20) % 4).alias("coarse"),
        (F.col("id") % 700).alias("v"),
    )
    fine = sketches.hll_rollup(df, "v", ["fine", "coarse"])
    merged = {
        r["coarse"]: r["distinct_est"]
        for r in sketches.hll_merge_rollup(fine, ["coarse"]).collect()
    }
    direct = {
        r["coarse"]: r["distinct_est"]
        for r in sketches.hll_rollup(df, "v", ["coarse"]).collect()
    }
    # union of fine sketches == sketch of the union (associativity)
    assert merged == direct


def test_hll_estimate_tolerance_in_approx_regime(spark):
    from airflow_spark.operators import sketches

    n = 50_000  # >> k/4 = 1024 at lgk=12: genuinely approximate
    df = spark.range(0, n).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    est = sketches.hll_rollup(df, "v", ["g"]).first()["distinct_est"]
    assert abs(est - n) / n < 0.05, est


def test_hll_rollup_shuffles_sketches_not_rows(spark):
    from airflow_spark.operators import sketches
    from airflow_spark.plans.audit import audit_plan

    df = spark.range(0, 2000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    rep = audit_plan(sketches.hll_rollup(df, "v", ["g"]), execute=True)
    # map-side combine: partial sketches built before the exchange, so
    # the one shuffle carries ~KB merged sketches rather than raw rows
    # (AQE formatted explain prints the Exchange twice — final plan +
    # Initial Plan — so assert the node sequence, not a count)
    assert "partial_hll_sketch_agg" in rep["plan"]
    assert not rep["has_cartesian"] and not rep["has_bnl_join"]


def test_asof_join_forward_and_tolerance(spark):
    import datetime as dt

    from airflow_spark.operators.relational import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(50), "b"), (2, ts(10), "c")],
        ["k", "ts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, ts(0), "r0"), (1, ts(20), "r20"), (1, ts(60), "r60")],
        ["k", "ts", "rval"],
    )

    back = {
        r["lval"]: r["rval_r"]
        for r in asof_join(left, right, "k", right_cols=["rval"]).collect()
    }
    assert back == {"a": "r0", "b": "r20", "c": None}

    fwd = {
        r["lval"]: r["rval_r"]
        for r in asof_join(
            left, right, "k", right_cols=["rval"], direction="forward"
        ).collect()
    }
    assert fwd == {"a": "r20", "b": "r60", "c": None}

    # equal timestamps are inclusive in both directions
    eq = spark.createDataFrame([(1, ts(20), "x")], ["k", "ts", "lval"])
    for d in ("backward", "forward"):
        got = asof_join(eq, right, "k", right_cols=["rval"], direction=d).first()
        assert got["rval_r"] == "r20", d

    # tolerance: 10-min backward match survives, 49-min match is nulled
    tol = {
        r["lval"]: r["rval_r"]
        for r in asof_join(
            left, right, "k", right_cols=["rval"], tolerance_s=15 * 60
        ).collect()
    }
    assert tol == {"a": "r0", "b": None, "c": None}


def test_asof_join_forward_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    from airflow_spark.operators.relational import asof_join

    rng = np.random.default_rng(7)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 40),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 40), unit="s"),
            "lid": range(40),
        }
    ).sort_values("ts")
    rp = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 30),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 30), unit="s"),
            "rid": range(30),
        }
    ).sort_values("ts")
    want = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="forward"
    ).set_index("lid")["rid"]
    got = {
        r["lid"]: r["rid_r"]
        for r in asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            "k",
            right_cols=["rid"],
            direction="forward",
        ).collect()
    }
    for lid in range(40):
        w = want.loc[lid]
        assert (got[lid] is None and pd.isna(w)) or got[lid] == w, lid


def test_kmv_sketch_exact_merge_and_intersection(spark):
    """KMV must be exact below k, mergeable (union of bottom-k equals
    bottom-k of the union), and its estimator within ~3/sqrt(k) of the
    true distinct count; intersection estimate must see real overlap."""
    from pyspark.sql import functions as F

    from airflow_spark.operators import sketches

    # two groups with known distincts and 50-element overlap
    rows = [("a", i) for i in range(200)] + [("b", i) for i in range(150, 400)]
    df = spark.createDataFrame(rows, ["g", "v"])

    # exact regime: k larger than any distinct count
    sk_big = sketches.kmv_estimate(
        sketches.kmv_sketch(df, "v", ["g"], k=1024), 1024
    )
    got = {r["g"]: (r["n_kept"], r["distinct_est"]) for r in sk_big.collect()}
    assert got == {"a": (200, 200.0), "b": (250, 250.0)}

    # estimation regime: within 3/sqrt(k) relative error
    k = 64
    sk = sketches.kmv_sketch(df, "v", ["g"], k=k)
    est = {r["g"]: r["distinct_est"] for r in sketches.kmv_estimate(sk, k).collect()}
    for g, true in (("a", 200), ("b", 250)):
        assert abs(est[g] - true) / true < 3 / (k ** 0.5), (g, est[g])

    # mergeability: rollup of per-group sketches == sketch of the union
    merged = sketches.kmv_merge(sk, [], k=k).collect()[0]["kmv"]
    direct = sketches.kmv_sketch(
        df.select(F.lit("all").alias("g"), "v"), "v", ["g"], k=k
    ).collect()[0]["kmv"]
    assert merged == direct

    # intersection estimate: true overlap is 50
    wide = (
        sk.groupBy()
        .pivot("g", ["a", "b"])
        .agg(F.first("kmv"))
    )
    inter = wide.select(
        sketches.kmv_intersection_estimate(F.col("a"), F.col("b"), k).alias("i")
    ).collect()[0]["i"]
    assert 10 <= inter <= 120, inter  # ~50 within sketch noise


def test_asof_join_null_right_field_is_not_backfilled(spark):
    """A matched right row's NULL field must stay NULL — per-column
    carry would skip it and splice in an older row's value (a chimera
    that never existed)."""
    import datetime as dt

    from airflow_spark.operators.relational import asof_join

    t = dt.datetime
    left = spark.createDataFrame(
        [(1, t(2026, 1, 1, 0, 0, 20))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, t(2026, 1, 1, 0, 0, 5), 7.0),
         (1, t(2026, 1, 1, 0, 0, 10), None)],
        ["k", "ts", "v"],
    )
    got = asof_join(left, right, "k").collect()[0]
    # the as-of match is the ts=10 row whose v IS NULL
    assert got["v_r"] is None


def test_asof_join_nearest_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    from airflow_spark.operators.relational import asof_join

    rng = np.random.default_rng(21)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 40),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 40), unit="s"),
            "lid": range(40),
        }
    ).sort_values("ts")
    rp = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 30),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, 30), unit="s"),
            "rid": range(30),
        }
    ).sort_values("ts")
    want = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="nearest"
    ).set_index("lid")["rid"]
    got = {
        r["lid"]: r["rid_r"]
        for r in asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            "k",
            right_cols=["rid"],
            direction="nearest",
        ).collect()
    }
    for lid in range(40):
        w = want.loc[lid]
        assert (got[lid] is None and pd.isna(w)) or got[lid] == w, lid


def test_countmin_never_undercounts_and_merges(spark):
    from airflow_spark.operators import sketches

    rows = [(i, f"k{i % 7}") for i in range(1000)]
    df = spark.createDataFrame(rows, ["i", "key"])
    sk = sketches.countmin_counts(df, "key", depth=4, width=16)
    keys = df.select("key").distinct()
    est = {
        r["key"]: r["cm_estimate"]
        for r in sketches.countmin_estimate(
            sk, keys, "key", depth=4, width=16
        ).collect()
    }
    true = {r["key"]: r["c"] for r in
            df.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()}
    for k, t in true.items():
        assert est[k] >= t  # Count-Min never undercounts
    # mergeability: sketch(first half) + sketch(second half) == sketch(all)
    a = sketches.countmin_counts(df.where("i < 500"), "key", 4, 16)
    b = sketches.countmin_counts(df.where("i >= 500"), "key", 4, 16)
    merged = (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    whole = {(r["row"], r["bucket"]): r["c"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    assert got == whole


def test_weighted_quantiles_known_cdf(spark):
    from airflow_spark.operators import grouped

    # values 1..4 with weights 1,1,1,7 -> weighted median = 4
    rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 7.0)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    r = grouped.weighted_quantiles(df, "k", "v", "w", (0.25, 0.5)).collect()[0]
    assert r["wq_0_5"] == 4.0   # cdf reaches 0.5 only at v=4
    assert r["wq_0_25"] == 3.0  # cdf(3) = 0.3 >= 0.25
    # unweighted twin disagrees -> the weights matter
    uw = grouped.weighted_quantiles(
        df.withColumn("w", F.lit(1.0)), "k", "v", "w", (0.5,)
    ).collect()[0]
    assert uw["wq_0_5"] == 2.0


def test_l_diversity_flags_homogeneous_group(spark):
    from airflow_spark.operators import privacy

    rows = (
        [("en", "web", "x")] * 5                      # k=5 but 1 sensitive value
        + [("de", "web", s) for s in "abc"]           # diverse
    )
    df = spark.createDataFrame(rows, ["lang", "source", "sens"])
    got = {(r["lang"], r["source"]): r for r in
           privacy.l_diversity_stats(df, ["lang", "source"], "sens", l=2).collect()}
    assert got[("en", "web")]["l_diverse"] is False
    assert got[("en", "web")]["n_rows"] == 5 and got[("en", "web")]["n_sensitive"] == 1
    assert got[("de", "web")]["l_diverse"] is True
