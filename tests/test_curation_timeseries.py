"""Unit tests for the corpus-curation and time-series operators
(semantics the oracle hash can't express: boundary behavior, leakage
safety, stability under corpus growth)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_spark.operators import curation, timeseries


def _ts(minute: float):
    return dt.datetime(2024, 1, 1, 0) + dt.timedelta(minutes=minute)


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, _ts(0)),
        (1, _ts(29)),   # 29 min gap -> same session
        (1, _ts(60)),   # 31 min gap -> new session
        (2, _ts(0)),    # separate user
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["user_id"], int((r["ts"] - _ts(0)).total_seconds() // 60)): r["session_idx"]
        for r in timeseries.sessionize(df, gap_minutes=30).collect()
    }
    assert out[(1, 0)] == 1 and out[(1, 29)] == 1
    assert out[(1, 60)] == 2
    assert out[(2, 0)] == 1


def test_session_stats_span(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(100))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    stats = {
        r["session_idx"]: (r["n_events"], r["span_s"])
        for r in timeseries.session_stats(df, gap_minutes=30).collect()
    }
    assert stats[1] == (2, 600)
    assert stats[2] == (1, 0)


def test_repetition_signals_extremes(spark):
    df = spark.createDataFrame(
        [
            (0, "a a a a a a"),               # maximal repetition
            (1, "one two three four five"),   # no repetition
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in curation.repetition_signals(df).collect()}
    assert out[0]["dup_word_frac"] > 0.8 and out[0]["top_bigram_frac"] == 1.0
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == 0.25  # 4 bigrams, all unique


def test_decontaminate_flags_leaked_doc(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark question about unicorn taxonomy")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "totally unrelated text here nothing shared at all"),
            (2, "discussing the secret benchmark question verbatim leak"),
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in curation.decontaminate(corpus, bench).collect()}
    assert out[2]["contaminated"] and out[2]["n_shared"] >= 1
    assert not out[1]["contaminated"] and out[1]["n_shared"] == 0


def test_sample_mixture_quotas(spark):
    rows = [(i, "en" if i < 60 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = curation.sample_mixture(
        df, "lang", {"en": 0.7, "de": 0.3}, total_rows=40, order_by="doc_id"
    )
    agg = out.groupBy("lang").agg(F.count("*").alias("n"))
    counts = {r["lang"]: r["n"] for r in agg.collect()}
    assert counts == {"en": 28, "de": 12}
    # deterministic: smallest ids win
    assert out.agg(F.max("doc_id")).first()[0] < 100


def test_split_by_group_leakage_safe_and_stable(spark):
    rows = [(i, f"src{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = curation.split_by_group_hash(df, "source", w)
    # every group maps to exactly one split
    assert (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )
    # growth-stable: adding rows never moves an existing group
    bigger = spark.createDataFrame(
        rows + [(1000 + i, f"src{i % 11}") for i in range(110)],
        ["doc_id", "source"],
    )
    a = {r["source"]: r["split"] for r in out.select("source", "split").distinct().collect()}
    b = {
        r["source"]: r["split"]
        for r in curation.split_by_group_hash(bigger, "source", w)
        .select("source", "split")
        .distinct()
        .collect()
    }
    assert all(b[s] == sp for s, sp in a.items())


def test_tfidf_ranks_term_dense_doc_first(spark):
    df = spark.createDataFrame(
        [
            (0, "spark spark spark join"),
            (1, "spark filler filler filler"),
            (2, "nothing relevant at all"),
        ],
        ["doc_id", "text"],
    )
    out = curation.tfidf_keyword_search(df, ["spark", "join"], k=3).collect()
    assert [r["id"] for r in out][0] == 0
    assert all(r["id"] != 2 for r in out)


def test_rolling_stats_window_shape(spark):
    rows = [(1, _ts(i), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = sorted(
        timeseries.rolling_stats(df, "user_id", "ts", "value", window_rows=3).collect(),
        key=lambda r: r["ts"],
    )
    assert out[0]["roll_mean"] == 0.0
    assert out[4]["roll_min"] == 2.0 and out[4]["roll_max"] == 4.0


def test_rolling_stats_quantized_integer_pair(spark):
    """Tie-safe restatement (r10 driver red row): fixed-point BIGINTs
    floor(x*2^q) and the mean as the exact integer pair (sum, n)."""
    rows = [(1, _ts(i), float(i) + 0.5) for i in range(4)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = sorted(
        timeseries.rolling_stats(
            df, "user_id", "ts", "value", window_rows=3, quantize_pow2=20
        ).collect(),
        key=lambda r: r["ts"],
    )
    s = 2**20
    assert out[0]["value_fp"] == s // 2 and out[0]["n_w"] == 1
    # frame at row 3: values 1.5, 2.5, 3.5 -> sum 7.5, min 1.5, max 3.5
    assert out[3]["roll_sum_fp"] == 15 * s // 2 and out[3]["n_w"] == 3
    assert out[3]["roll_min_fp"] == 3 * s // 2
    assert out[3]["roll_max_fp"] == 7 * s // 2


def test_zscore_flags_outlier_only(spark):
    rows = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(30)] + [(99, "a", 1000.0)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = timeseries.zscore_anomalies(df, "event_type", "value", 3.0).collect()
    assert [r["event_id"] for r in out] == [99]


def test_unigram_logprob_orders_gibberish_last(spark):
    df = spark.createDataFrame(
        [
            (0, "the the the the the"),          # most probable tokens
            (1, "the cat sat on the mat"),
            (2, "zqxj vvkw pplm qqrs zzzz"),     # singletons
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r["mean_logprob"]
        for r in curation.unigram_logprob_score(df).collect()
    }
    assert out[0] > out[1] > out[2]


def test_key_skew_stats_shares(spark):
    from airflow_spark.operators.curation import key_skew_stats

    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 8 + ["b"] * 2], ["k"]
    )
    rows = key_skew_stats(df, "k").collect()
    assert [r["k"] for r in rows] == ["a", "b"]
    assert rows[0]["share"] == 0.8 and rows[1]["share"] == 0.2


def test_chunk_documents_boundaries_and_overlap(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(300))
    df = spark.createDataFrame([(1, text), (2, "tiny")], ["doc_id", "text"])
    out = curation.chunk_documents(df, chunk_chars=128, overlap=32)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: ceil((300-32)/96) = 3 chunks
    assert {k[1] for k in rows if k[0] == 1} == {0, 1, 2}
    c0, c1 = rows[(1, 0)]["chunk_text"], rows[(1, 1)]["chunk_text"]
    assert c0[-32:] == c1[:32]  # overlap region identical
    assert len(c0) == 128
    assert rows[(1, 2)]["n_chunk_chars"] == 300 - 2 * 96
    # short doc -> exactly one whole chunk
    assert rows[(2, 0)]["chunk_text"] == "tiny"
    assert len({k[1] for k in rows if k[0] == 2}) == 1


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        curation.chunk_documents(df, chunk_chars=64, overlap=64)


def test_duplicated_passages_intra_doc_repeat_counts_once(spark):
    boiler = "all rights reserved by the original author"
    rows = [
        (1, f"{boiler} unique one text here"),
        (2, f"prefix words {boiler} and {boiler} again"),  # twice in one doc
        (3, "completely different content with no shared passage at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curation.duplicated_passages(df, shingle_n=5, min_docs=2, k=10).collect()
    grams = {r["gram"]: (r["n_docs"], r["first_doc"]) for r in out}
    # the 5-gram fully inside the boilerplate is shared by docs 1 and 2;
    # its double occurrence inside doc 2 must not inflate n_docs
    assert grams["all rights reserved by the"] == (2, 1)
    assert all(n == 2 for n, _ in grams.values())


def test_distribution_psi_zero_for_identical_and_positive_for_shifted(spark):
    same = [("t", "a", float(v)) for v in range(100)] + [
        ("t", "b", float(v)) for v in range(100)
    ]
    shifted = [("s", "a", float(v)) for v in range(100)] + [
        ("s", "b", float(v) + 300.0) for v in range(100)
    ]
    df = spark.createDataFrame(same + shifted, ["event_type", "period", "value"])
    out = {
        r["event_type"]: r
        for r in timeseries.distribution_psi(
            df, "event_type", "period", "value", lo=0.0, hi=500.0, nbins=10
        ).collect()
    }
    assert out["t"]["psi"] == 0.0
    assert out["s"]["psi"] > 0.25  # retrain-worthy shift
    assert out["s"]["n_a"] == 100 and out["s"]["n_b"] == 100


def test_distribution_psi_clamps_out_of_range_values(spark):
    rows = [("t", "a", -50.0), ("t", "a", 10.0), ("t", "b", 900.0), ("t", "b", 10.0)]
    df = spark.createDataFrame(rows, ["event_type", "period", "value"])
    out = timeseries.distribution_psi(
        df, "event_type", "period", "value", lo=0.0, hi=500.0, nbins=10
    ).collect()
    assert len(out) == 1 and out[0]["n_a"] == 2 and out[0]["n_b"] == 2


def test_remove_duplicated_segments_cuts_shared_boilerplate(spark):
    # 3-word segments: "all rights reserved" is a shared segment in
    # docs 1 and 2 (same aligned position window); doc 3 is untouched.
    rows = [
        (1, "all rights reserved alpha beta gamma"),
        (2, "all rights reserved delta epsilon zeta"),
        (3, "totally unrelated words here now ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in curation.remove_duplicated_segments(
            df, seg_words=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[3]["clean_text"] == rows[2][1] and out[3]["n_removed"] == 0


def test_remove_duplicated_segments_fully_removed_doc_is_empty(spark):
    rows = [(1, "same exact words"), (2, "same exact words"), (3, "other stuff kept")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in curation.remove_duplicated_segments(
            df, seg_words=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == ""
    assert out[3]["clean_text"] == "other stuff kept"


def test_remove_duplicated_segments_short_tail_segment(spark):
    # 7 tokens -> segments of 3/3/1; the 1-token tail participates too
    rows = [(1, "a b c d e f tail"), (2, "x y z p q r tail")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in curation.remove_duplicated_segments(
            df, seg_words=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "x y z p q r"


def test_gap_fill_carries_forward(spark):
    import datetime as dt

    from airflow_spark.operators.timeseries import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=3), 40.0),  # hours 1,2 missing
        (2, t0, 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["user_id"], r["bucket"].hour): (r["value"], r["was_filled"])
        for r in gap_fill(df).collect()
    }
    assert got[(1, 0)] == (10.0, False)
    assert got[(1, 1)] == (10.0, True)   # forward-filled
    assert got[(1, 2)] == (10.0, True)
    assert got[(1, 3)] == (40.0, False)
    assert got[(2, 0)] == (5.0, False)
    assert len(got) == 5  # key 2's spine is its own single bucket


def test_rollup_incremental_refresh_and_hybrid_query(spark, tmp_path):
    import datetime as dt

    from airflow_spark.operators import rollup

    path = str(tmp_path / "rollup")
    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def ev(h, m, typ, v):
        return (t0 + dt.timedelta(hours=h, minutes=m), typ, float(v))

    batch1 = spark.createDataFrame(
        [ev(0, 5, "a", 1), ev(0, 40, "b", 2), ev(1, 10, "a", 3), ev(2, 1, "a", 4)],
        ["ts", "event_type", "value"],
    )
    r1 = rollup.refresh_rollup(spark, batch1, path)
    # hour 2 holds max ts -> in progress -> only hours 0,1 materialize
    assert r1["new_buckets"] == 2
    assert spark.read.parquet(path).agg(F.max("bucket")).first()[0].hour == 1

    batch2 = batch1.union(
        spark.createDataFrame(
            [ev(2, 30, "b", 5), ev(3, 15, "a", 6), ev(4, 2, "b", 7)],
            ["ts", "event_type", "value"],
        )
    )
    r2 = rollup.refresh_rollup(spark, batch2, path)
    assert r2["new_buckets"] == 2  # hours 2 and 3; hour 4 now in progress
    assert r2["high_water"].hour == 1

    # hybrid over [00:30, 04:00) == direct aggregation over raw
    start, end = t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(hours=4)
    got = {
        r["event_type"]: r["n"]
        for r in rollup.hybrid_range_count(spark, batch2, path, start, end).collect()
    }
    want = {
        r["event_type"]: r["cnt"]
        for r in batch2.where((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want, (got, want)

    # refresh with nothing new: no buckets appended
    r3 = rollup.refresh_rollup(spark, batch2, path)
    assert r3["new_buckets"] == 0


def test_ewma_matches_hand_recursion(spark):
    """EWMA fold must equal the hand-computed recursion, restart at
    the frame head, and respect tie-breaker ordering."""
    from airflow_spark.operators.timeseries import ewma

    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    got = {
        r["ts"]: r["ewma"]
        for r in ewma(df, "k", "ts", "value", alpha=0.25, window_rows=3).collect()
    }
    # window 3, alpha .25: t0=10; t1=.75*10+.25*20=12.5;
    # t2=.75*12.5+.25*30=16.875; t3 restarts at 20:
    # .75*(.75*20+.25*30)+.25*40 = .75*22.5+10 = 26.875
    assert got == {0: 10.0, 1: 12.5, 2: 16.875, 3: 26.875}


def test_rrf_fuse_rank_only_combination(spark):
    """RRF must rank by summed reciprocal ranks, ignore score scales,
    and give single-list docs only their one contribution."""
    from airflow_spark.operators.curation import rrf_fuse

    a = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 10.0)], ["id", "score"]
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.5)], ["id", "score"]
    )
    got = [(r["id"], r["rrf"]) for r in rrf_fuse([a, b], k0=60, k=10).collect()]
    # doc 2: rank 2 in a, rank 1 in b -> 1/62 + 1/61 (top)
    # doc 1: 1/61; doc 4: 1/62; doc 3: 1/63
    assert [g[0] for g in got] == [2, 1, 4, 3]
    assert got[0][1] == round(1 / 62 + 1 / 61, 6)
    assert got[1][1] == round(1 / 61, 6)


def test_rolling_median_hand_values(spark):
    from airflow_spark.operators.timeseries import rolling_median

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([5, 1, 9, 3])],
        ["k", "ts", "value"],
    )
    got = [r["roll_median"] for r in
           rolling_median(df, "k", "ts", "value", window_rows=3)
           .orderBy("ts").collect()]
    # frames: [5] -> 5; [5,1] -> 3; [5,1,9] -> 5; [1,9,3] -> 3
    assert got == [5.0, 3.0, 5.0, 3.0]


def test_cusum_accumulates_and_resets(spark):
    from airflow_spark.operators.timeseries import cusum_alarms

    # ref=10: +5, +5 accumulate to 10; a deep dip clamps to 0; spike alarms
    vals = [15.0, 15.0, 0.0, 40.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], ["k", "ts", "value"]
    )
    got = [(r["cusum"], r["alarm"]) for r in
           cusum_alarms(df, "k", "ts", "value", ref=10.0, threshold=25.0,
                        window_rows=10).orderBy("ts").collect()]
    # S: 5, 10, max(0,10-10)=0, 0+30=30 (alarm)
    assert got == [(5.0, False), (10.0, False), (0.0, False), (30.0, True)]


def test_time_weighted_avg_holds_values(spark):
    """TWA must weight each observation by held time (last one held to
    the bucket end), not by sample count."""
    import datetime as dt

    from airflow_spark.operators.timeseries import time_weighted_avg

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, t0, 10.0), (1, t0 + dt.timedelta(minutes=45), 50.0)],
        ["k", "ts", "value"],
    )
    r = time_weighted_avg(df, "k", "ts", "value").collect()[0]
    # 10 held 45 min + 50 held 15 min = (10*2700 + 50*900)/3600 = 20
    assert r["n_samples"] == 2 and r["twa"] == 20.0
    # plain avg would say 30 — the burst-overweighting TWA avoids


def test_ohlc_bars_pick_first_and_last(spark):
    import datetime as dt

    from airflow_spark.operators.timeseries import ohlc_bars

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=10)
    rows = [("a", t0, 30.0, 1), ("a", t0 + m, 10.0, 2), ("a", t0 + 2 * m, 50.0, 3),
            ("a", t0 + 3 * m, 20.0, 4)]
    df = spark.createDataFrame(rows, ["k", "ts", "value", "event_id"])
    r = ohlc_bars(df, "k", "ts", "value", order_cols=["event_id"]).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == (
        30.0, 50.0, 10.0, 20.0, 4
    )


def test_period_growth_relative_change(spark):
    import datetime as dt

    from airflow_spark.operators.timeseries import period_growth

    rows = (
        [("a", dt.datetime(2026, 1, 5)) for _ in range(10)]
        + [("a", dt.datetime(2026, 2, 5)) for _ in range(15)]
        + [("a", dt.datetime(2026, 3, 5)) for _ in range(12)]
    )
    df = spark.createDataFrame(rows, ["k", "ts"])
    got = [(r["n"], r["prev_n"], r["growth"]) for r in
           period_growth(df, "k", "ts", "month").collect()]
    assert got == [(10, None, None), (15, 10, 0.5), (12, 15, -0.2)]


def test_incremental_join_view_equals_full_join(spark, tmp_path):
    """Delta-join maintenance must equal a from-scratch join after
    every append batch, including left-only, right-only, and
    both-sides batches (the three delta terms)."""
    from airflow_spark.operators.ivm import refresh_join_view

    view = str(tmp_path / "view")
    L, R = [], []

    def check():
        ldf = spark.createDataFrame(L, "l_id long, k string, lv long")
        rdf = spark.createDataFrame(R, "r_id long, k string, rv long")
        res = refresh_join_view(spark, ldf, rdf, view, "k", "l_id", "r_id")
        got = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in spark.read.parquet(view).collect()
        )
        want = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in ldf.join(rdf, "k").collect()
        )
        assert got == want, (got, want)
        return res

    # batch 1: initial materialization
    L += [(1, "a", 10), (2, "b", 20)]
    R += [(1, "a", 100)]
    assert check()["appended"] == 1

    # batch 2: right-only append — matches the OLD left rows
    R += [(2, "b", 200), (3, "a", 300)]
    assert check()["appended"] == 2

    # batch 3: left-only append — matches ALL right rows seen so far
    L += [(3, "a", 30)]
    assert check()["appended"] == 2  # (a,30,100) and (a,30,300)

    # batch 4: both sides at once — covers the ΔL⋈ΔR cross term
    L += [(4, "c", 40)]
    R += [(4, "c", 400), (5, "b", 500)]
    res = check()
    assert res["appended"] == 2  # (c,40,400) via dL(x)full-R, (b,20,500)

    # batch 5: no new rows — a no-op refresh appends nothing
    assert check()["appended"] == 0


def test_temperature_mixture_upweights_rare_groups(spark):
    from airflow_spark.operators.curation import temperature_mixture

    # 90 "en" vs 10 "zh": proportional would give zh 10% of the take;
    # sqrt-temperature gives sqrt(10)/(sqrt(90)+sqrt(10)) = 25%
    rows = [(i, "en") for i in range(90)] + [(100 + i, "zh") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    out = temperature_mixture(df, "lang", 40, "doc_id")
    by = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert by["zh"] == 10  # floor(40 * 0.25) = 10 — the whole group
    assert by["en"] == 30  # floor(40 * 0.75)
    # deterministic: smallest doc_ids win within each group
    zh_ids = [r.doc_id for r in out.where("lang = 'zh'").collect()]
    assert sorted(zh_ids) == list(range(100, 110))


def test_bigram_quality_separates_salad_from_structure(spark):
    from airflow_spark.operators.curation import bigram_logprob_score

    # corpus dominated by "the cat sat" word order; one doc uses the
    # same words scrambled — unigram stats identical, bigrams alien
    rows = [(i, "the cat sat on the mat") for i in range(5)] + [
        (99, "mat the on sat cat the"),
        (100, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.id: r for r in bigram_logprob_score(df).collect()}
    assert out[0].n_bigrams == 5
    assert out[99].score < out[0].score  # scrambled scores lower
    assert out[100].n_bigrams == 0 and out[100].score is None


def test_incremental_agg_view_matches_full_recompute(spark, tmp_path):
    from airflow_spark.operators.ivm import read_agg_view, refresh_agg_view

    view = str(tmp_path / "aggview")
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)],
        "id LONG, k STRING, v DOUBLE",
    )
    refresh_agg_view(spark, b1, view, ["k"], "v", "id")
    got = {r.k: r for r in read_agg_view(spark, view).collect()}
    assert got["a"].cnt == 2 and got["a"].sum_v == 30.0
    assert got["a"].avg_v == 15.0

    # append-only delta: only rows past the high-water mark count
    b2 = b1.unionByName(
        spark.createDataFrame(
            [(4, "b", 7.0), (5, "c", 1.0)], "id LONG, k STRING, v DOUBLE"
        )
    )
    res = refresh_agg_view(spark, b2, view, ["k"], "v", "id")
    assert res["delta_groups"] == 2  # only b and c touched
    got = {r.k: r for r in read_agg_view(spark, view).collect()}
    assert got["b"].cnt == 2 and got["b"].sum_v == 12.0
    assert got["b"].min_v == 5.0 and got["b"].max_v == 7.0
    assert got["c"].cnt == 1

    # no-op refresh: nothing past the mark, totals unchanged
    refresh_agg_view(spark, b2, view, ["k"], "v", "id")
    got2 = {r.k: (r.cnt, r.sum_v) for r in read_agg_view(spark, view).collect()}
    assert got2 == {k: (r.cnt, r.sum_v) for k, r in got.items()}


def test_seasonal_baseline_exact_repeat_has_zero_mae(spark):
    import datetime as dt

    from airflow_spark.operators.timeseries import seasonal_baseline_mae

    base = dt.datetime(2026, 1, 1)
    # a 3-bucket season repeated 3 times exactly → MAE 0
    rows = [
        ("a", base + dt.timedelta(hours=h), float([5, 7, 9][h % 3]))
        for h in range(9)
    ]
    # plus a drifting series: +1 each season
    rows += [
        ("b", base + dt.timedelta(hours=h), float(h // 3))
        for h in range(9)
    ]
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP, value DOUBLE")
    out = {r.event_type: r for r in
           seasonal_baseline_mae(df, season=3).collect()}
    assert out["a"].n_buckets == 6 and out["a"].mae == 0.0
    assert out["b"].mae == 1.0  # each bucket is exactly +1 vs last season


def test_double_exponential_tracks_linear_trend(spark):
    """On an exactly linear series Brown's method converges toward the
    true next value; first row has no forecast (no trend evidence)."""
    import datetime as dt

    from airflow_spark.operators.timeseries import (
        double_exponential_forecast,
    )

    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=i), 10.0 + 2.0 * i, i)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, value DOUBLE, event_id INT"
    )
    out = double_exponential_forecast(
        df, "user_id", "ts", "value", alpha=0.5, window_rows=8,
        order_cols=["event_id"],
    ).orderBy("ts").collect()
    assert out[0].forecast is None
    # late rows: forecast approaches next value (34, 36, ...) within
    # the bounded-frame bias
    last = out[-1]
    true_next = last.value + 2.0
    assert abs(last.forecast - true_next) < 1.5


def test_rolling_corr_sign_flip(spark):
    import datetime as dt

    from airflow_spark.operators.timeseries import rolling_corr

    base = dt.datetime(2026, 1, 1)
    # x rises with time then falls: trailing-5 corr flips sign
    vals = list(range(10)) + list(range(10, 0, -1))
    rows = [
        (1, base + dt.timedelta(minutes=i), float(v), i)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, ts TIMESTAMP, value DOUBLE, event_id INT"
    )
    from pyspark.sql import functions as F

    out = rolling_corr(
        df, "user_id", "ts", F.col("value"),
        F.floor(F.unix_timestamp("ts")).cast("double"),
        window_rows=5, order_cols=["event_id"],
    ).orderBy("ts").collect()
    assert out[8].roll_corr == 1.0
    assert out[-1].roll_corr == -1.0
    assert out[0].roll_corr is None  # single-row frame


def test_kfold_splits_leakage_safe_and_stable(spark):
    rows = [(i, f"src{i % 7}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = curation.kfold_splits(df, "source", k=5).collect()
    by_source = {}
    for r in got:
        assert 0 <= r["fold"] < 5
        by_source.setdefault(r["source"], set()).add(r["fold"])
    # leakage-safe: one fold per source
    assert all(len(folds) == 1 for folds in by_source.values())
    # stable under growth: adding rows never moves an existing group
    grown = spark.createDataFrame(
        rows + [(100 + i, f"new{i}") for i in range(20)],
        ["doc_id", "source"],
    )
    regrown = {
        r["source"]: r["fold"]
        for r in curation.kfold_splits(grown, "source", k=5).collect()
    }
    for src, folds in by_source.items():
        assert regrown[src] == next(iter(folds))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 2"):
        curation.kfold_splits(df, "source", k=1)


def test_compaction_plan_bins_near_target(spark):
    from airflow_spark.operators.layout import compaction_plan

    rows = [(i, 100 + 37 * (i % 13)) for i in range(200)]
    files = spark.createDataFrame(rows, ["file_id", "size_bytes"])
    target = 1500
    plan = compaction_plan(files, "size_bytes", target, id_col="file_id")
    bins = (
        plan.groupBy("bin_id")
        .agg(F.sum("size_bytes").alias("b"), F.count("*").alias("n"))
        .collect()
    )
    assert plan.count() == 200  # every file assigned exactly once
    sizes = {r["file_id"]: r["size_bytes"] for r in rows_as_dict(rows)}
    # every bin except possibly the last is within target + one max file
    max_size = max(s for _, s in rows)
    for r in bins:
        assert r["b"] <= target + max_size
    # deterministic: replanning yields identical assignment
    again = {
        r["file_id"]: r["bin_id"]
        for r in compaction_plan(
            files, "size_bytes", target, id_col="file_id"
        ).collect()
    }
    first = {r["file_id"]: r["bin_id"] for r in plan.collect()}
    assert first == again
    # sharded form: same invariants, no global window
    sharded = compaction_plan(
        files, "size_bytes", target, id_col="file_id", n_shards=4
    )
    assert sharded.count() == 200
    sbins = sharded.groupBy("bin_id").agg(
        F.sum("size_bytes").alias("b")
    ).collect()
    assert all(r["b"] <= target + max_size for r in sbins)
    plan_str = sharded._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan_str


def rows_as_dict(rows):
    return [{"file_id": a, "size_bytes": b} for a, b in rows]


def test_ngram_novelty_dup_scores_zero(spark):
    from airflow_spark.operators.corpus_stats import ngram_novelty

    base = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (0, base),                      # first: everything novel
        (1, base),                      # exact dup: nothing novel
        (2, base + " with a brand new unique closing flourish sentence"),
        (3, "completely different text about spark query planning now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in ngram_novelty(df, shingle_n=3).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0 and got[1]["n_novel"] == 0
    assert 0.0 < got[2]["novelty"] < 1.0
    assert got[3]["novelty"] == 1.0


def test_autocorrelation_alternating_series(spark):
    # strictly alternating values -> lag-1 ACF = -1, lag-2 ACF = +1
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), "a", float(1 if i % 2 else -1))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    r = timeseries.autocorrelation(
        df, "event_type", "ts", "value", "event_id", max_lag=2
    ).collect()[0]
    assert r["n"] == 40
    assert abs(r["acf_1"] + 1.0) < 1e-6
    assert abs(r["acf_2"] - 1.0) < 1e-6


def test_autocorrelation_constant_series_is_null(spark):
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), "a", 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    r = timeseries.autocorrelation(
        df, "event_type", "ts", "value", "event_id", max_lag=1
    ).collect()[0]
    # zero variance -> corr undefined -> NULL (not 0, not NaN)
    assert r["acf_1"] is None


def test_hourly_cross_correlation_detects_known_lead(spark):
    # b-events mirror a-events exactly one hour later -> xc_p1 == 1.0
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    counts = [3, 7, 2, 9, 5, 1, 8, 4, 6, 2, 7, 3]
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=5), "a")); eid += 1
            rows.append((eid, base + dt.timedelta(hours=h + 1, minutes=5), "b")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    r = timeseries.hourly_cross_correlation(
        df, "ts", "event_type", "a", "b", max_lag=2
    ).collect()[0]
    assert r["xc_p1"] == 1.0
    # and the aligned correlation is NOT perfect (series are shifted)
    assert r["xc_0"] is None or r["xc_0"] < 1.0


def test_distinctive_terms_finds_planted_vocab(spark):
    # both groups share filler; only group A says "quantum", only B "farming"
    filler = "the data and the value of the data"
    rows = (
        [(i, f"{filler} quantum quantum quantum", "A") for i in range(4)]
        + [(i + 10, f"{filler} farming farming farming", "B") for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = curation.distinctive_terms(
        df, "source", "text", "doc_id", k=1, min_count=2
    ).collect()
    top = {r["source"]: r["tok"] for r in out}
    assert top == {"A": "quantum", "B": "farming"}
    assert all(r["rank"] == 1 for r in out)


def test_seasonality_strength_periodic_vs_flat(spark):
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for day in range(4):
        for hod in range(24):
            # "seasonal": count depends only on hour-of-day
            for _ in range(1 + (3 if hod == 12 else 0)):
                rows.append((eid, base + dt.timedelta(days=day, hours=hod), "seasonal")); eid += 1
            # "flat": same count every hour
            rows.append((eid, base + dt.timedelta(days=day, hours=hod), "flat")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    got = {r["event_type"]: r for r in
           timeseries.seasonality_strength(df, "event_type", "ts").collect()}
    # hour-of-day profile explains ALL variance of the seasonal series
    assert got["seasonal"]["seasonality"] == 1.0
    # constant series: zero total variance -> undefined (NULL)
    assert got["flat"]["seasonality"] is None


def test_burstiness_periodic_vs_bursty(spark):
    rows = []
    base = dt.datetime(2024, 5, 1)
    # user 1: perfectly periodic (gap always 60s) -> B = -1
    for i in range(10):
        rows.append((i, base + dt.timedelta(seconds=60 * i), 1))
    # user 2: bursty - 9 events in the same minute, then an hour gap
    for i in range(9):
        rows.append((100 + i, base + dt.timedelta(seconds=i), 2))
    rows.append((200, base + dt.timedelta(hours=1), 2))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = {r["user_id"]: r for r in
           timeseries.burstiness(df, "user_id", "ts", "event_id").collect()}
    assert got[1]["burstiness"] == -1.0
    assert got[2]["burstiness"] > 0.4  # strongly bursty (B=0 is Poisson)


def test_mean_shift_changepoint_finds_planted_shift(spark):
    rows, eid = [], 0
    base = dt.datetime(2024, 6, 1)
    # 24h at ~2/hour, then 24h at ~8/hour: split must land at hour 23
    for h in range(48):
        for _ in range(2 if h < 24 else 8):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=7), "m")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    r = timeseries.mean_shift_changepoint(df, "event_type", "ts").collect()[0]
    assert r["split_hour"] == base + dt.timedelta(hours=23)
    assert r["mean_left"] == 2.0 and r["mean_right"] == 8.0


def test_seasonal_decompose_components_sum(spark):
    rows, eid = [], 0
    base = dt.datetime(2024, 7, 1)
    for day in range(3):
        for hod in range(24):
            for _ in range(2 + (4 if hod == 9 else 0)):
                rows.append((eid, base + dt.timedelta(days=day, hours=hod), "purchase")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = timeseries.seasonal_decompose_hourly(df, "event_type", "ts").collect()
    for r in out:
        # components reassemble the observation (within rounding)
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - r["n_events"]) < 2e-3
    # the 9am spike loads on the SEASONAL component mid-series
    mid = [r for r in out if r["h"].hour == 9 and r["n_window"] == 25]
    assert mid and all(r["seasonal"] > 2.0 for r in mid)


def test_changepoint_sees_drop_to_zero(spark):
    # 24h at 5/hour then TOTAL SILENCE for 24h except one closing event:
    # the sparse frame would hide the outage; the dense spine makes the
    # split land at the last active hour
    rows, eid = [], 0
    base = dt.datetime(2024, 8, 1)
    for h in range(24):
        for _ in range(5):
            rows.append((eid, base + dt.timedelta(hours=h), "m")); eid += 1
    rows.append((eid, base + dt.timedelta(hours=47), "m"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    r = timeseries.mean_shift_changepoint(df, "event_type", "ts").collect()[0]
    assert r["split_hour"] == base + dt.timedelta(hours=23)
    assert r["mean_left"] == 5.0
    assert r["mean_right"] < 0.1  # ~1 event over 24 silent hours
    assert r["n_hours"] == 48  # dense: every calendar hour is a row


def test_seasonality_strength_needs_dense_zeros(spark):
    # active exactly 1 hour per day: ALL the seasonality is in the 23
    # silent hours -> dense spine must report strength ~1
    rows, eid = [], 0
    base = dt.datetime(2024, 8, 10)
    for day in range(5):
        for _ in range(6):
            rows.append((eid, base + dt.timedelta(days=day, hours=9), "x")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    r = timeseries.seasonality_strength(df, "event_type", "ts").collect()[0]
    assert r["seasonality"] == 1.0
