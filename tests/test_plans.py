"""Plan-shape regression tests: the scale-critical physical-plan
properties (pushdown, pruning, broadcast, top-k, partial agg) are
asserted, not hoped for."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airflow_spark.plans import audit_plan
from airflow_spark.queries import RELATIONAL_QUERIES


@pytest.fixture(scope="module")
def sf(sf_smoke):
    return sf_smoke


def test_q02_filters_pushed_to_scan(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q02"](spark, sf))
    assert a["has_pushed_filters"], a["plan"]
    joined = " ".join(a["pushed_filters"])
    assert "o_totalprice" in joined


def test_q01_column_pruning_reaches_scan(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q01"](spark, sf))
    # only the 4 projected columns are read, not all 11
    assert a["read_schemas"], a["plan"]
    rs = a["read_schemas"][0]
    assert "l_orderkey" in rs and "l_comment" not in rs and "l_suppkey" not in rs


def test_q05_joins_are_broadcast(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q05"](spark, sf))
    assert a["n_broadcast_joins"] >= 2, a["plan"]
    assert not a["has_cartesian"]


def test_q15_topk_is_take_ordered(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q15"](spark, sf))
    assert a["top_k"], a["plan"]  # TakeOrderedAndProject, no global sort


def test_q09_partial_aggregation(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q09"](spark, sf), execute=True)
    assert a["partial_agg"], a["plan"]  # map-side combine before shuffle
    assert a["whole_stage_codegen"]


def test_q04_small_dim_autobroadcast(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q04"](spark, sf))
    assert a["n_broadcast_joins"] >= 1 and a["n_sortmerge_joins"] == 0, a["plan"]


def test_minhash_plan_shape(spark, sf):
    """Regression guard on the dedup plan: no cartesian product, partial
    aggregation present (map-side combine for the 128-min aggregate)."""
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(load_tables(spark, sf).documents)
    a = audit_plan(sigs)
    assert not a["has_cartesian"]
    assert a["partial_agg"], a["plan"]


def test_sequence_pack_is_sharded(spark, sf):
    """The registry packing op must pack per shard in parallel — no
    single-partition global window sort (round-1 scale flag)."""
    from airflow_spark.operators.registry import op_sequence_pack

    a = audit_plan(op_sequence_pack(spark, sf))
    assert "Exchange SinglePartition" not in a["plan"], a["plan"]
    assert "hashpartitioning(shard" in a["plan"], a["plan"]


def test_asof_join_single_shuffle(spark, sf):
    """The as-of join must cost one hash partition per side (no
    BroadcastNestedLoopJoin, no row explosion)."""
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.relational import asof_join
    from pyspark.sql import functions as F

    t = load_tables(spark, sf)
    errors = t.events.where(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = t.events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), "ts"
    )
    out = asof_join(errors, purchases, key="user_id", right_cols=["pid"])
    a = audit_plan(out)
    assert not a["has_bnl_join"] and not a["has_cartesian"], a["plan"]


def test_sessionize_one_sort_one_shuffle(spark, sf):
    """lag and the running sum share (partition, order): Spark splits
    them into two Window nodes (RowFrame vs RangeFrame) but the
    expensive parts — the Exchange on user_id and the Sort — must
    appear exactly once; a second sort/exchange would double the
    operator's cost."""
    import re

    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.timeseries import sessionize

    out = sessionize(load_tables(spark, sf).events)
    a = audit_plan(out)
    assert a["n_shuffles"] == 1, a["plan"]
    assert len(re.findall(r"\+- Sort ", a["plan"])) == 1, a["plan"]


def test_decontaminate_benchmark_is_broadcast(spark, sf):
    """The benchmark shingle side must broadcast — a shuffle join here
    would move the full corpus shingle set for a benchmark-sized right
    side."""
    from pyspark.sql import functions as F

    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.curation import decontaminate

    docs = load_tables(spark, sf).documents
    out = decontaminate(
        docs.where(F.col("doc_id") % 97 != 0), docs.where(F.col("doc_id") % 97 == 0)
    )
    a = audit_plan(out)
    assert a["n_broadcast_joins"] >= 1, a["plan"]
    assert not a["has_cartesian"]


def test_zscore_stats_join_is_broadcast(spark, sf):
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.timeseries import zscore_anomalies

    out = zscore_anomalies(load_tables(spark, sf).events, "event_type", "value")
    a = audit_plan(out)
    assert a["n_broadcast_joins"] >= 1 and a["n_sortmerge_joins"] == 0, a["plan"]


def test_keyword_search_topk_and_no_cartesian_rows(spark, sf):
    """TF-IDF probe: top-k must be TakeOrderedAndProject; the only
    nested-loop join allowed is the 1-row corpus-count broadcast."""
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.curation import tfidf_keyword_search

    out = tfidf_keyword_search(load_tables(spark, sf).documents, ["spark", "join"])
    a = audit_plan(out)
    assert a["top_k"], a["plan"]
    assert not a["has_cartesian"], a["plan"]


def test_kmeans_assign_is_projection_only(spark, sf):
    """Cluster assignment must add zero shuffles over the scan — it is
    the partitionBy(cluster) layout path."""
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.similarity import IVFIndex, kmeans_assign

    emb = load_tables(spark, sf).embeddings
    index = IVFIndex.train(emb, k=4, seed=42, id_col="vec_id")
    a = audit_plan(kmeans_assign(emb, index))
    assert a["n_shuffles"] == 0, a["plan"]
    assert a["whole_stage_codegen"]


def test_minhash_verified_no_text_in_estimate_phase(spark, sf):
    """The estimate-prune phase must join signatures only — the text
    column may appear exclusively under the (bounded) exact-verify
    scan, never in the banding/estimate joins."""
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_estimate_jaccard,
        minhash_signatures,
    )

    docs = load_tables(spark, sf).documents
    sigs = minhash_signatures(docs)
    est = minhash_estimate_jaccard(minhash_candidate_pairs(sigs), sigs)
    a = audit_plan(est)
    assert not a["has_cartesian"]
    # both scans under this plan prune to (doc_id, text) -> signature;
    # the estimate join itself moves sig arrays, bounded at 1 KB/doc
    assert a["partial_agg"], a["plan"]


def test_dup_passages_topk_no_cartesian_partial_agg(spark, sf):
    """Passage mining must stay a hash-agg + top-k: never a self-join
    or cartesian, map-side combine on the gram aggregate, and the final
    top-k as TakeOrderedAndProject (no global sort of all grams)."""
    from airflow_spark.operators.registry import op_dup_passages

    a = audit_plan(op_dup_passages(spark, sf), execute=True)
    assert not a["has_cartesian"], a["plan"]
    assert a["partial_agg"], a["plan"]
    assert a["top_k"], a["plan"]


def test_distribution_drift_single_wide_shuffle(spark, sf):
    """PSI is one groupBy(group, bin) over the events (partial agg
    before the exchange); the midpoint lookup and the bin-restoring
    join operate on tiny frames (broadcast, no cartesian on the big
    side beyond the 1-row stats frame)."""
    from airflow_spark.operators.registry import op_distribution_drift

    a = audit_plan(op_distribution_drift(spark, sf), execute=True)
    assert a["partial_agg"], a["plan"]
    assert a["n_broadcast_joins"] >= 1, a["plan"]


def test_bm25_no_cartesian_stats_broadcast(spark, sf):
    from airflow_spark.operators.registry import op_bm25_search

    a = audit_plan(op_bm25_search(spark, sf))
    assert not a["has_cartesian"], a["plan"]
    # N/avgdl single-row stats and df(t) both arrive via broadcast
    assert a["n_broadcast_joins"] >= 1 or "BroadcastNestedLoopJoin" in a["plan"]
    assert a["partial_agg"]


def test_quantile_bins_no_global_window(spark, sf):
    from airflow_spark.operators.registry import op_quantile_bins

    a = audit_plan(op_quantile_bins(spark, sf))
    # bucket assignment must be a projection against broadcast bounds —
    # a global ntile-style Window over a single partition would show up
    # as "Window" + Exchange SinglePartition
    assert "Window" not in a["plan"], a["plan"]
    assert a["partial_agg"]


def test_zorder_is_projection_only(spark, sf):
    from airflow_spark.operators.registry import op_zorder

    a = audit_plan(op_zorder(spark, sf))
    assert a["n_shuffles"] == 0, a["plan"]  # top-k over a pure projection
    assert a["top_k"]


def test_scd2_single_join_no_reexecution(spark, sf):
    from airflow_spark.operators.registry import op_scd2_merge

    # union branches must NOT re-run the join (formatted physical plans
    # print every node twice — tree + details — so count in the
    # optimized logical plan)
    plan = (
        op_scd2_merge(spark, sf)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Join") == 1, plan


def test_fuzzy_join_no_cartesian(spark, sf):
    from airflow_spark.operators.registry import op_fuzzy_join

    a = audit_plan(op_fuzzy_join(spark, sf))
    assert not a["has_cartesian"] and not a["has_bnl_join"], a["plan"]


def test_profile_single_aggregate_pass(spark, sf):
    from airflow_spark.operators.registry import op_profile

    a = audit_plan(op_profile(spark, sf))
    # one scan of orders: the wide agg + unpivot must not rescan per column
    import re

    n_scans = len(re.findall(r"(?:FileScan|\(\d+\) Scan) parquet", a["plan"]))
    assert n_scans == 1, a["plan"]


def test_label_outliers_no_explode_in_corpus_pass(spark, sf):
    from airflow_spark.operators.registry import op_label_outliers

    a = audit_plan(op_label_outliers(spark, sf))
    # centroids join the corpus via broadcast; top-k is TakeOrdered
    assert "BroadcastHashJoin" in a["plan"], a["plan"]
    assert a["top_k"], a["plan"]
    assert "CartesianProduct" not in a["plan"]


def test_winsorize_bounds_join_is_broadcast(spark, sf):
    from airflow_spark.operators.registry import op_winsorize

    a = audit_plan(op_winsorize(spark, sf))
    assert "BroadcastHashJoin" in a["plan"], a["plan"]
    assert "CartesianProduct" not in a["plan"]


def test_gap_fill_no_cartesian(spark, sf):
    from airflow_spark.operators.registry import op_gap_fill

    a = audit_plan(op_gap_fill(spark, sf))
    assert "CartesianProduct" not in a["plan"]
    assert "BroadcastNestedLoopJoin" not in a["plan"]


def test_q31_dims_broadcast_no_cartesian(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q31"](spark, sf))
    assert a["n_broadcast_joins"] >= 2, a["plan"]  # nation/region at least
    assert not a["has_cartesian"], a["plan"]
    assert a["partial_agg"], a["plan"]


def test_q32_shipdate_filter_pushed(spark, sf):
    a = audit_plan(RELATIONAL_QUERIES["q32"](spark, sf))
    joined = " ".join(a["pushed_filters"])
    assert "l_shipdate" in joined or "o_orderdate" in joined, a["plan"]
    assert a["top_k"], a["plan"]


def test_rollup_refresh_tail_scan_is_filtered(spark, sf, tmp_path):
    """Incremental refresh must push the high-water timestamp filter
    into the raw scan — the property that makes maintenance cost track
    arrival rate, not corpus size."""
    from airflow_spark.catalog import load_tables
    from airflow_spark.operators import rollup

    events = load_tables(spark, sf).events
    path = str(tmp_path / "r")
    rollup.refresh_rollup(spark, events, path)
    hw = spark.read.parquet(path).agg({"bucket": "max"}).first()[0]
    from pyspark.sql import functions as F

    tail = events.where(
        F.col("ts") >= F.lit(hw) + F.expr("INTERVAL 1 SECOND")
    )
    a = audit_plan(rollup.bucket_aggregate(tail))
    joined = " ".join(a["pushed_filters"])
    assert "ts" in joined, a["plan"]
    assert a["partial_agg"], a["plan"]


# ---------------------------------------------------------------------------
# plan linter (plans/lint.py)
# ---------------------------------------------------------------------------


def test_lint_flags_cross_and_bnl_joins(spark):
    from airflow_spark.plans.lint import lint_plan

    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    codes = {f["code"] for f in lint_plan(a.crossJoin(b))}
    assert codes & {"cartesian-product", "bnl-join"}


def test_lint_flags_global_window_but_not_topk(spark):
    from pyspark.sql import Window

    from airflow_spark.plans.lint import lint_plan

    df = spark.range(100).select(F.col("id").alias("x"))
    w = Window.orderBy("x")
    bad = df.select("x", F.row_number().over(w).alias("r"))
    assert "single-partition-sort" in {f["code"] for f in lint_plan(bad)}
    # orderBy+limit compiles to TakeOrderedAndProject: no finding
    ok = df.orderBy("x").limit(5)
    assert "single-partition-sort" not in {f["code"] for f in lint_plan(ok)}


def test_lint_flags_row_udf_not_builtin(spark):
    from pyspark.sql.functions import udf

    from airflow_spark.plans.lint import lint_plan

    df = spark.range(10).select(F.col("id").alias("x"))
    assert "python-row-udf" in {
        f["code"] for f in lint_plan(df.select(udf(lambda v: v + 1)("x")))
    }
    assert "python-row-udf" not in {
        f["code"] for f in lint_plan(df.select((F.col("x") + 1).alias("y")))
    }


def test_lint_flags_unpushed_filter_only_when_all_scans_weak(spark, sf_smoke):
    from airflow_spark.plans.lint import lint_plan

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    # expression on the column blocks pushdown (IsNotNull-only)
    weak = docs.where(F.expr("doc_id % 2 = 0"))
    assert "unpushed-filter" in {f["code"] for f in lint_plan(weak)}
    # raw-column comparison pushes: clean
    pushed = docs.where(F.col("doc_id") < 50)
    assert "unpushed-filter" not in {f["code"] for f in lint_plan(pushed)}
    # a union where ANOTHER scan pushed the comparison: not flagged
    u = pushed.unionAll(docs)
    assert "unpushed-filter" not in {f["code"] for f in lint_plan(u)}


def test_lint_registry_queries_are_clean(spark, sf_smoke):
    """The declared relational contract ships lint-clean plans (the
    linter agreeing with the hand-audited plan tests above)."""
    from airflow_spark.plans.lint import lint_plan
    from airflow_spark.queries import RELATIONAL_QUERIES

    for name in ("q01", "q05", "q12", "q15", "q31", "q32"):
        findings = [
            f
            for f in lint_plan(RELATIONAL_QUERIES[name](spark, sf_smoke))
            if f["severity"] in ("critical", "high")
        ]
        assert not findings, (name, findings)


def test_assert_clean_raises_with_rendered_findings(spark):
    import pytest as _pytest

    from airflow_spark.plans.lint import assert_clean

    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    with _pytest.raises(AssertionError, match="plan lint"):
        assert_clean(a.crossJoin(b))
    assert_clean(a.crossJoin(b), allow={"bnl-join", "cartesian-product"})


# ---------------------------------------------------------------------------
# column lineage (plans/lineage.py)
# ---------------------------------------------------------------------------


def test_lineage_projection_and_expressions(spark, sf_smoke):
    from airflow_spark.plans.lineage import column_lineage

    n = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    d = n.select(
        (F.col("n_nationkey") + 1).alias("k2"),
        F.concat_ws("-", "n_name", F.col("n_regionkey").cast("string")).alias("label"),
    )
    lin = column_lineage(d)
    assert lin["k2"] == ["n_nationkey"]
    assert lin["label"] == ["n_name", "n_regionkey"]


def test_lineage_join_agg_and_inverse(spark, sf_smoke):
    from airflow_spark.plans.lineage import affected_columns, column_lineage

    n = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    r = spark.read.parquet(f"{sf_smoke}/region.parquet")
    d = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_name").alias("n_nations"),
            F.max("n_nationkey").alias("max_key"),
        )
    )
    lin = column_lineage(d)
    assert lin == {
        "r_name": ["r_name"],
        "n_nations": ["n_name"],
        "max_key": ["n_nationkey"],
    }
    assert affected_columns(d, "n_name") == ["n_nations"]
    assert affected_columns(d, "r_regionkey") == []  # join key only


def test_lineage_window_explode_union(spark, sf_smoke):
    from pyspark.sql import Window

    from airflow_spark.plans.lineage import column_lineage

    n = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    r = spark.read.parquet(f"{sf_smoke}/region.parquet")

    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    lin_w = column_lineage(n.select("n_name", F.row_number().over(w).alias("rk")))
    assert lin_w["rk"] == ["n_nationkey", "n_regionkey"]

    lin_g = column_lineage(
        n.select("n_nationkey", F.explode(F.split("n_name", "A")).alias("part"))
    )
    assert lin_g["part"] == ["n_name"]

    lin_u = column_lineage(
        n.select(F.col("n_name").alias("x")).unionAll(
            r.select(F.col("r_name").alias("x"))
        )
    )
    assert lin_u["x"] == ["n_name", "r_name"]  # both union branches


def test_lineage_on_flagship_query(spark, sf_smoke):
    """Lineage over the real 6-way-join flagship stays traceable."""
    from airflow_spark.plans.lineage import column_lineage
    from airflow_spark.queries import RELATIONAL_QUERIES

    lin = column_lineage(RELATIONAL_QUERIES["q31"](spark, sf_smoke))
    assert "n_name" in lin and lin["n_name"] == ["n_name"]
    # revenue derives from lineitem price and discount
    rev_col = next(c for c in lin if "rev" in c.lower())
    assert set(lin[rev_col]) >= {"l_extendedprice", "l_discount"}


# ---------------------------------------------------------------------------
# size estimates / broadcast advice (plans/stats.py)
# ---------------------------------------------------------------------------


def test_estimated_size_and_broadcast_advice(spark, sf_smoke):
    from airflow_spark.plans.stats import (
        broadcast_if_small,
        estimated_size_bytes,
        should_broadcast,
    )

    nation = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    lineitem = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    n_size = estimated_size_bytes(nation)
    assert 0 < n_size < 1_000_000          # tiny dim, sane estimate
    assert estimated_size_bytes(lineitem) > n_size
    assert should_broadcast(nation)         # under default 10 MB
    assert not should_broadcast(nation, threshold_bytes=-1)
    assert not should_broadcast(nation, threshold_bytes=10)

    # hint applied only when safe: the join plan broadcasts the dim
    from airflow_spark.plans.audit import audit_plan

    j = lineitem.join(
        broadcast_if_small(nation),
        lineitem.l_suppkey % 25 == nation.n_nationkey,
    )
    assert audit_plan(j)["n_broadcast_joins"] >= 1
    # over-threshold side: hint NOT applied (falls back to plain frame)
    assert broadcast_if_small(nation, threshold_bytes=10) is not None
