"""Plan-shape regression tests: the scale-critical physical-plan
properties (pushdown, pruning, broadcast, top-k, partial agg) are
asserted, not hoped for."""

from __future__ import annotations

import pytest

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
