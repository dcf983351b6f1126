"""t2 correctness: every declared relational query hash-matches DuckDB.

Runs at sf0.001 for speed in CI; the driver runs the same contract at
sf0.01 (verified separately). Marked queries with empty-at-sf0.001
results still check row-count equality (both engines agree on empty).
"""

from __future__ import annotations

import pytest

from airflow_spark.oracle import compare
from airflow_spark.queries import ORACLE_SQL, RELATIONAL_QUERIES


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_query_matches_oracle(spark, sf_smoke, name):
    fn = RELATIONAL_QUERIES[name]
    rec = compare(spark, sf_smoke, name, fn(spark, sf_smoke), ORACLE_SQL[name])
    assert rec["ok"], rec


def _operator_oracle_names():
    from airflow_spark.operators.registry import OPERATOR_ORACLE_SQL

    return sorted(OPERATOR_ORACLE_SQL)


@pytest.mark.parametrize("name", _operator_oracle_names())
def test_operator_matches_oracle(spark, sf_smoke, name):
    from airflow_spark.operators import registry

    sql = registry.OPERATOR_ORACLE_SQL[name]
    data_derived = {
        "op_similarity_ivf": lambda: registry._sql_similarity_ivf(
            k_cells=8, n_probe=3
        ),
        "op_kmeans_cluster": lambda: registry._sql_kmeans_cluster(k_cells=8),
        "op_similarity_pq": lambda: registry._sql_similarity_pq(
            m=8, ksub=16, k=10
        ),
        "op_bpe_tokenize": lambda: registry._sql_bpe_tokenize(n_merges=40),
        "op_token_fertility": lambda: registry._sql_token_fertility(
            n_merges=40
        ),
    }
    if name in data_derived:
        # data-derived oracle: centroid literals must be retrained on
        # THIS sf (the module-level default is the driver's sf0.01)
        import os

        os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_smoke
        try:
            sql = data_derived[name]()
        finally:
            del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]

    fn = registry.OPERATOR_QUERIES[name]
    rec = compare(spark, sf_smoke, name, fn(spark, sf_smoke), sql)
    assert rec["ok"], rec


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"n_name", "revenue"}


def test_registry_alignment():
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs), "oracle_sql keys must be a subset of queries"
    assert len(qs) >= 30


def test_catalog_sql_passthrough(spark, sf_smoke):
    from airflow_spark.catalog import sql

    df = sql(
        spark, sf_smoke,
        "SELECT n.n_name, count(*) AS cnt FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name ORDER BY cnt DESC, n.n_name LIMIT 3",
    )
    rows = df.collect()
    assert len(rows) == 3 and rows[0]["cnt"] >= rows[-1]["cnt"]


def test_oracle_memo_plans_equivalent(sf_smoke):
    """The local-harness memo rewrite (materialize the shared
    recursive-closure prefix once, run the tails over a ``__memo``
    view) must produce byte-identical normalized results to the
    self-contained driver-facing oracle strings."""
    from airflow_spark.oracle import duckdb_connection, value_hash
    from airflow_spark.operators.registry import (
        OPERATOR_ORACLE_SQL,
        oracle_memo_plans,
    )

    plans = oracle_memo_plans()
    assert set(plans) == {
        "op_dedup_collapse",
        "op_dedup_survivors",
        "op_dedup_minhash",
    }
    for name, (key, materialize_sql, rewritten_sql) in plans.items():
        con = duckdb_connection(sf_smoke)
        try:
            plain = con.execute(OPERATOR_ORACLE_SQL[name])
            p_cols = [d[0] for d in plain.description]
            p_rows = [tuple(r) for r in plain.fetchall()]
            con.register("__memo", con.execute(materialize_sql).arrow())
            rew = con.execute(rewritten_sql)
            r_cols = [d[0] for d in rew.description]
            r_rows = [tuple(r) for r in rew.fetchall()]
        finally:
            con.close()
        assert p_cols == r_cols, name
        assert len(p_rows) == len(r_rows) > 0, name
        assert value_hash(p_cols, p_rows) == value_hash(r_cols, r_rows), name


def test_oracle_memo_cache_reused(spark, sf_smoke, monkeypatch):
    """compare(memo=...) must evaluate the materialize SQL only once
    per (sf_dir, key) across entries sharing the cache key — that is
    the whole point of the memo (the recursive closure dominated the
    sf0.1 verify chain when computed twice)."""
    from airflow_spark import oracle as omod

    monkeypatch.setattr(omod, "_MEMO_CACHE", {})
    n_materialize = 0
    mat_sql = "SELECT 1 AS a"

    class _CountingCon:
        def __init__(self):
            import duckdb

            self._con = duckdb.connect()

        def execute(self, sql, *a, **k):
            nonlocal n_materialize
            if sql == mat_sql:
                n_materialize += 1
            return self._con.execute(sql, *a, **k)

        def __getattr__(self, attr):
            return getattr(self._con, attr)

    def counting_connection(sf_dir):
        return _CountingCon()

    monkeypatch.setattr(omod, "duckdb_connection", counting_connection)
    sdf = spark.createDataFrame([(1,)], "a int")
    memo = ("k1", mat_sql, "SELECT a FROM __memo")
    for _ in range(3):
        rec = omod.compare(spark, sf_smoke, "fake", sdf, "unused", memo=memo)
        assert rec["ok"], rec
    assert n_materialize == 1
