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
