"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (multi-way broadcast join + grouped
  agg) over sf0.001.
- ``queries()`` — every implemented operator: the declared relational
  queries (SURVEY.md §2.12, incl. the TPC-H analogs) plus the
  LLM-data-pipeline / analytics operators (dedup, similarity, text,
  graph, time-series, sketches, session analytics).
- ``oracle_sql()`` — DuckDB-runnable SQL per query; every registry
  entry carries one (approx sketches and the greedy MMR attest via
  derived checks — exact twins + accuracy-bound booleans).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the sibling package importable even when this file is loaded by
# path from a different working directory
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from airflow_spark.queries import ORACLE_SQL, RELATIONAL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q5 analog — 6-way join (two fact tables, four
    broadcast dims, local-supplier predicate), revenue per nation."""
    return RELATIONAL_QUERIES["q31"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    try:
        from airflow_spark.operators.registry import OPERATOR_QUERIES

        out.update(OPERATOR_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(ORACLE_SQL)
    try:
        from airflow_spark.operators.registry import OPERATOR_ORACLE_SQL

        out.update(OPERATOR_ORACLE_SQL)
    except ImportError:
        pass
    return out
