"""Parquet catalog: load the testdata star schema as DataFrames/views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under an
``sf_dir``.

Normalization applied at the catalog boundary (so every consumer sees
clean types):

- ``events.ts`` is parquet TIMESTAMP(NANOS); Spark 4.x hard-errors on it
  (PARQUET_TYPE_ILLEGAL). With ``spark.sql.legacy.parquet.nanosAsLong``
  we read it as a long and rebuild a µs timestamp via
  ``timestamp_micros(ts div 1000)``. The DuckDB oracle casts the same
  column to µs TIMESTAMP, so both engines see identical values.
  (Verified row-for-row over sf0.01; see SURVEY.md §2.12.)

This is a projection, not a shuffle — at 100 TB it fuses into the scan
inside WholeStageCodegen, and column pruning / predicate pushdown still
reach the parquet reader for every other column.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import normalize_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with catalog normalization applied."""
    normalize_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-as-long → µs timestamp (see module docstring).
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Load every table present in ``sf_dir``; attribute access by name."""
    out = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return SimpleNamespace(**out)


def register_views(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Create/replace a temp view per table; returns the DataFrames too."""
    tables = load_tables(spark, sf_dir)
    for name, df in vars(tables).items():
        df.createOrReplaceTempView(name)
    return tables
