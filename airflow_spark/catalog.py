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


#: (app id, sf_dir, name) → DataFrame. DataFrames are immutable
#: lazy plans, so caching them across queries is safe and removes
#: repeated file-listing/footer reads (measurable driver latency when a
#: registry of 40+ queries each re-opens its inputs). Keyed by the
#: session's applicationId, NOT id(spark): a recycled object address
#: after session.stop() would hand a new session plans bound to the
#: dead SparkContext.
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with catalog normalization applied (cached)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    normalize_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-as-long → µs timestamp (see module docstring).
        # INTEGER division: Column `/` is double, which cannot represent
        # ns epochs (~1.7e18 > 2^53) exactly — rows near a microsecond
        # boundary would land 1 us off the true ts div 1000
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _CACHE[key] = df
    return df


class Tables:
    """Lazy table namespace: a table's parquet is only opened when the
    attribute is touched, so a query pays for the 1-3 tables it uses,
    not the whole catalog."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)

    def available(self) -> list[str]:
        return [
            n
            for n in TABLE_NAMES
            if os.path.exists(os.path.join(self._sf_dir, f"{n}.parquet"))
        ]


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    """Lazy namespace over every table in ``sf_dir``."""
    return Tables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """Create/replace a temp view per present table; returns them."""
    t = Tables(spark, sf_dir)
    out = {}
    for name in t.available():
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return SimpleNamespace(**out)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run arbitrary Spark SQL against the catalog (views registered
    on demand) — the drop-in path for users migrating SQL workloads."""
    register_views(spark, sf_dir)
    return spark.sql(query)
