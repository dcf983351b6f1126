"""Column profiler: per-column statistics for data-quality audits.

``profile_columns`` computes, for each requested column, in ONE pass
over the data (a single wide aggregate row, unpivoted to long format
driver-side-free via an array+explode projection):

- ``n_rows``     — table row count
- ``n_nulls``    — nulls in the column
- ``n_distinct`` — exact distinct count
- ``min_val`` / ``max_val`` — extrema rendered as strings (profilers
  are heterogeneous by nature; the string form keeps one schema)

Scale notes: multiple exact ``count(distinct)`` aggregates in one pass
expand via Spark's ``Expand`` operator (rows × columns-profiled) — the
honest cost of exactness; pass ``approx=True`` to switch to
HyperLogLog ``approx_count_distinct`` (one pass, no expand) when
profiling very wide/huge tables. min/max/counts are map-side partial
aggregates either way.

Reference analog: the reference's ad-hoc payload presence checks
(e.g. /root/reference/dags/Backups.py:95-100) generalized to a table
profiler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Long-format profile: one output row per column in ``cols``."""
    if not cols:
        raise ValueError("profile_columns requires at least one column")
    n_distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nn_{c}"),
            n_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")
