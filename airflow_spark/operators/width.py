"""Scan-width guard for per-row-heavy operators.

Small inputs arrive as 1-2 partitions (one parquet file), so an
explode / k-way-hash / wide-projection operator would run on one core
no matter how many the session has. ``ensure_wide`` repartitions up to
the cluster's default parallelism — a trivial shuffle at small scale
(the whole input is one file), an explicit NO-OP at 100 TB where the
scan is already wide (the file-count probe short-circuits before any
shuffle is added to the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_wide(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Repartition a narrow scan to the session's core count.

    Lineage-safe width probe: count source files from the analyzed
    plan (no .rdd conversion, no job). Plenty of files → the scan is
    already wide; a derived frame (no leaf files) has already passed a
    shuffle at ``spark.sql.shuffle.partitions`` width — leave both be.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n_files = len(df.inputFiles())
    if n_files == 0 or n_files >= max(2, target // 2):
        return df
    return df.repartition(target, id_col) if id_col else df.repartition(target)
