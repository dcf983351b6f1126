"""Filesystem scan source (S7): directory listing as a DataFrame.

Reference analog: ``os.walk("./data")`` + ``getmtime`` predicate
(dags/Airflow_Cleanup.py:46-54). Spark's ``binaryFile`` source lists
distributed storage (path, modificationTime, length) with partition
parallelism — the listing itself scales; with ``with_content=False``
(default) file bytes are never read, only metadata.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def filesystem_scan(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    with_content: bool = False,
) -> DataFrame:
    """(path, mtime, length[, content]) rows for every file under
    ``path``."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    cols = [
        F.col("path"),
        F.col("modificationTime").alias("mtime"),
        F.col("length"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)


def expired_files(files: DataFrame, cutoff: dt.datetime) -> DataFrame:
    """Retention predicate (P8): files older than the cutoff (K4 feeds
    these to a guarded delete sink)."""
    return files.where(F.col("mtime") < F.lit(cutoff.replace(tzinfo=None)))
