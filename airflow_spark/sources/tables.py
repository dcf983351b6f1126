"""Table sinks: partitioned parquet writes and small-file compaction.

The engine's bulk sink (REST sinks in http.py are for small
control-plane results). Layout rules for 100 TB:

- partition by low-cardinality time/tenant columns so readers prune
  (`PartitionFilters` in the scan),
- size files near the reader's split size (small files are the #1
  operational failure of big parquet lakes) — ``compact`` rewrites a
  partition tree to target file counts based on measured bytes.

LOCAL-FILESYSTEM CONTRACT: ``upsert_parquet`` / ``compact`` use the
os.rename directory swap, and ``table_bytes`` walks the driver's
filesystem — plain parquet has no transaction log, so this module's
swap discipline only holds where rename is atomic (one local/NFS
filesystem). On object stores, run the identical merge plans against
a table format with a log (Delta/Iceberg) instead; the read/merge
shapes here transfer unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_file_bytes: int = 128 * 1024 * 1024,
    rows_per_byte_hint: float | None = None,
) -> None:
    """Write parquet partitioned by ``partition_by``. Within each
    partition directory files are right-sized: with
    ``rows_per_byte_hint`` (bytes per row, e.g. from a prior table's
    size/rows) each directory gets ``ceil(rows·bytes_per_row /
    target_file_bytes)`` tasks via a per-partition salt — a skewed
    500 GB partition becomes ~4000 x 128 MB files instead of one file
    per directory. Without the hint, rows of one partition co-locate
    in one task (few large files — fine for balanced partitions)."""
    if not partition_by:
        df.write.mode(mode).parquet(path)
        return
    cols = [F.col(c) for c in partition_by]
    if rows_per_byte_hint:
        counts = (
            df.groupBy(*partition_by)
            .agg(F.count(F.lit(1)).alias("__rows"))
            .select(
                *partition_by,
                F.greatest(
                    F.ceil(
                        F.col("__rows")
                        * F.lit(float(rows_per_byte_hint))
                        / F.lit(float(target_file_bytes))
                    ),
                    F.lit(1),
                ).cast("int").alias("__nf"),
            )
        )
        # null-safe join: an inner equi-join would silently DROP every
        # row whose partition key is NULL (they belong in
        # __HIVE_DEFAULT_PARTITION__, not in /dev/null)
        cond = None
        for c in partition_by:
            e = df[c].eqNullSafe(counts[c])
            cond = e if cond is None else cond & e
        salted = (
            df.join(F.broadcast(counts), cond)
            .drop(*[counts[c] for c in partition_by])
            .withColumn(
                "__salt",
                F.pmod(F.xxhash64(*df.columns), F.col("__nf")).cast("int"),
            )
        )
        w = salted.repartition(*cols, F.col("__salt")).drop("__nf", "__salt")
    else:
        # co-locate rows of one output partition in one task so each
        # directory gets few, large files instead of tasks x dirs shards
        w = df.repartition(*cols)
    w.write.mode(mode).partitionBy(*partition_by).parquet(path)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str | list[str],
) -> int:
    """Keyed upsert into a parquet table (K1 idempotent-upsert
    semantics at table scale): rows in ``updates`` replace same-key
    rows; others are kept; new keys are inserted. Returns final count.

    Plain parquet has no transaction log, so this is read-merge-swap:
    anti-join the existing table against the update keys (one shuffle
    on the key), union the updates, write to a temp dir, swap. At
    serious scale the same merge runs per partition-directory, or on a
    table format with a log (Delta/Iceberg) — the merge plan is
    identical.
    """
    keys = [key] if isinstance(key, str) else list(key)
    exists = os.path.isdir(path) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(path) for f in fs
    )
    if exists:
        current = spark.read.parquet(path)
        kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    tmp = path.rstrip("/") + ".__upsert__"
    merged.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    if exists:
        bak = path.rstrip("/") + ".__old__"
        os.rename(path, bak)
        os.rename(tmp, path)
        import shutil

        shutil.rmtree(bak)
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        os.rename(tmp, path)
    return n


def table_bytes(spark: SparkSession, path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _looks_partitioned(path: str) -> bool:
    """True when the tree's first level contains key=value directories
    (local-path heuristic; remote callers pass partition_by anyway)."""
    try:
        return any(
            "=" in d and os.path.isdir(os.path.join(path, d))
            for d in os.listdir(path)
        )
    except OSError:
        return False


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet tree into ~bytes/target files (returns the new
    file count). Reads its own footprint to decide the output width —
    measure, don't guess. A Hive-partitioned tree MUST pass its
    ``partition_by`` columns: rewriting it flat would destroy the
    directory layout (readers lose partition pruning) and let partition
    discovery re-type key values — detected and raised, never silent."""
    size = table_bytes(spark, path)
    n_files = max(1, round(size / target_file_bytes))
    if partition_by is None and _looks_partitioned(path):
        raise ValueError(
            f"compact: {path} is Hive-partitioned (key=value dirs); "
            "pass partition_by to preserve the layout"
        )
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact__"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    # atomic-ish swap (same filesystem)
    bak = path.rstrip("/") + ".__old__"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(bak)
    return n_files


def write_dataset_with_manifest(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
    sort_within_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Publish a dataset directory plus a ``_manifest.json`` the next
    pipeline stage (or another engine) can consume without listing +
    footer-reading the tree: per-file bytes, file count, total rows,
    format, sort order.

    - ``fmt``: ``parquet`` or ``orc`` (both native columnar formats —
      no extra packages).
    - ``max_records_per_file`` bounds file row counts
      (``maxRecordsPerFile``) so downstream split sizing is stable.
    - ``sort_within_by`` sorts *within* each task (no global sort, no
      extra shuffle) — e.g. by document length so sequence packing
      reads near-sorted input and parquet/orc RLE compresses better.

    Returns the manifest dict. The row count is taken from a count on
    the written data (columnar footer metadata makes it cheap), not
    the input plan — the manifest describes what is actually on disk.
    """
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"fmt must be parquet or orc, got {fmt!r}")
    w = df
    if sort_within_by:
        cols = (
            [sort_within_by] if isinstance(sort_within_by, str) else sort_within_by
        )
        w = w.sortWithinPartitions(*cols)
    writer = w.write.mode(mode).format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.save(path)

    spark = df.sparkSession
    files = []
    for root, _dirs, fs in os.walk(path):
        for f in sorted(fs):
            if f.endswith(f".{fmt}"):
                full = os.path.join(root, f)
                files.append(
                    {
                        "path": os.path.relpath(full, path),
                        "bytes": os.path.getsize(full),
                    }
                )
    manifest = {
        "format": fmt,
        "n_files": len(files),
        "total_bytes": sum(f["bytes"] for f in files),
        "total_rows": spark.read.format(fmt).load(path).count(),
        "sorted_within_files_by": sort_within_by,
        "files": files,
    }
    import json

    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def read_manifest(path: str) -> dict:
    import json

    with open(os.path.join(path, "_manifest.json")) as fh:
        return json.load(fh)
