"""Streaming CDC: apply a change feed into an SCD2 history table.

The public "APPLY CHANGES INTO" pattern re-expressed with native
building blocks: a Structured-Streaming change feed is folded into a
parquet-backed type-2 history via ``foreachBatch`` — each micro-batch
is (1) deduplicated latest-wins per key, (2) merged with
``versioning.scd2_apply_changes`` (one full-outer join, keys absent
from the batch untouched), and (3) the new history is swapped in
atomically (write to a versioned directory, then flip; readers of the
old version are unaffected — same swap discipline as
``dedup.incremental_neardup``). The versioned-directory store is a
LOCAL-FILESYSTEM design (os-level listing + rename): on object
stores, point the same fold at a Delta/Iceberg table instead.

Exactly-once: the stream checkpoint records the batch offset; a
re-delivered batch re-merges idempotently (same run_ts + latest-wins
dedup ⇒ identical history).

At 100 TB the history's ``is_current`` partition is the only join
input; keep it bucketed by the key so each batch-merge is a
zero-Exchange join against a few-GB current set.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import versioning


def latest_per_key(
    changes: DataFrame, key_cols: Sequence[str], seq_col: str
) -> DataFrame:
    """Latest-wins dedup of a change batch: keep the row with the
    highest ``seq_col`` per key (ties broken deterministically by the
    remaining columns via the row_number ordering)."""
    # tie-break: equal seq values must pick the SAME row on replay, or
    # checkpoint-recovery redelivery diverges the history — order by
    # every remaining column after the sequence
    from pyspark.sql import types as T

    unorderable = (T.MapType,)
    others = [
        f.name
        for f in changes.schema.fields
        if f.name != seq_col
        and f.name not in key_cols
        and not isinstance(f.dataType, unorderable)
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), *[F.col(c).desc_nulls_last() for c in others]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _history_version_dirs(base: str) -> list[str]:
    if not os.path.isdir(base):
        return []
    # NUMERIC sort: lexicographic would put 'v9' after 'v10' and freeze
    # the history at v9 forever once ten versions exist
    return sorted(
        (d for d in os.listdir(base) if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]),
    )


def current_history_path(base: str) -> str | None:
    vs = _history_version_dirs(base)
    return os.path.join(base, vs[-1]) if vs else None


def apply_changes_batch(
    spark: SparkSession,
    batch: DataFrame,
    history_base: str,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    seq_col: str,
    run_ts: str,
    delete_col: str | None = None,
) -> str:
    """Merge one change batch into the versioned history under
    ``history_base`` and return the new version path."""
    cur = current_history_path(history_base)
    out_cols = [*key_cols, *compare_cols, "valid_from", "valid_to", "is_current"]
    if cur is None:
        history = (
            batch.select(*key_cols, *compare_cols)
            .limit(0)
            .withColumn("valid_from", F.lit(None).cast("timestamp"))
            .withColumn("valid_to", F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(True))
            .select(*out_cols)
        )
        next_v = 0
    else:
        history = spark.read.parquet(cur)
        next_v = int(os.path.basename(cur)[1:]) + 1
    deduped = latest_per_key(batch, key_cols, seq_col)
    merged = versioning.scd2_apply_changes(
        history, deduped, key_cols, compare_cols, run_ts, delete_col=delete_col
    )
    out = os.path.join(history_base, f"v{next_v}")
    merged.write.mode("overwrite").parquet(out)
    return out


def scd2_stream(
    changes: DataFrame,
    history_base: str,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    seq_col: str,
    checkpoint_dir: str,
    run_ts_of_batch,
    delete_col: str | None = None,
    timeout_s: float = 300.0,
) -> bool:
    """Fold a streaming change feed into the SCD2 history: one
    ``foreachBatch`` merge per micro-batch. ``run_ts_of_batch`` maps
    ``batch_id -> ISO timestamp`` (injected — never wall-clock — so
    replays are deterministic). ``availableNow`` drain semantics."""

    def _on_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_changes_batch(
            batch.sparkSession,
            batch,
            history_base,
            key_cols,
            compare_cols,
            seq_col,
            run_ts_of_batch(batch_id),
            delete_col=delete_col,
        )

    q = (
        changes.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q.awaitTermination(timeout_s)


def versions(base: str) -> list[int]:
    """Retained version numbers of a versioned history store,
    ascending (footer-only: a directory listing, no data read)."""
    return [int(d[1:]) for d in _history_version_dirs(base)]


def read_version(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Time-travel by VERSION: read a specific retained ``v<N>`` of a
    versioned history store (``None`` → latest). Readers of an older
    version are unaffected by later atomic swaps — the rename-swap
    store never mutates a published directory."""
    vs = versions(base)
    if not vs:
        raise FileNotFoundError(f"no versions under {base}")
    v = vs[-1] if version is None else int(version)
    if v not in vs:
        raise FileNotFoundError(
            f"version v{v} not retained under {base} (have {vs})"
        )
    return spark.read.parquet(os.path.join(base, f"v{v}"))


def snapshot_asof(history: DataFrame, ts) -> DataFrame:
    """Time-travel by TIMESTAMP over an SCD2 history: reconstruct the
    table exactly as it stood at ``ts`` — rows whose validity interval
    covers the instant (valid_from ≤ ts, and ts < valid_to or still
    open). A pure partition-prunable filter: no join, no window; at
    100 TB this is the reason to keep SCD2 history instead of nightly
    full copies."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("is_current")
