"""Corpus/version diff operators: what changed between two snapshots.

A training-data pipeline republishes its corpus regularly; the first
question after every rebuild is "what actually changed?" — both for
audit (why did the token count move) and for incremental downstream
work (only re-embed the changed docs). ``snapshot_diff`` answers it
with one full-outer join on the key, comparing a fixed-width md5 of
the tracked columns instead of the columns themselves, so the shuffle
carries (key, 32-byte hash) rows — never document bodies.

Scale shape: two projections (hash is computed scan-side, column-pruned
to key + tracked cols) → one sort-merge full-outer join on the key.
No collects, no windows. At 100 TB both sides can be written bucketed
by the key, which turns the join shuffle into a zero-Exchange merge.

Reference analog: none (the reference keeps no corpus versions); this
is a north-star LLM-pipeline extension (SURVEY.md §2 M5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Field separator for the row hash — a control char that cannot appear
#: in normalized text, so ("ab","c") never collides with ("a","bc").
_SEP = "\x1f"
#: Null sentinel, distinct from the empty string.
_NULL = "\x00null"


def _row_hash(cols: Sequence[str]) -> F.Column:
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two corpus snapshots keyed by ``key_cols``:

    - ``added``     — key present only in ``new``
    - ``removed``   — key present only in ``old``
    - ``changed``   — key in both, tracked columns differ
    - ``unchanged`` — key in both, tracked columns equal
      (emitted only when ``include_unchanged=True``)

    Keys must be unique per snapshot (it is a snapshot, not a log);
    duplicate keys would cross-join in the full-outer and inflate the
    diff. Output: key columns + ``status``.
    """
    if not key_cols or not compare_cols:
        raise ValueError("snapshot_diff requires key_cols and compare_cols")
    # null-safe key equality (like the scd2 functions below): a plain
    # USING join never matches NULL keys, which would report a phantom
    # removed+added pair for an unchanged (NULL, ...)-keyed row
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        _row_hash(compare_cols).alias("__h_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        _row_hash(compare_cols).alias("__h_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per diff status — the one-line audit record a rebuild
    job logs (and alerts on when `removed` spikes)."""
    return (
        diff.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    run_ts: str,
    delete_col: str | None = None,
) -> DataFrame:
    """CDC variant of :func:`scd2_merge`: fold a PARTIAL change feed
    (upserts, optionally tombstones) into the history. Keys absent from
    ``changes`` are untouched — unlike ``scd2_merge``, absence does NOT
    mean deletion; deletes arrive explicitly as rows with
    ``delete_col = true`` (the public "apply changes into" contract).

    ``changes`` must carry one row per key (latest-wins dedup is the
    caller's job — e.g. a window max over an event-sequence column).
    Same single-join array+explode execution shape as ``scd2_merge``.
    """
    if not key_cols or not compare_cols:
        raise ValueError("scd2_apply_changes requires key_cols and compare_cols")
    out_cols = [*key_cols, *compare_cols, "valid_from", "valid_to", "is_current"]
    ts = F.to_timestamp(F.lit(run_ts))

    current = history.where(F.col("is_current"))
    closed = history.where(~F.col("is_current")).select(*out_cols)

    o = current.select(
        *[F.col(c).alias(f"__o_{c}") for c in (*key_cols, *compare_cols)],
        F.col("valid_from").alias("__o_valid_from"),
        _row_hash(compare_cols).alias("__h_old"),
    )
    n_cols = [
        *[F.col(c).alias(f"__n_{c}") for c in (*key_cols, *compare_cols)],
        _row_hash(compare_cols).alias("__h_new"),
        (
            F.col(delete_col) if delete_col else F.lit(False)
        ).alias("__del"),
    ]
    n = changes.select(*n_cols)
    cond = [o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"]) for k in key_cols]
    j = o.join(n, on=cond, how="full_outer")

    def _row(side: str, valid_from: F.Column, valid_to, is_current: bool) -> F.Column:
        return F.struct(
            *[F.col(f"__{side}_{c}").alias(c) for c in (*key_cols, *compare_cols)],
            valid_from.alias("valid_from"),
            (F.lit(None).cast("timestamp") if valid_to is None else valid_to).alias(
                "valid_to"
            ),
            F.lit(is_current).alias("is_current"),
        )

    no_change = F.col("__h_new").isNull()  # key untouched by this feed
    added = F.col("__h_old").isNull()
    delete = F.coalesce(F.col("__del"), F.lit(False))
    same = ~no_change & ~added & (F.col("__h_old") == F.col("__h_new"))

    open_old = _row("o", F.col("__o_valid_from"), None, True)
    close_old = _row("o", F.col("__o_valid_from"), ts, False)
    open_new = _row("n", ts, None, True)
    empty = F.slice(F.array(open_new), 1, 0)  # typed empty array
    emitted = (
        F.when(no_change, F.array(open_old))
        .when(added & delete, empty)  # delete of an unknown key: no-op
        .when(added, F.array(open_new))
        .when(delete, F.array(close_old))
        .when(same, F.array(open_old))
        .otherwise(F.array(close_old, open_new))
    )
    merged = j.select(F.explode(emitted).alias("r")).select("r.*")
    return closed.unionByName(merged)


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    run_ts: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: fold a new snapshot into
    a versioned history table and return the updated history.

    ``history`` schema: ``key_cols + compare_cols + (valid_from
    timestamp, valid_to timestamp, is_current boolean)``; ``snapshot``
    schema: ``key_cols + compare_cols``. ``run_ts`` is the injected
    snapshot time (ISO string — never wall-clock, for determinism).

    Per key:
    - new key            → open a current row (valid_from=run_ts)
    - changed tracked cols → close the current row (valid_to=run_ts)
      and open a new current version
    - key absent from snapshot → close the current row (a delete)
    - unchanged          → keep the current row as-is

    Execution shape (scale): already-closed history rows pass through
    with NO join (store them in a separate ``is_current=false``
    partition and this union is metadata-only); current rows full-outer
    join the snapshot on the key comparing md5 row-hashes, then each
    joined row emits 0-2 output rows via one array+explode — a single
    shuffle, no branch re-execution of the join. At 100 TB bucket both
    the current partition and the snapshot by the key to make the join
    zero-Exchange.
    """
    if not key_cols or not compare_cols:
        raise ValueError("scd2_merge requires key_cols and compare_cols")
    out_cols = [*key_cols, *compare_cols, "valid_from", "valid_to", "is_current"]
    ts = F.to_timestamp(F.lit(run_ts))

    current = history.where(F.col("is_current"))
    closed = history.where(~F.col("is_current")).select(*out_cols)

    o = current.select(
        *[F.col(c).alias(f"__o_{c}") for c in (*key_cols, *compare_cols)],
        F.col("valid_from").alias("__o_valid_from"),
        _row_hash(compare_cols).alias("__h_old"),
    )
    n = snapshot.select(
        *[F.col(c).alias(f"__n_{c}") for c in (*key_cols, *compare_cols)],
        _row_hash(compare_cols).alias("__h_new"),
    )
    cond = [o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"]) for k in key_cols]
    j = o.join(n, on=cond, how="full_outer")

    def _row(side: str, valid_from: F.Column, valid_to, is_current: bool) -> F.Column:
        return F.struct(
            *[F.col(f"__{side}_{c}").alias(c) for c in (*key_cols, *compare_cols)],
            valid_from.alias("valid_from"),
            (F.lit(None).cast("timestamp") if valid_to is None else valid_to).alias(
                "valid_to"
            ),
            F.lit(is_current).alias("is_current"),
        )

    added = F.col("__h_old").isNull()
    removed = F.col("__h_new").isNull()
    changed = ~added & ~removed & (F.col("__h_old") != F.col("__h_new"))
    unchanged = ~added & ~removed & (F.col("__h_old") == F.col("__h_new"))

    emitted = (
        F.when(added, F.array(_row("n", ts, None, True)))
        .when(unchanged, F.array(_row("o", F.col("__o_valid_from"), None, True)))
        .when(removed, F.array(_row("o", F.col("__o_valid_from"), ts, False)))
        .otherwise(  # changed: close old version + open new one
            F.array(
                _row("o", F.col("__o_valid_from"), ts, False),
                _row("n", ts, None, True),
            )
        )
    )
    merged = j.select(F.explode(emitted).alias("r")).select("r.*")
    return closed.unionByName(merged)
