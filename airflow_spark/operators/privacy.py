"""Privacy / governance operators: k-anonymity suppression and
numeric generalization.

A training-data pipeline that ingests user-derived events needs a
release gate: quasi-identifier combinations that occur fewer than k
times re-identify people. ``k_suppress`` nulls the quasi-identifiers
of under-k groups (suppression); ``generalize_numeric`` coarsens a
numeric column into bands (generalization) — the two standard moves,
both as pure expressions.

Scale: one window count over the quasi-identifier key (a single
shuffle; partial aggregation does not apply to windows, but the key
cardinality — not the row count — bounds state). PII *content* inside
free text is the separate ``functions.text.redact_pii`` pass.

Reference analog: behavior contract only (the reference has no
privacy surface); north-star LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_suppress(
    df: DataFrame, quasi_cols: list[str], k: int = 5, flag_col: str = "suppressed"
) -> DataFrame:
    """Null out ``quasi_cols`` on every row whose quasi-identifier
    combination occurs fewer than ``k`` times; ``flag_col`` marks the
    suppressed rows. Row count and all other columns are preserved."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    n = F.count(F.lit(1)).over(Window.partitionBy(*quasi_cols))
    rare = (n < k).alias(flag_col)
    quasi = set(quasi_cols)
    # preserve the ORIGINAL column order (positional consumers — union,
    # insertInto — would misalign if quasi columns moved to the end)
    return df.select(
        *[
            F.when(~rare, F.col(c)).otherwise(F.lit(None)).alias(c)
            if c in quasi
            else F.col(c)
            for c in df.columns
        ],
        rare,
    )


def k_anonymity_stats(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """One-row report: distinct quasi groups, under-k groups, rows that
    would be suppressed, and the minimum group size (the table's
    current k-anonymity level)."""
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    # coalesce: on an empty table sum/min aggregate NULL, which would
    # crash int() release gates or silently pass >= comparisons
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n") < k, 1).otherwise(0)), F.lit(0)
        ).alias("n_under_k"),
        F.coalesce(
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)), F.lit(0)
        ).alias("n_rows_suppressed"),
        F.coalesce(F.min("n"), F.lit(0)).alias("min_group_size"),
    )


def generalize_numeric(
    col: Column | str, width: float, as_label: bool = False
) -> Column:
    """Band a numeric column: ``floor(v / width) * width`` (or a
    ``"[lo,hi)"`` string label) — the generalization step that lifts
    group sizes above k without dropping rows."""
    c = F.col(col) if isinstance(col, str) else col
    lo = F.floor(c / F.lit(width)) * F.lit(width)
    if not as_label:
        return lo
    return F.concat(
        F.lit("["), lo.cast("string"), F.lit(","), (lo + width).cast("string"), F.lit(")")
    )


def l_diversity_stats(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 - the standard parameter name in the literature
) -> DataFrame:
    """Per quasi-identifier group: size, distinct sensitive values,
    and whether the group meets distinct l-diversity — the check that
    catches k-anonymous groups which still leak (everyone in the
    group shares the sensitive value). Groups failing it need
    suppression or generalization before release.

    One grouped aggregate; ``count(distinct)`` per group is exact
    (the group frame is the small side by construction)."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(sensitive_col).cast("bigint").alias("n_sensitive"),
        )
        .withColumn("l_diverse", F.col("n_sensitive") >= l)
        .orderBy(*quasi_cols)
    )
