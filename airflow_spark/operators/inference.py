"""Statistical inference / data-profiling operators: grouped linear
regression, chi-square independence, MAD outlier detection, Benford
first-digit audit.

All are one- or two-pass grouped aggregates over built-in expressions
(regr_* / percentile / conditional counts) — map-side partial
aggregation everywhere, no UDFs, no collects beyond what a scalar
report needs. At 100 TB each is a single shuffle keyed on the group
column plus (for MAD) one broadcast join of per-group constants.

Reference analog: the reference asserts fixed thresholds on polled
metrics (/root/reference/dags/Speedtest.py:47-67); these operators are
the model-based generalizations (trend, association, robust outliers,
digit-law anomalies) a telemetry corpus needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_regression(
    df: DataFrame,
    key_col: str,
    x_col,
    y_col,
) -> DataFrame:
    """Per-group ordinary least squares of ``y`` on ``x`` via the
    built-in ``regr_*`` aggregate family (one pass, mergeable
    partials): slope, intercept, r², n. The distributed closed-form
    fit — no iteration, no driver round-trips.

    Returns (key, n, slope, intercept, r2)."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    return (
        df.groupBy(key_col)
        .agg(
            F.regr_count(y, x).alias("n"),
            F.regr_slope(y, x).alias("slope"),
            F.regr_intercept(y, x).alias("intercept"),
            F.regr_r2(y, x).alias("r2"),
        )
        .orderBy(key_col)
    )


def chisq_report(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-square independence report: (n_a, n_b, n_cells, n_total,
    chisq, dof) where n_cells counts OBSERVED (a, b) combinations.

    Uses the algebraic identity χ² = N · Σ_observed o²/(rowTot·colTot)
    − N, which is exactly Σ_all (o − e)²/e including the EMPTY grid
    cells (each contributes its expectation e; they telescope into the
    −N term) — so the statistic is correct without materializing the
    full a×b grid or a cartesian join. One corpus-sized count pass;
    marginals are window sums over the tiny cell frame."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("__o"))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    with_marginals = cells.select(
        F.col(col_a),
        F.col(col_b),
        F.col("__o"),
        F.sum("__o").over(wa).alias("__row_tot"),
        F.sum("__o").over(wb).alias("__col_tot"),
    )
    term = (
        F.col("__o").cast("double")
        * F.col("__o").cast("double")
        / (F.col("__row_tot").cast("double") * F.col("__col_tot").cast("double"))
    )
    n_d = F.sum("__o").cast("double")
    return with_marginals.agg(
        F.countDistinct(col_a).alias("n_a"),
        F.countDistinct(col_b).alias("n_b"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("__o").alias("n_total"),
        F.round(F.sum(term) * n_d - n_d, 4).alias("chisq"),
        (
            (F.countDistinct(col_a) - 1) * (F.countDistinct(col_b) - 1)
        ).alias("dof"),
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Robust outlier counts per group via the median absolute
    deviation: med = median(x), mad = median(|x − med|), outlier when
    |x − med| > n_sigmas · 1.4826 · mad (1.4826 scales MAD to σ under
    normality). Immune to the outliers themselves, unlike z-scores.

    Two exact-percentile passes (med, then mad) with per-group
    constants broadcast back; the flagging pass is a projection.
    Returns (key, n, med, mad, n_outliers)."""
    med = df.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(key_col).agg(
        F.percentile("__dev", F.lit(0.5)).alias("__mad")
    )
    flagged = dev.join(F.broadcast(mad), key_col)
    cut = F.lit(float(n_sigmas) * 1.4826) * F.col("__mad")
    return (
        flagged.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("__med"), 4).alias("med"),
            F.round(F.max("__mad"), 4).alias("mad"),
            F.sum(
                F.when(F.col("__dev") > cut, 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy(key_col)
    )


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (the
    fabricated-data / corruption smell test for financial-style
    columns). The digit is taken from the INTEGER rendering of
    floor(value) — string-deterministic across engines, no log10 FP
    edge at powers of ten. Values < 1 are excluded.

    One conditional-count aggregate; expected share is the closed-form
    log10(1 + 1/d). Returns (digit, n, share, benford) for d = 1..9."""
    v = F.col(value_col)
    digit = F.substring(
        F.floor(v).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.where(v >= 1.0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy()
    return counts.select(
        "digit",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("share"),
        F.round(
            F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 4
        ).alias("benford"),
    ).orderBy("digit")
