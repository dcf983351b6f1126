"""Per-key custom logic: the expressions-first policy, demonstrated.

``normalize_per_key`` exists in two equivalent forms:
- **expression form** (default): window mean/std — stays JVM-side in
  whole-stage codegen; this is the one to use.
- **applyInPandas form**: the Arrow-batched escape hatch for logic that
  genuinely can't be expressed as columns (iterative fits, scipy calls).
  Kept here as the reference pattern — grouped, batched, schema-declared
  — and tested equal to the expression form.

The policy (SURVEY.md §2.10): reach for applyInPandas only when the
expression form can't express the semantics, because the Arrow hop +
Python worker costs ~10-100× on the hot path.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_per_key(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Z-score per key, pure expressions (two window aggregates fused
    into one window spec — no Python)."""
    w = Window.partitionBy(key)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
    return df.withColumn("z", z)


def normalize_per_key_pandas(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Same semantics via applyInPandas (the escape-hatch pattern)."""
    fields = df.schema.fields + [T.StructField("z", T.DoubleType())]
    schema = T.StructType(fields)

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        if pd.isna(std) or std == 0:
            pdf["z"] = 0.0
        else:
            pdf["z"] = (pdf[value_col] - pdf[value_col].mean()) / std
        return pdf

    return df.groupBy(key).applyInPandas(_norm, schema)


def grouped_quantiles(
    df: DataFrame, key: str, value_col: str, probs: list[float] | None = None
) -> DataFrame:
    """Per-key exact quantiles via percentile (single grouped agg —
    demonstrates that even 'per-key custom stats' usually have an
    expression form)."""
    probs = probs or [0.5, 0.95, 0.99]

    def label(p: float) -> str:
        # p=0.999 must not collapse onto p=0.99's label: use the full
        # probability digits (p99_9), not a truncating int(p*100)
        return "p" + f"{p * 100:g}".replace(".", "_")

    return df.groupBy(key).agg(
        *[F.percentile(value_col, F.lit(p)).alias(label(p)) for p in probs]
    )


def weighted_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
    quantiles: tuple[float, ...] = (0.5,),
) -> DataFrame:
    """Exact weighted quantiles per key: the smallest value whose
    cumulative weight share reaches each quantile (the inverse
    weighted CDF, left-continuous). The estimator mixture-reweighted
    corpora need — an unweighted median over temperature-weighted
    domains answers the wrong question.

    Shape: one (key, value) pre-aggregate collapses duplicate values
    (map-side combine), one cumulative window per key over the
    distinct-value frame, then a min per quantile — no global sort,
    no UDF."""
    from pyspark.sql import Window

    per_val = df.groupBy(key_col, value_col).agg(
        F.sum(weight_col).cast("double").alias("__w")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(key_col)
    # carry cum and total separately and compare cum >= q·total: the
    # ratio form's last row is NOT guaranteed exactly 1.0 (the ordered
    # and whole-partition sums reduce in different orders), so q=1.0
    # could find no row; the max-value coalesce double-covers that.
    # Zero-total keys (all weights 0) are dropped — their weighted
    # quantile is undefined, and NaN cdfs would otherwise select the
    # minimum silently.
    cdf = per_val.select(
        key_col,
        value_col,
        F.sum("__w").over(w).alias("__cum"),
        F.sum("__w").over(tot).alias("__tot"),
    ).where(F.col("__tot") > 0)
    aggs = []
    for q in quantiles:
        name = f"wq_{str(q).replace('.', '_')}"
        aggs.append(
            F.coalesce(
                F.min(
                    F.when(
                        F.col("__cum") >= F.lit(q) * F.col("__tot"),
                        F.col(value_col),
                    )
                ),
                F.max(value_col),
            ).alias(name)
        )
    return cdf.groupBy(key_col).agg(*aggs).orderBy(key_col)
