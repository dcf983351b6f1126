"""FP-portability helpers shared by the statistics operators.

Two recurring cross-engine hazards:

- A statistically-zero estimate (corr of noise, cancelled entropy,
  no-seasonality share) is pure FP summation noise whose SIGN depends
  on reduction order — a distributed engine and a sequential one will
  disagree on "-0.00" vs "0.00". ``snap_zero`` pins anything inside an
  epsilon band to exactly 0.0 before rounding.
- Spark's built-in ``corr`` raises DIVIDE_BY_ZERO under ANSI mode on a
  zero-variance input, where ANSI SQL engines return NULL.
  ``safe_corr`` spells Pearson r as covar/(σ·σ) under ``try_divide``
  with both inputs masked to COMPLETE pairs (a bare stddev would also
  see rows where the other side is NULL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def snap_zero(col: Column, eps: float = 1e-6, digits: int = 6) -> Column:
    """0.0 inside ``[-eps, eps]``, else ``round(col, digits)``; NULL
    passes through (CASE semantics on both engines)."""
    return F.when(F.abs(col) < eps, F.lit(0.0)).otherwise(
        F.round(col, digits)
    )


def safe_corr(x: Column, y: Column) -> Column:
    """Pearson r over COMPLETE (x, y) pairs as an aggregate expression:
    NULL (never an error, never NaN) when either side has zero
    variance or fewer than two pairs — the ANSI-engine behavior."""
    both = x.isNotNull() & y.isNotNull()
    xp, yp = F.when(both, x), F.when(both, y)
    return F.try_divide(
        F.covar_samp(xp, yp), F.stddev_samp(xp) * F.stddev_samp(yp)
    )
