"""Skew-mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled session-wide here) handles most
skew at runtime; these utilities are the *explicit* forms for the cases
AQE can't rescue:

- ``salted_join``: a known-skewed key set on the big side — salt the
  big side N ways, replicate the small side per salt, join on
  (key, salt). The hot key's rows spread over N tasks instead of one
  straggler.
- ``salted_collect``: collect_list/collect_set per key has no partial
  aggregation (all values of a hot key land on one task). Two phases —
  collect per (key, salt), then flatten per key — bound the per-task
  state to 1/N of the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big.key`` is skewed: salt big rows by a stable
    hash of their full row id-space, explode ``small`` once per salt,
    join on (key, salt). Output equals the plain join for ``how`` in
    ('inner', 'left') — other join types would duplicate unmatched
    small-side rows once per salt (or silently change semi/anti
    semantics), so they are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r}: "
            "the small side is replicated per salt, so right/full/semi/"
            "anti joins would duplicate or drop rows"
        )
    # content-INDEPENDENT salt: hashing row content would (a) crash on
    # MapType columns (Spark forbids hashing maps) and (b) collapse a
    # hot key made of byte-identical rows onto ONE salt — the exact
    # straggler this utility exists to break up. The salt only routes
    # rows, so determinism is not needed for correctness.
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)).cast("int"),
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")


def salted_join_outer(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "full",
) -> DataFrame:
    """Outer-complete salted join: equals the plain ``full``/``right``
    outer join even though the small side is replicated per salt.

    The trick: run the salted join *inner*+big-outer as usual, then
    recover the small-side rows that matched nothing with one
    ``left_anti`` against the matched key set and union them back with
    nulls on the big side. Costs one extra anti-join over the (tiny)
    small side — the big side is still never replicated and the hot key
    still spreads over ``num_salts`` tasks."""
    if how not in ("full", "outer", "full_outer", "right", "right_outer"):
        raise ValueError(
            f"salted_join_outer is for right/full joins, got {how!r}: "
            "use salted_join for inner/left"
        )
    base_how = "left" if how in ("full", "outer", "full_outer") else "inner"
    matched = salted_join(big, small, key, num_salts, base_how)
    unmatched_small = small.join(
        big.select(key).distinct(), key, "left_anti"
    )
    # align columns: big columns null for small-only rows
    big_cols = [c for c in big.columns if c != key]
    aligned = unmatched_small.select(
        key,
        *[F.lit(None).cast(big.schema[c].dataType).alias(c) for c in big_cols],
        *[c for c in small.columns if c != key],
    )
    out_cols = [key, *big_cols, *[c for c in small.columns if c != key]]
    return matched.select(*out_cols).unionByName(aligned)


def salted_collect(
    df: DataFrame,
    key: str,
    value_col: str,
    num_salts: int = 16,
    as_set: bool = False,
) -> DataFrame:
    """collect_list/set per key in two phases: (key, salt) partial
    collects → flatten per key. Returns (key, values).

    What the salting bounds: the AGGREGATION-side state. For
    ``as_set=True`` phase 1 dedups within each salt, so the final
    merge sees at most num_salts × |distinct| pre-deduped arrays. For
    ``as_set=False`` the final task necessarily materializes the whole
    list — that is the requested OUTPUT — so the win is limited to the
    phase-1 build side; if the full list itself cannot fit in one
    task, the caller needs a different representation (exploded rows),
    not a collect. The salt is content-independent (a hot key of
    identical values must still spread across salts)."""
    fn = F.collect_set if as_set else F.collect_list
    partial = (
        df.withColumn(
            "__salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)),
        )
        .groupBy(key, "__salt")
        .agg(fn(value_col).alias("__part"))
    )
    out = partial.groupBy(key).agg(
        F.flatten(F.collect_list("__part")).alias("values")
    )
    if as_set:
        out = out.select(key, F.array_distinct("values").alias("values"))
    return out
