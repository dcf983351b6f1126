"""Sampling operators for training-data pipelines.

- ``stratified_take``: exact, deterministic per-class top-n (window
  rank over a total order) — reproducible across runs and engines.
- ``stratified_sample``: approximate per-class fraction sampling
  (``sampleBy`` — one pass, no shuffle, seed-stable).
- ``split_by_hash``: deterministic train/validation/test assignment by
  id hash — stable under data growth (a row's split never changes when
  other rows arrive), the property random splits lack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_take(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    order_by: str | Column | None = None,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, deterministic:
    ranked by ``order_by``, which must be given (a unique key) — there
    is no implicit default order in a distributed table, so omitting it
    is an error rather than a silently nondeterministic sample."""
    if order_by is None:
        raise ValueError(
            "stratified_take requires order_by (a unique key column): "
            "without a total order the per-stratum take is nondeterministic"
        )
    order = F.col(order_by) if isinstance(order_by, str) else order_by
    w = Window.partitionBy(strata_col).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-class fraction sampling (approximate counts, seed-stable,
    single pass)."""
    return df.sampleBy(strata_col, fractions, seed)


def split_by_hash(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashing its id: stable,
    deterministic, independent of row order and of other rows.

    ``weights`` maps split name → fraction (must sum to ~1)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = F.pmod(F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(1_000_000))
    expr: Column | None = None
    acc = 0.0
    for name, frac in weights.items():
        acc += frac
        cond = bucket < int(acc * 1_000_000)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # guard the float edge: the last bucket takes any remainder
    last = list(weights)[-1]
    return df.withColumn(out_col, expr.otherwise(last))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic probability-proportional-to-size sample of ``k``
    rows: sequential Poisson sampling (Ohlsson) — rank rows by
    ``ξ = u / w`` ascending, where ``u ∈ (0,1]`` is a portable
    md5-derived uniform of the row id, and keep the k smallest.
    Inclusion probability is ≈ proportional to ``weight_col``, the
    draw is reproducible across runs AND engines (no RNG state — the
    id hash IS the randomness), and a row's priority never changes as
    other rows arrive (the same growth-stability property as
    ``split_by_hash``).

    Execution: one projection + TakeOrderedAndProject — no shuffle of
    the full table, no global sort materialization.
    """
    from ..functions.hashing import md5_unit_interval

    u = md5_unit_interval(F.col(id_col), salt)
    xi = u / F.col(weight_col)
    # guard: a null weight/id nulls xi and ascending sort puts NULLS
    # FIRST (they would be "sampled" before every valid row); a
    # non-positive weight has no sampling interpretation either — such
    # rows are excluded from the draw
    eligible = df.where(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
        & F.col(id_col).isNotNull()
    )
    return (
        eligible.withColumn("__xi", xi)
        .orderBy("__xi", id_col)
        .limit(k)
        .drop("__xi")
    )


def assign_contiguous_ids(
    df: DataFrame,
    order_by: str,
    id_name: str = "row_idx",
    num_shards: int | None = None,
) -> DataFrame:
    """Dense 0..n-1 ids in ``order_by`` order, WITHOUT the global
    window (``row_number() OVER (ORDER BY ...)`` exchanges everything
    to one partition — the straggler the plan linter flags). Instead:
    range-shard on the order key, rank within each shard in parallel,
    and add broadcast per-shard offsets — two scans, both fully
    parallel, the standard zipWithIndex recipe expressed in DataFrame
    ops. The order key must be unique (ids would otherwise be
    tie-ambiguous across engines).

    This is how a training corpus gets stable sample indices (shard
    addressing, curriculum order, resumable iteration) at 100 TB.
    """
    spark = df.sparkSession
    if num_shards is None:
        num_shards = spark.sparkContext.defaultParallelism
    sharded = df.repartitionByRange(num_shards, F.col(order_by))
    # spark_partition_id is stable here: repartitionByRange fixes the
    # row->partition mapping for a given (data, num_shards)
    with_shard = sharded.withColumn("__shard", F.spark_partition_id())
    # the offsets frame has exactly num_shards rows, so its global
    # cumsum window is bounded (like IVF centroid training), never a
    # data-sized single-partition sort
    counts = (
        with_shard.groupBy("__shard")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__offset")
    )
    w = Window.partitionBy("__shard").orderBy(order_by)
    return (
        with_shard.join(F.broadcast(counts), "__shard")
        .withColumn(
            id_name,
            (F.row_number().over(w) - 1 + F.col("__offset")).cast("long"),
        )
        .drop("__shard", "__offset")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "wsg",
) -> DataFrame:
    """Sequential-Poisson weighted sample of ``k`` rows PER GROUP (the
    stratified form of :func:`weighted_sample`): priorities
    ``xi = u/weight`` from the portable md5 uniform, ranked within each
    group — deterministic, engine-reproducible, growth-stable (new rows
    never displace a kept row unless their priority wins). One window
    over the group shuffle; no global sort. Rows with null ids or
    non-positive weights are excluded from the draw (same contract as
    the global form)."""
    from ..functions.hashing import md5_unit_interval

    u = md5_unit_interval(F.col(id_col), salt)
    eligible = df.where(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
        & F.col(id_col).isNotNull()
    )
    w = Window.partitionBy(group_col).orderBy(
        (u / F.col(weight_col)).asc(), F.col(id_col)
    )
    return (
        eligible.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
