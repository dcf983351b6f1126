"""Mergeable distinct-count sketches (Apache DataSketches HLL).

At 100 TB you never re-count distincts from raw data: build per-shard /
per-fine-group sketches ONCE (each a fixed ~KB binary, built with a
map-side-combining JVM aggregate), persist them, and serve ANY coarser
grouping by merging sketches — COUNT DISTINCT is not otherwise
re-aggregatable (a nation-level distinct count cannot be summed to a
region-level one; the sketch union can). This is the COUNT DISTINCT
analog of the continuous-aggregate rollup (`operators/rollup.py`), and
composes with it: a rollup table can carry an HLL column next to its
mergeable sums.

Spark ships Datasketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — JVM-side
ObjectHashAggregate with partial merge, no UDFs). Estimates are
deterministic for a given input multiset, and EXACT while a group's
cardinality stays in the sketch's sparse regime (< ~k/4 distincts at
``lgk`` config, e.g. < ~1024 for lgk=12) — the property the DuckDB
oracle for ``op_hll_rollup`` leans on at driver scale, while the
approximate regime is tolerance-tested locally.

Reference scope: the reference's count-distinct surface is SURVEY.md
§2.4 (q24's count(DISTINCT) among others); this adds the form that
survives incremental / hierarchical re-aggregation at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hll_rollup(
    df: DataFrame,
    value_col: str,
    by: list[str],
    lgk: int = 12,
    sketch_col: str = "hll",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Per-group HLL sketches + estimates: one pass over the raw data,
    map-side partial sketches merged on the group key (the only
    shuffle carries ~KB sketches, not values). Persist this at the
    finest grouping you'll ever query; every coarser grouping comes
    from ``hll_merge_rollup`` without touching raw data again."""
    return (
        df.groupBy(*by)
        .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col))
        .withColumn(estimate_col, F.hll_sketch_estimate(sketch_col))
    )


def hll_merge_rollup(
    sketch_df: DataFrame,
    by: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Roll sketches up to a coarser grouping by unioning them —
    input is the (tiny) sketch table, so re-aggregation cost is
    independent of corpus size. Union is associative and idempotent:
    merging nation-level sketches to regions equals sketching regions
    directly."""
    return (
        sketch_df.groupBy(*by)
        .agg(F.hll_union_agg(sketch_col).alias(sketch_col))
        .withColumn(estimate_col, F.hll_sketch_estimate(sketch_col))
    )
