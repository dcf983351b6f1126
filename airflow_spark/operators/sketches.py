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


def _kmv_hash(col):
    """Portable 60-bit uniform hash: first 15 hex digits of md5 —
    bit-identical in DuckDB as CAST(concat('0x', substr(md5(x),1,15))
    AS BIGINT), so KMV sketches (unlike HLL's engine-specific
    registers) hash-attest EXACTLY across engines."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str],
    k: int = 64,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Per-group KMV (k-minimum-values / bottom-k) distinct sketch:
    the ``k`` smallest portable hashes of the group's distinct values,
    as a sorted array. The KMV estimator D ≈ (k−1)/U_k (U_k = the kth
    smallest hash normalized to [0,1]) has ~1/√k relative error, and —
    the property HLL lacks — bottom-k sets support UNION (merge arrays,
    keep k smallest: the k smallest of a union are each among their own
    group's k smallest) and INTERSECTION (Jaccard of the union's
    bottom-k, times the union estimate).

    Shape: distinct on (group, hash) is the one real shuffle; the
    per-group bottom-k is a window rank over the distinct stream —
    spillable sort, never a driver collect. Exact while a group's
    distinct count stays ≤ k (n_kept < k ⇒ the sketch IS the distinct
    set)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # NULL values hash to NULL, which would sort first (Spark window
    # nulls-first), burn a bottom-k slot, then be dropped by
    # collect_list — n_kept < k masquerading as the exact regime
    hashed = (
        df.select(*by, _kmv_hash(F.col(value_col)).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*by).orderBy("__h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*by)
        .agg(F.sort_array(F.collect_list("__h")).alias(sketch_col))
    )


def kmv_estimate(
    sketch_df: DataFrame, k: int, sketch_col: str = "kmv"
) -> DataFrame:
    """Attach ``n_kept`` and ``distinct_est`` to a KMV sketch frame.
    Exact below k; else (k−1)·2⁶⁰/h_k — one IEEE division of exactly
    representable doubles, so the estimate itself is oracle-portable."""
    from pyspark.sql import functions as F

    n_kept = F.size(F.col(sketch_col))
    kth = F.element_at(F.col(sketch_col), n_kept).cast("double")
    est = F.when(n_kept < F.lit(k), n_kept.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(2**60)) / kth, 4)
    )
    return sketch_df.withColumn("n_kept", n_kept).withColumn(
        "distinct_est", est
    )


def kmv_merge(
    sketch_df: DataFrame,
    by: list[str],
    k: int = 64,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Roll KMV sketches up to a coarser grouping: explode, dedupe,
    keep the k smallest — input is the tiny sketch table, so the
    re-aggregation cost is independent of corpus size, and the result
    equals sketching the coarse group from raw data directly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    exploded = (
        sketch_df.select(*by, F.explode(F.col(sketch_col)).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    w = w.orderBy("__h")
    out = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    if by:
        return out.groupBy(*by).agg(
            F.sort_array(F.collect_list("__h")).alias(sketch_col)
        )
    return out.groupBy(F.lit(1).alias("__g")).agg(
        F.sort_array(F.collect_list("__h")).alias(sketch_col)
    ).drop("__g")


def kmv_intersection_estimate(
    a, b, k: int
):
    """Column expression: estimated |A∩B| from two KMV arrays — the
    bottom-k of the union gives Jaccard ρ = |U∩A∩B|/|U| and the union
    estimate D(U); |A∩B| ≈ ρ·D(U). Deterministic array/integer ops +
    two divisions."""
    from pyspark.sql import functions as F

    u = F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)
    n_u = F.size(u)
    kth = F.element_at(u, n_u).cast("double")
    est_u = F.when(
        n_u < F.lit(k), n_u.cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(2**60)) / kth)
    rho = (
        F.size(F.array_intersect(F.array_intersect(u, a), b)).cast("double")
        / n_u.cast("double")
    )
    return F.round(rho * est_u, 4)


# ---------------------------------------------------------------------------
# Bitmap distinct rollups (EXACT + mergeable)
# ---------------------------------------------------------------------------


def bitmap_rollup(
    df: DataFrame,
    id_col: str,
    by: list[str],
    bitmap_col: str = "bm",
) -> DataFrame:
    """Per-(group, bucket) bitmaps over an integer id column — the
    EXACT, mergeable distinct-count partial (the bitmap sibling of
    ``hll_rollup``: no error bound, cost = one bit per live id packed
    into per-bucket bitmap blobs). One pass; the shuffle carries
    bitmaps, never ids. Persist at the finest grouping; every coarser
    distinct count re-aggregates from this table alone."""
    return df.groupBy(
        *by, F.bitmap_bucket_number(F.col(id_col)).alias("bucket")
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col(id_col))
        ).alias(bitmap_col)
    )


def bitmap_distinct(
    bitmaps: DataFrame,
    by: list[str],
    bitmap_col: str = "bm",
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT distinct counts at any grouping ≤ the bitmap table's:
    per-bucket bitmaps OR-merge (associative/idempotent, so double
    counting is structurally impossible), then popcounts sum — raw
    data is never re-read."""
    merged = bitmaps.groupBy(*by, "bucket").agg(
        F.bitmap_or_agg(bitmap_col).alias("__m")
    )
    return merged.groupBy(*by).agg(
        F.sum(F.bitmap_count("__m")).alias(out_col)
    )


def countmin_counts(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch counters for a key column: ``depth`` rows of
    ``width`` buckets, each key hashed into one bucket per row with an
    independent salted hash. Returns (row, bucket, c) — the ENTIRE
    sketch is depth·width counters regardless of cardinality, and
    counters from different partitions/batches MERGE BY ADDITION,
    which is why this is the streaming/pre-agg answer to heavy-hitter
    counting at 100 TB (fixed-size state where an exact count table
    grows with the key space).

    Hashes are the repo's portable md5 family, so an oracle can
    rebuild the sketch bit-identically in SQL."""
    from ..functions.hashing import md5_uniform

    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    keyed = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k", rows
    )
    bucket = md5_uniform(
        F.concat(F.col("row").cast("string"), F.lit("|"), F.col("k")),
        salt,
        modulus=width,
    )
    return (
        keyed.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: estimate =
    min over rows of the key's bucket counter (the classic Count-Min
    upper bound — never under-counts, over-counts by collision mass
    ≤ e·N/width with high probability). One broadcast join of the
    fixed-size sketch; no scan of the original data."""
    from ..functions.hashing import md5_uniform

    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    probes = keys.select(
        F.col(key_col), F.col(key_col).cast("string").alias("__k")
    ).select(key_col, "__k", rows)
    bucket = md5_uniform(
        F.concat(F.col("row").cast("string"), F.lit("|"), F.col("__k")),
        salt,
        modulus=width,
    )
    return (
        probes.select(key_col, "row", bucket.alias("bucket"))
        .join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("cm_estimate")
        )
    )
