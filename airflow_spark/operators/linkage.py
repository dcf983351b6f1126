"""Record linkage: approximate string join on edit distance.

The scale problem: ``levenshtein(a, b) <= d`` cannot be an equi-join
key, and a cross join is O(n²). The classic fix is *blocking* —
generate a small set of keys per string such that any pair within
distance ``d`` shares at least one key, equi-join on the key, then
verify candidates with the exact built-in ``levenshtein``.

Blocking scheme: the symmetric-delete neighborhood (public SymSpell
algorithm): every variant of a string with up to ``d`` characters
deleted. Two strings within Levenshtein distance ``d`` always share a
delete-variant (each edit is covered by deleting the edited position
from one or both sides), so the candidate set has no false negatives;
the exact verify removes false positives. Variant count is
O(len^d / d!) per string (~70 for a 11-char string at d=2) — bounded
explode, shuffles only (variant, id) pairs, never all-pairs.

Everything is native Catalyst: delete variants via
``sequence``/``transform``/``flatten`` higher-order functions, verify
via the built-in ``levenshtein`` — no Python UDFs.

Reference analog: none (north-star LLM-pipeline extension); public
algorithm: SymSpell (Garbe), PassJoin family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def delete_variants(col: Column | str, max_distance: int) -> Column:
    """Array of all strings obtained by deleting up to ``max_distance``
    characters from ``col`` (the string itself included), distinct.

    Built from nested higher-order functions — one projection, no UDF.
    """
    if max_distance not in (1, 2):
        raise ValueError("delete_variants supports max_distance 1 or 2")
    c = F.col(col) if isinstance(col, str) else col

    def _del_one(s: Column) -> Column:
        # all single-char deletions of s (empty array when s is '')
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1),
                F.substring(s, i + 1, F.length(s)),
            ),
        )

    d1 = _del_one(c)
    variants = F.concat(F.array(c), d1)
    if max_distance == 2:
        d2 = F.flatten(F.transform(d1, _del_one))
        variants = F.concat(variants, d2)
    return F.array_distinct(variants)


def _keyed_variants(
    df: DataFrame, col: str, max_distance: int, side: str, max_len: int
) -> DataFrame:
    # the length guard rides the same projection — no extra pass
    guarded = df.where(F.length(F.col(col)) <= max_len)
    return guarded.select(
        F.col(col).alias(f"name_{side}"),
        F.explode(delete_variants(col, max_distance)).alias("__variant"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    max_len: int = 128,
) -> DataFrame:
    """All (left, right) string pairs within Levenshtein
    ``max_distance``: delete-variant blocking → equi-join on the
    variant → distinct candidate pair → exact ``levenshtein`` verify.

    Output: ``name_a`` (left), ``name_b`` (right), ``distance``.
    Inputs should be deduplicated on the join column (join distinct
    values, then map back through the id table — cheaper than dragging
    payloads through the blocking join).

    The variant neighborhood is O(len²) per string at d=2, so values
    longer than ``max_len`` are EXCLUDED from matching (a 10 KB blob in
    a name column would otherwise explode to ~50M variants). This is a
    names/titles/skus operator — for near-dup TEXT use the shingle
    family in ``operators.dedup``, which is length-linear.
    """
    lv = _keyed_variants(
        left.select(left_col).distinct(), left_col, max_distance, "a", max_len
    )
    rv = _keyed_variants(
        right.select(right_col).distinct(), right_col, max_distance, "b", max_len
    )
    cand = lv.join(rv, "__variant").select("name_a", "name_b").distinct()
    dist = F.levenshtein("name_a", "name_b")
    return cand.where(dist <= max_distance).select(
        "name_a", "name_b", dist.cast("bigint").alias("distance")
    )


def fuzzy_self_pairs(
    df: DataFrame, col: str, max_distance: int = 2
) -> DataFrame:
    """Distinct unordered pairs of ``col`` values within Levenshtein
    ``max_distance`` (self-linkage, ``name_a < name_b``)."""
    return fuzzy_join(df, df, col, col, max_distance).where(
        F.col("name_a") < F.col("name_b")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    col: str,
    window: int = 3,
    max_distance: int = 3,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández/Stolfo): sort
    records by the key once, compare each record only against its next
    ``window − 1`` neighbors, keep pairs within Levenshtein
    ``max_distance``. The classic complement to delete-variant
    blocking (:func:`fuzzy_join`): SN catches near-misses that share a
    PREFIX even when the edit is past the variant radius, and its
    candidate count is exactly ``(window−1)·N`` — linear by
    construction, no bucket-skew worst case.

    One global sort (the rank window) then a projection — at 100 TB
    swap the single window for ``repartitionByRange`` + per-partition
    ranks with boundary overlap; the comparison itself stays the
    same. Output: (name_a, name_b, distance), name_a < name_b
    lexicographically, distinct."""
    w = Window.orderBy(F.col("v"))
    ranked = df.select(F.col(col).alias("v")).distinct().select(
        "v",
        *[
            F.lead("v", k).over(w).alias(f"__n{k}")
            for k in range(1, window)
        ],
    )
    # keep raw (v, neighbor) structs and drop null neighbors BEFORE
    # least/greatest: both skip NULLs, so canonicalizing first would
    # turn every frame-edge row into a (v, v) self-pair
    pair_arr = F.array(
        *[
            F.struct(
                F.col("v").alias("x"), F.col(f"__n{k}").alias("y")
            )
            for k in range(1, window)
        ]
    )
    pairs = (
        ranked.select(F.explode(pair_arr).alias("p"))
        .where(F.col("p.y").isNotNull())
        .select(
            F.least("p.x", "p.y").alias("name_a"),
            F.greatest("p.x", "p.y").alias("name_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "distance", F.levenshtein("name_a", "name_b")
        )
        .where(F.col("distance") <= max_distance)
    )
