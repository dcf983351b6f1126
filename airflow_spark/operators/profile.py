"""Column profiler: per-column statistics for data-quality audits.

``profile_columns`` computes, for each requested column, in ONE pass
over the data (a single wide aggregate row, unpivoted to long format
driver-side-free via an array+explode projection):

- ``n_rows``     — table row count
- ``n_nulls``    — nulls in the column
- ``n_distinct`` — exact distinct count
- ``min_val`` / ``max_val`` — extrema rendered as strings (profilers
  are heterogeneous by nature; the string form keeps one schema)

Scale notes: multiple exact ``count(distinct)`` aggregates in one pass
expand via Spark's ``Expand`` operator (rows × columns-profiled) — the
honest cost of exactness; pass ``approx=True`` to switch to
HyperLogLog ``approx_count_distinct`` (one pass, no expand) when
profiling very wide/huge tables. min/max/counts are map-side partial
aggregates either way.

Reference analog: the reference's ad-hoc payload presence checks
(e.g. /root/reference/dags/Backups.py:95-100) generalized to a table
profiler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Long-format profile: one output row per column in ``cols``."""
    if not cols:
        raise ValueError("profile_columns requires at least one column")
    n_distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nn_{c}"),
            n_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def sequence_gaps(df: DataFrame, id_col: str) -> DataFrame:
    """Missing-range detection over an integer id sequence (the
    completeness audit for ingest keys: "which orderkeys never
    arrived?"). Returns one row per gap: (gap_start, gap_end, n_missing)
    where the bounds are the first and last MISSING ids.

    Scale shape: ONE corpus-sized pass — each id emits three (value,
    flag) marks (itself=1, successor=2, predecessor=4) into a single
    map-side-combined ``bit_or`` aggregate, and a value is a gap
    boundary iff its flags say "absent but a neighbor is present"
    (flag 1 clear, flag 2 resp. 4 set). Never a global sort of the id
    set. This replaces the previous two hash anti self-joins over an
    UNPERSISTED distinct-id frame, which re-read the table and re-ran
    the distinct once per join side (4 corpus passes, 10 Exchanges →
    1 corpus pass, 4). Duplicate input ids are harmless (bit_or is
    idempotent), so the distinct() disappears into the aggregate. Only
    the boundary rows (one per gap) reach the pairing windows, so the
    single-partition sort there is bounded by the number of gaps, not
    the table. Integer-exact."""
    from pyspark.sql import Window

    idc = df.select(F.col(id_col).cast("long").alias("__id"))
    bounds = F.broadcast(
        idc.agg(F.min("__id").alias("__mn"), F.max("__id").alias("__mx"))
    )
    marks = idc.select(
        F.explode(
            F.array(
                F.struct(F.col("__id").alias("v"), F.lit(1).alias("f")),
                F.struct((F.col("__id") + 1).alias("v"), F.lit(2).alias("f")),
                F.struct((F.col("__id") - 1).alias("v"), F.lit(4).alias("f")),
            )
        ).alias("m")
    ).select(F.col("m.v").alias("v"), F.col("m.f").alias("f"))
    # boundary rows only: v absent (flag 1 clear) with ≥1 neighbor
    # present — one row per gap edge; persisted because starts AND
    # ends filter it (tiny: gap-count-sized)
    boundary = (
        marks.groupBy("v")
        .agg(F.bit_or("f").alias("fl"))
        .where((F.col("fl") % 2) == 0)
        .persist()
    )
    # id whose successor is absent opens a gap at id+1 (unless past
    # the global max); id whose predecessor is absent closes the
    # previous gap at id-1 (unless before the global min)
    starts = (
        boundary.where(F.col("fl").bitwiseAND(2) != 0)
        .crossJoin(bounds)
        .where(F.col("v") <= F.col("__mx"))
        .select(F.col("v").alias("gap_start"))
    )
    ends = (
        boundary.where(F.col("fl").bitwiseAND(4) != 0)
        .crossJoin(bounds)
        .where(F.col("v") >= F.col("__mn"))
        .select(F.col("v").alias("gap_end"))
    )
    # pairing the k-th gap start with the k-th gap end needs a GLOBAL
    # rank over the boundary rows — a single-partition sort, fine
    # while boundaries are sparse (they are: one row per gap, not per
    # id; a 100 TB id column with millions of gaps still fits one
    # task). If a pathological corpus ever makes boundaries dense,
    # the fix is a range-bucketed two-level rank, not a bigger sort.
    ws = Window.orderBy("gap_start")
    we = Window.orderBy("gap_end")
    k_starts = starts.withColumn("__k", F.row_number().over(ws))
    k_ends = ends.withColumn("__k", F.row_number().over(we))
    return (
        k_starts.join(k_ends, "__k")
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1).alias("n_missing"),
        )
        .orderBy("gap_start")
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
) -> DataFrame:
    """Pareto / ABC concentration profile: rank keys by their summed
    weight and classify by cumulative share — A up to ``a_cut`` of the
    total, B up to ``b_cut``, C the tail (the 80/20 revenue-
    concentration audit). Returns (key, total_w, cum_share, abc_class).

    One grouped sum (corpus-sized, partial-agg) then windows over the
    per-key frame (cardinality of the key, not the corpus). The
    cumulative share divides two double sums rounded at 6 — boundary
    flips would need a key sitting within 1e-12 of the cut."""
    from pyspark.sql import Window

    per_key = df.groupBy(key_col).agg(
        F.sum(F.col(weight_col).cast("double")).alias("__w")
    )
    # rank on the ROUNDED weight: two keys with decimal-equal totals
    # must tie (and fall back to the key) in every engine — raw double
    # sums carry accumulation-order noise that could flip their order
    w_cum = Window.orderBy(
        F.round("__w", 2).desc(), F.col(key_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.partitionBy()
    cum_share = F.sum("__w").over(w_cum) / F.sum("__w").over(w_tot)
    return per_key.select(
        F.col(key_col),
        F.round("__w", 2).alias("total_w"),
        F.round(cum_share, 6).alias("cum_share"),
        F.when(cum_share <= F.lit(float(a_cut)), "A")
        .when(cum_share <= F.lit(float(b_cut)), "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy(F.col("total_w").desc(), key_col)


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation.

    Per customer: recency = days from their latest order to the
    corpus-wide latest order date (data-anchored — no wall clock),
    frequency = order count, monetary = lifetime spend in exact
    integer cents. Each dimension is scored 1..n_tiles with ``ntile``
    (1 = best), ties broken by customer key for a total order, and the
    concatenated code (e.g. '111' = champions) is aggregated to one
    row per segment.

    Scale notes: the per-customer aggregate is a partial-agg shuffle
    on the customer key; the ntile windows are GLOBAL (single ordered
    partition) — fine for customer-grain data (orders-of-magnitude
    smaller than fact tables), but for a billion-key population swap
    the scoring step for quantile boundaries from
    ``curation.quantile_bins`` (approx_percentile + broadcast join,
    no global sort).
    """
    from pyspark.sql import Window

    nt = int(n_tiles)
    if not 2 <= nt <= 9:
        # single-digit scores keep the concatenated code collision-free
        # ((1,11,1) and (11,1,1) would both render '1111') and make the
        # lexicographic segment sort the numeric one
        raise ValueError(f"n_tiles must be in 2..9, got {n_tiles}")

    per_cust = orders.groupBy(F.col(cust_col).alias("custkey")).agg(
        F.max(date_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.round(F.col(amount_col) * 100).cast("bigint")
        ).alias("monetary_cents"),
    )
    anchor = per_cust.agg(F.max("__last").alias("__anchor"))
    scored = per_cust.join(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff(F.col("__anchor"), F.col("__last"))
    )
    scored = (
        scored.withColumn(
            "r_score",
            F.ntile(nt).over(
                Window.orderBy(F.col("recency_days").asc(), "custkey")
            ),
        )
        .withColumn(
            "f_score",
            F.ntile(nt).over(
                Window.orderBy(F.col("frequency").desc(), "custkey")
            ),
        )
        .withColumn(
            "m_score",
            F.ntile(nt).over(
                Window.orderBy(F.col("monetary_cents").desc(), "custkey")
            ),
        )
    )
    return (
        scored.groupBy(
            F.concat_ws(
                "", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("total_cents"),
        )
        # half-up average in EXACT integer arithmetic: floor((2t+n)/2n)
        # — a double avg rounds half-cent boundaries differently across
        # engines (HALF_UP on the decimal string vs on the raw binary)
        .withColumn(
            "avg_cents",
            F.expr(
                "(2 * total_cents + n_customers) div (2 * n_customers)"
            ),
        )
    )


def pareto_front(
    df: DataFrame,
    group_col: str,
    max_col: str,
    min_col: str,
) -> DataFrame:
    """Per-group Pareto frontier: keep rows not dominated by any other
    row in the group, maximizing ``max_col`` while minimizing
    ``min_col`` (dominated = another row is >= on the max objective,
    <= on the min objective, and strictly better on at least one).

    Window-only skyline — NO self-join, NO all-pairs: dense-rank the
    max objective, then one running ``min(min_col)`` over strictly
    better ranks (integer-rank RANGE frame excludes ties exactly);
    equal-``max_col`` dominance is a second per-(group, rank) window.
    Two window passes over one partitioning = one shuffle.
    """
    from pyspark.sql import Window

    pr = F.dense_rank().over(
        Window.partitionBy(group_col).orderBy(F.col(max_col).desc())
    )
    ranked = df.withColumn("__pr", pr)
    best_higher = F.min(min_col).over(
        Window.partitionBy(group_col)
        .orderBy("__pr")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    best_tied = F.min(min_col).over(
        Window.partitionBy(group_col, "__pr")
    )
    return (
        ranked.withColumn("__bh", best_higher)
        .withColumn("__bt", best_tied)
        .where(
            (F.col("__bh").isNull() | (F.col(min_col) < F.col("__bh")))
            & (F.col(min_col) == F.col("__bt"))
        )
        .drop("__pr", "__bh", "__bt")
    )


def group_entropy(
    df: DataFrame, key_col: str, cat_col: str
) -> DataFrame:
    """Shannon entropy (bits) of each key's categorical distribution —
    the behavioral-diversity profile (0 = every event identical;
    log2(k) = uniform over k categories). Also emits the normalized
    form (entropy / log2(n_types)) so keys with different category
    counts compare on one [0,1] scale.

    Shape: (key, cat) hash count → per-key total via a window-free
    second aggregate (sum carried alongside the entropy terms) — two
    map-side-combinable aggregates, no join back, no window. Per-key
    work is O(categories), so 100 TB of events reduces to the tiny
    (key × category) grid before anything expensive happens."""
    counts = df.groupBy(key_col, cat_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # entropy = log2(n) - sum(c*log2(c))/n  — an algebraic form whose
    # terms are all map-side partial sums (no per-row p = c/n column,
    # which would need n joined back before the final aggregate)
    c = F.col("__c").cast("double")
    per_key = counts.groupBy(key_col).agg(
        F.sum("__c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(c * F.log2(c)).alias("__clog"),
    )
    n = F.col("n_events").cast("double")
    # abs(): a single-category key cancels to ±1e-16, and the SIGN of
    # that noise is reduction-order-dependent — abs keeps both this
    # engine and any sequential re-implementation on "0.0", never
    # "-0.0" (entropy is mathematically ≥ 0)
    ent = F.abs(F.log2(n) - F.col("__clog") / n)
    norm = F.when(
        F.col("n_types") > 1, ent / F.log2(F.col("n_types").cast("double"))
    ).otherwise(F.lit(0.0))
    return per_key.select(
        key_col,
        "n_events",
        "n_types",
        F.round(ent, 6).alias("entropy_bits"),
        F.round(norm, 6).alias("entropy_norm"),
    )
