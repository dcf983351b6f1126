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

from ..functions.numeric import snap_zero


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


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE
    aggregate pass (all C(n,2) ``corr`` aggregates share the scan and
    the partial-agg shuffle — the corpus is read once regardless of
    how many pairs). Output is long-form: (col_a, col_b, corr_ab),
    upper triangle only, built by unpivoting the single wide result
    row — the unpivot touches one row, never the corpus."""
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    wide = df.agg(
        *[
            F.corr(F.col(a), F.col(b)).alias(f"{a}__{b}")
            for a, b in pairs
        ]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"{a}__{b}").alias("corr_ab"),
            )
            for a, b in pairs
        ]
    )
    ex = wide.select(F.explode(entries).alias("e"))
    return ex.select("e.col_a", "e.col_b", "e.corr_ab").orderBy(
        "col_a", "col_b"
    )


def two_proportion_ztest(
    df: DataFrame,
    variant_col,
    success_col,
) -> DataFrame:
    """Two-proportion z-test over a binary variant assignment: per
    variant n and successes (exact integers), pooled rate, and the
    z statistic (p1 − p2) / sqrt(p(1−p)(1/n1 + 1/n2)) — the A/B-test
    significance readout, one conditional-count pass.

    ``variant_col`` must yield exactly two values 0/1 (bigint);
    ``success_col`` a boolean. Returns a single row:
    (n0, s0, n1, s1, p0, p1, z)."""
    v = variant_col if not isinstance(variant_col, str) else F.col(variant_col)
    s = success_col if not isinstance(success_col, str) else F.col(success_col)
    staged = df.select(
        v.cast("long").alias("__v"), s.cast("int").alias("__s")
    )
    agg = staged.agg(
        F.sum(F.when(F.col("__v") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("__v") == 0, F.col("__s")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("__v") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("__v") == 1, F.col("__s")).otherwise(0)).alias("s1"),
    )
    p0 = F.col("s0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    pool = (F.col("s0") + F.col("s1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pool
        * (1.0 - pool)
        * (
            1.0 / F.col("n0").cast("double")
            + 1.0 / F.col("n1").cast("double")
        )
    )
    return agg.select(
        "n0",
        "s0",
        "n1",
        "s1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        # nullif guards the degenerate pooled rates (0 or 1): the SE
        # is 0 there and ANSI mode would raise on the division — the
        # z statistic is undefined, so NULL is the honest answer
        F.round((p0 - p1) / F.nullif(se, F.lit(0.0)), 4).alias("z"),
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Gini concentration coefficient per group via the rank formula
    ``G = (2*Σ(i·x_i) - (n+1)·Σx) / (n·Σx)`` over values sorted
    ascending (ties broken by ``id_col`` — the coefficient itself is
    tie-invariant because equal x contribute symmetrically).

    One shuffle (the per-group rank window), then a partial-agg
    groupBy — rank windows partition by group, so no global sort and
    no single-partition straggler at scale. ``value_col`` must be a
    non-negative integer column (pass cents, not dollars): the
    weighted sum accumulates in decimal(38,0) — exact, and immune to
    the int64 overflow Σ(i·x) ≈ n²/2·mean(x) hits for million-member
    groups — so the result is reproducible across engines. An
    all-zero group yields NULL (concentration of nothing is
    undefined), not a divide error.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(group_col, value_col, id_col).withColumn(
        "__i", F.row_number().over(w)
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("__total"),
        F.sum(
            F.col("__i").cast("decimal(19,0)")
            * F.col(value_col).cast("decimal(19,0)")
        ).alias("__iw"),
    )
    n = F.col("n").cast("double")
    total = F.nullif(F.col("__total").cast("double"), F.lit(0.0))
    gini = (2.0 * F.col("__iw").cast("double") - (n + 1.0) * total) / (
        n * total
    )
    return agg.select(
        group_col,
        "n",
        F.col("__total").alias("total"),
        F.round(gini, 6).alias("gini"),
    )


def theil_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Theil T inequality index per group — the additively decomposable
    complement to ``gini_by_group`` (subgroup Theils + a between-group
    term reconstruct the total; Gini can't do that).

    ONE aggregate pass, no rank window at all: the identity
    ``T = (1/n)Σ(x/μ)ln(x/μ) = Σ(x·ln x)/Σx − ln(Σx/n)`` reduces the
    index to three mergeable partials (n, Σx, Σx·ln x) — map-side
    combine, one shuffle of 3 doubles per group. Zero/negative values
    are excluded (x·ln x has no finite contribution at 0; the standard
    Theil convention).
    """
    x = F.col(value_col).cast("double")
    pos = df.where(x > 0).select(
        group_col, x.alias("__x"), (x * F.log(x)).alias("__xlx")
    )
    agg = pos.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__s"),
        F.sum("__xlx").alias("__l"),
    )
    theil = F.col("__l") / F.col("__s") - F.log(
        F.col("__s") / F.col("n").cast("double")
    )
    return agg.select(group_col, "n", F.round(theil, 6).alias("theil"))


def _rank_sweep(
    df: DataFrame, value_col: str, label_col: str
) -> DataFrame:
    """Shared distinct-value rank sweep for the Mann-Whitney family
    (:func:`roc_auc`, :func:`mann_whitney_u`): per distinct value,
    positive/negative counts, the tie-group size, and the cumulative
    negatives STRICTLY BELOW — one hash agg plus one window over the
    distinct-value frame, never a global per-row rank.

    Rows with a NULL value or label are DROPPED (the standard
    estimator convention): a NULL would otherwise form its own rank
    group — and Spark (NULLS FIRST) and most other engines
    (NULLS LAST) would even rank it at opposite ends. The label
    contract is strictly binary: non-0/1 labels are dropped too
    (``neg_s`` is ``sum(1−y)``, so a stray 2 would contribute −1 to
    the negative count and silently corrupt AUC/U downstream)."""
    lab = F.col(label_col).cast("int")
    per_score = (
        df.select(F.col(value_col).alias("s"), lab.alias("y"))
        .where(F.col("s").isNotNull() & F.col("y").isin(0, 1))
        .groupBy("s")
        .agg(
            F.sum("y").alias("pos_s"),
            F.sum(1 - F.col("y")).alias("neg_s"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    return per_score.select(
        "pos_s",
        "neg_s",
        (F.col("pos_s") + F.col("neg_s")).alias("t_s"),
        F.coalesce(F.sum("neg_s").over(w), F.lit(0)).alias("cumneg"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC (Mann-Whitney form, average-rank tie handling)
    for a numeric score against a 0/1 label — the quality-classifier
    acceptance metric before a filter model gates a corpus.

    Scale shape: the classic per-row global rank would be a full sort
    of N rows; instead scores collapse to the DISTINCT-value frame
    first (one hash agg with per-score pos/neg counts), and the single
    cumulative window runs over that much smaller frame — the same
    design as the KS statistic (see :func:`_rank_sweep`; NULL scores
    and labels are excluded). AUC = Σ_s pos_s·(cumneg_<s +
    neg_s/2) / (P·N). Returns one row: n_pos, n_neg, auc."""
    swept = _rank_sweep(df, score_col, label_col)
    return swept.agg(
        F.sum("pos_s").cast("bigint").alias("n_pos"),
        F.sum("neg_s").cast("bigint").alias("n_neg"),
        F.round(
            F.try_divide(
                F.sum(
                    F.col("pos_s")
                    * (F.col("cumneg") + F.col("neg_s") / 2.0)
                ),
                F.sum("pos_s").cast("double")
                * F.sum("neg_s").cast("double"),
            ),
            6,
        ).alias("auc"),
    )


def calibration_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Reliability diagram data: equal-population score bins (ntile)
    with mean predicted score vs observed positive rate per bin — how
    a filter model's confidence maps to reality before its threshold
    is chosen.

    The global ntile is a single sort-window over (score, tiebreak) —
    deterministic under score ties. For billion-row populations swap
    the ntile for ``curation.quantile_bins`` (percentile boundaries
    broadcast back); at report scale the direct form is one shuffle."""
    order = [F.col(score_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.orderBy(*order)
    binned = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("int").alias("y"),
        F.ntile(n_bins).over(w).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("s"), 6).alias("mean_score"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Mann-Whitney U test (normal approximation) that group-1 values
    are stochastically larger than group-0's — the nonparametric
    two-sample test when the t-test's normality assumption is junk
    (latency/price distributions). Returns one row: n0, n1, u1, z.

    U is derived from the same distinct-value sweep as
    :func:`roc_auc` (U1 = AUC·n0·n1 with average-rank tie handling),
    so no global per-row rank ever happens (NULL values/labels are
    excluded — see :func:`_rank_sweep`); z uses the tie-corrected
    variance. Near-zero z snaps to 0.0 (FP sign noise, see the
    time-series family)."""
    swept = _rank_sweep(df, value_col, group_col)
    agg = swept.agg(
        F.sum("pos_s").cast("bigint").alias("n1"),
        F.sum("neg_s").cast("bigint").alias("n0"),
        F.sum(
            F.col("pos_s") * (F.col("cumneg") + F.col("neg_s") / 2.0)
        ).alias("u1"),
        # tie-correction mass: Σ t(t²−1) over tie groups
        F.sum(
            F.col("t_s").cast("double")
            * (F.col("t_s") * F.col("t_s") - 1)
        ).alias("tie_mass"),
    )
    n0, n1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    n = n0 + n1
    var_u = (
        n0 * n1 / 12.0
        * ((n + 1.0) - F.col("tie_mass") / (n * (n - 1.0)))
    )
    z = F.try_divide(F.col("u1") - n0 * n1 / 2.0, F.sqrt(var_u))
    return agg.select(
        "n0",
        "n1",
        F.round("u1", 2).alias("u1"),
        snap_zero(z, digits=4).alias("z"),
    )


def cohens_d(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Cohen's d effect size between group 1 and group 0 (pooled-SD
    standardized mean difference) — the "is it LARGE, not just
    significant" companion every A/B z-test needs at row counts where
    everything is significant. One aggregate pass (conditional
    sums); d = (μ1 − μ0) / s_pooled. The group column is a strictly
    binary 0/1 contract — other values are dropped, not folded into
    a group (``n0 = sum(1−y)`` would otherwise go negative)."""
    y = F.col(group_col).cast("int")
    v = F.col(value_col).cast("double")
    agg = (
        df.select(v.alias("v"), y.alias("y"))
        .where(F.col("y").isin(0, 1))
        .agg(
            F.sum("y").cast("bigint").alias("n1"),
            F.sum(1 - F.col("y")).cast("bigint").alias("n0"),
            F.avg(F.when(F.col("y") == 1, F.col("v"))).alias("m1"),
            F.avg(F.when(F.col("y") == 0, F.col("v"))).alias("m0"),
            F.var_samp(F.when(F.col("y") == 1, F.col("v"))).alias("v1"),
            F.var_samp(F.when(F.col("y") == 0, F.col("v"))).alias("v0"),
        )
    )
    n0, n1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    pooled = F.sqrt(
        ((n1 - 1) * F.col("v1") + (n0 - 1) * F.col("v0"))
        / (n1 + n0 - 2.0)
    )
    d = F.try_divide(F.col("m1") - F.col("m0"), pooled)
    return agg.select(
        "n0",
        "n1",
        F.round("m0", 4).alias("mean_0"),
        F.round("m1", 4).alias("mean_1"),
        snap_zero(d, digits=4).alias("cohens_d"),
    )


def cuped_effect(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    variant_col: str,
    split_ts: str,
) -> DataFrame:
    """CUPED-adjusted treatment effect (Deng et al. 2013): per-user
    PRE-period means serve as the control covariate for POST-period
    means — Y' = Y_post − θ·(X_pre − mean(X_pre)) with
    θ = cov(X, Y)/var(X) removes the between-user variance the
    pre-period already explains, which is how experiments reach
    significance in a fraction of the runtime. Returns one row:
    per-variant counts, the raw effect, the CUPED effect (same
    expectation, smaller variance), θ, and the variance-reduction
    share.

    Shape: one user-keyed conditional aggregate builds (pre, post)
    per user (only users observed in BOTH periods enter — CUPED is
    undefined without the covariate); one 1-row stats aggregate
    (θ, mean_pre) broadcasts back; one final aggregate. Nothing
    driver-side, no windows."""
    pre = F.avg(
        F.when(F.col(ts_col) < F.lit(split_ts).cast("timestamp"),
               F.col(value_col))
    )
    post = F.avg(
        F.when(F.col(ts_col) >= F.lit(split_ts).cast("timestamp"),
               F.col(value_col))
    )
    per_user = (
        # Strictly binary variant contract: a stray variant value
        # would be folded into control by the `~(grp == 1)` branches
        # below — drop it instead.
        df.where(F.col(variant_col).cast("int").isin(0, 1))
        .groupBy(F.col(user_col), F.col(variant_col).alias("grp"))
        .agg(pre.alias("x"), post.alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    stats = per_user.agg(
        F.try_divide(F.covar_samp("x", "y"), F.var_samp("x")).alias(
            "theta"
        ),
        F.avg("x").alias("mx"),
    )
    adj = per_user.crossJoin(F.broadcast(stats)).select(
        "grp",
        "y",
        (
            F.col("y")
            - F.col("theta") * (F.col("x") - F.col("mx"))
        ).alias("y_adj"),
        "theta",
    )
    g1 = F.col("grp") == 1
    agg = adj.agg(
        F.sum(F.when(~g1, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(g1, 1).otherwise(0)).cast("bigint").alias("n1"),
        (
            F.avg(F.when(g1, F.col("y")))
            - F.avg(F.when(~g1, F.col("y")))
        ).alias("__raw"),
        (
            F.avg(F.when(g1, F.col("y_adj")))
            - F.avg(F.when(~g1, F.col("y_adj")))
        ).alias("__cuped"),
        F.first("theta").alias("__theta"),
        F.try_divide(F.var_samp("y_adj"), F.var_samp("y")).alias("__vr"),
    )
    return agg.select(
        "n0",
        "n1",
        snap_zero(F.col("__raw"), digits=4).alias("effect_raw"),
        snap_zero(F.col("__cuped"), digits=4).alias("effect_cuped"),
        snap_zero(F.col("__theta"), digits=4).alias("theta"),
        snap_zero(1.0 - F.col("__vr"), digits=4).alias("var_reduction"),
    )
