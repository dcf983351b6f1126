"""Corpus-level token statistics: collocations, vocabulary coverage,
and frequent-item (heavy-hitter) detection.

These are the descriptive-statistics passes a training-data pipeline
runs before and after filtering: which word pairs are collocations
(boilerplate detection, tokenizer-merge candidates), what fraction of
each document is out-of-vocabulary (noise / wrong-language signal),
and which values dominate a key (skew discovery before a join).

Scale shapes (all pure DataFrame, no UDFs):

- ``bigram_lift``: one explode over the corpus feeding ONE map-side-
  combined count per bigram; unigram counts and the total-token scalar
  are vocabulary-sized and broadcast. Association strength is the
  *lift* c_xy·N / (c_x·c_y) — the exp of PMI, same ranking — computed
  as a single IEEE division of exact integer products, so the value
  (not just the order) is portable to the SQL oracle bit-for-bit,
  with no libm ``ln`` in the hash path.
- ``vocab_coverage``: pass 1 builds the top-V vocabulary (map-side
  combine, V rows out); pass 2 re-walks the corpus once with the
  vocabulary broadcast. OOV rate per document without any corpus-side
  shuffle beyond the per-document re-group.
- ``heavy_hitters``: exact support-threshold frequent items via one
  map-side-combined count; the one-pass sketch twin
  (``DataFrame.freqItems``, lossy counting) is mergeable and
  shuffle-free at any scale, and its superset guarantee (every true
  hitter appears; false positives possible) is what the registry op
  attests.

Reference scope: the reference has no corpus analytics (its text
surface is log payloads); these extend SURVEY.md's LLM-data-pipeline
section alongside operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_ws, word_shingles
from .width import ensure_wide


def bigram_lift(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-k word-bigram collocations by lift = c_xy·N / (c_x·c_y)
    (monotone in PMI). Bigram counts keep multiplicity (one explode,
    map-side combine); unigram counts and N are broadcast. Determinism:
    exact integer counts, one double division, ties by bigram text.

    One corpus pass: the unigram AND bigram streams explode out of a
    single tokenization (bigrams are adjacent-token joins of the same
    token array ``word_shingles`` would rebuild from scratch), tagged
    1/2 and counted in ONE map-side-combined aggregate. The previous
    two-branch spelling tokenized the corpus twice — once per count
    family — and the tokenizer is the dominant cost of the op. The
    combined count frame is vocabulary-sized; persisting it makes the
    three consumers (bigram table, unigram lookup, total scalar) read
    it instead of re-walking the corpus."""
    docs = ensure_wide(docs)  # 1-file scans would tokenize on one core
    toks = tokens_ws(F.lower(F.col(text_col)))

    def tagged(ts):
        unis = F.transform(
            ts, lambda t: F.struct(F.lit(1).alias("n"), t.alias("term"))
        )
        m = F.size(ts) - F.lit(1)
        bis = F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.struct(
                    F.lit(2).alias("n"),
                    F.concat_ws(" ", F.slice(ts, i, 2)).alias("term"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,term:string>>"))
        return F.concat(unis, bis)

    terms = docs.select(
        F.explode(
            F.flatten(F.transform(F.array(toks), tagged))
        ).alias("t")
    ).select(F.col("t.n").alias("n"), F.col("t.term").alias("term"))
    counts = (
        terms.groupBy("n", "term").agg(F.count("*").alias("c")).persist()
    )
    uni = counts.where(F.col("n") == 1).select(
        F.col("term").alias("tok"), F.col("c").alias("c1")
    )
    total = uni.agg(F.sum("c1").alias("n_total"))
    bi = (
        counts.where((F.col("n") == 2) & (F.col("c") >= min_count))
        .select(F.col("term").alias("bigram"), F.col("c").alias("c_xy"))
        .withColumn("x", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("y", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
    )
    ux = uni.select(F.col("tok").alias("x"), F.col("c1").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c1").alias("c_y"))
    return (
        bi.join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            "c_xy",
            F.round(
                (F.col("c_xy") * F.col("n_total"))
                / (F.col("c_x") * F.col("c_y")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("bigram"))
        .limit(k)
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 20,
) -> DataFrame:
    """Per-document OOV statistics against the corpus top-``vocab_size``
    vocabulary (count desc, token asc tie-break — deterministic).
    Output: id, n_tokens, n_oov, oov_rate."""
    toks = ensure_wide(docs, id_col).select(
        F.col(id_col), F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok")
    )
    # top-V via orderBy+limit, NOT a no-partition row_number window: the
    # former compiles to a distributed TakeOrderedAndProject, the latter
    # would drag every distinct token through one sorting task
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c1"))
        .orderBy(F.col("c1").desc(), F.col("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    support: float = 0.02,
    attest_sketch: bool = True,
) -> DataFrame:
    """Exact frequent items: values whose count exceeds ``support``·N,
    with their count and share. The threshold test is done in EXACT
    integer arithmetic (cnt·denom > N·numer with support = numer/denom
    from its decimal literal) — a float product could round across the
    boundary differently from the SQL oracle's DECIMAL comparison when
    N·support lands exactly on a count. When ``attest_sketch`` is set,
    also verify each hitter against the one-pass lossy-counting sketch
    (``DataFrame.freqItems``): the sketch guarantees a SUPERSET of the
    true hitters, so ``in_sketch`` must be true for every row — the
    derived check the oracle reproduces as literal TRUE."""
    from fractions import Fraction

    frac = Fraction(str(support))
    numer, denom = frac.numerator, frac.denominator
    counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n_total"))
    out = (
        counts.crossJoin(F.broadcast(total))
        .where(
            F.col("cnt") * F.lit(denom) > F.col("n_total") * F.lit(numer)
        )
        .select(
            col,
            "cnt",
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("share"),
        )
    )
    if attest_sketch:
        sketch = df.freqItems([col], support=support)
        items = [r for r in sketch.first()[0]]
        out = out.withColumn(
            "in_sketch",
            F.col(col).isin(items)
            if items
            else F.lit(False),
        )
    return out.orderBy(F.col("cnt").desc(), F.col(col))


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document novelty contribution: the share of a doc's word
    n-gram shingles that appear in NO earlier document (earlier =
    smaller ``id_col`` — ingestion order). A redundancy-curation
    signal: novelty ≈ 0 marks documents that add nothing the corpus
    hasn't seen, without running any pair-wise dedup.

    Shape: ``n_shingles`` is a pure per-doc projection (no shuffle at
    all — distinct-shingle count straight off the scan). The novelty
    side explodes distinct shingles, hashes each to a bigint (the
    shuffle carries 8-byte keys, never shingle text), and reduces to
    first-seen doc via ``groupBy(h).min(id)`` — a MAP-SIDE-COMBINING
    aggregate, so the one hash shuffle moves (h, partial-min) pairs,
    not every (doc, shingle) row, and no WindowExec sort ever runs.
    Winner counts re-key by doc (tiny frame) and left-join the
    projection. Linear in corpus shingles. Deterministic given ids,
    so the oracle reproduces it exactly (a 64-bit hash collision
    would merge two shingles — ~1e-7 odds at millions of distinct
    shingles, and only ever a marginal novelty shift at corpus
    scale).
    """
    df = ensure_wide(df, id_col)  # shingling must not run one-core
    # drop shingle-less docs on the CHEAP equivalent predicate (a doc
    # has ≥1 word n-gram iff it has ≥ n tokens): filtering on
    # n_shingles itself makes Catalyst push the filter below the
    # projection WITH a full copy of the shingle expression — the
    # heaviest expression in the op would run twice per row
    per_doc = (
        df.where(F.size(tokens_ws(F.col(text_col))) >= shingle_n)
        .select(
            F.col(id_col).alias("id"),
            F.size(
                F.array_distinct(word_shingles(F.col(text_col), shingle_n))
            ).cast("bigint").alias("n_shingles"),
        )
    )
    first_seen = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), shingle_n))
            ).alias("sh"),
        )
        .select("id", F.xxhash64("sh").alias("h"))
        .groupBy("h")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return per_doc.join(first_seen, "id", "left").select(
        "id",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0))
            / F.col("n_shingles"),
            6,
        ).alias("novelty"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 500,
) -> DataFrame:
    """Zipf power-law fit of the corpus frequency distribution: OLS of
    ln(freq) on ln(rank) over the ``top_k`` most frequent tokens →
    one row (n_types, n_tokens, alpha = −slope, r2). Natural English
    sits near alpha ≈ 1; a corpus drifting far off (template spam,
    boilerplate floods, synthetic filler) shows up immediately, so
    this is a cheap whole-corpus health gauge.

    Shape: token hash-agg (map-side combined) → top-k by frequency
    (TakeOrdered — no global sort of the vocabulary) → rank + regr_*
    aggregates over the k-row frame. The corpus-sized work is the one
    token count; everything after runs on k rows.
    """
    counts = (
        ensure_wide(df)
        .select(F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("freq").alias("n_tokens"),
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(top_k)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    ranked = top.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("lr"),
        F.log(F.col("freq").cast("double")).alias("lf"),
    )
    fit = ranked.agg(
        F.round(-F.regr_slope(F.col("lf"), F.col("lr")), 4).alias("alpha"),
        F.round(F.regr_r2(F.col("lf"), F.col("lr")), 4).alias("r2"),
    )
    return totals.join(fit)  # 1 row × 1 row
