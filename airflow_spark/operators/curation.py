"""Corpus-curation operators for training-data pipelines: repetition
signals, benchmark decontamination, mixture sampling, group-disjoint
splits, and keyword (TF-IDF) retrieval.

Every operator is built-in-function DataFrame code (explode + hash-agg
+ join shapes with map-side combine) — the shuffles move tokens/ids,
never full documents, and every one is reproducible in ANSI SQL for
oracle attestation.

Reference analog: none (the reference orchestrates device telemetry);
these are the SURVEY.md §2 M5 LLM-pipeline extensions that make the
engine useful for corpus work at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_ws, tokens_ws, word_shingles
from .width import ensure_wide


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int | None = 4,
) -> DataFrame:
    """Gopher-style within-document repetition signals:

    - ``dup_word_frac`` — fraction of token occurrences that are
      repeats of an earlier token (1 - distinct/total),
    - ``top_bigram_frac`` — share of the most frequent word bigram in
      all bigram occurrences.

    Shape: the unigram signal is a pure projection; the bigram signal
    explodes bigrams into a (doc, bigram) count agg — partial-combine
    shuffles (id, 8-byte hash)-sized rows, then one windowed max per
    doc. Documents with < 2 tokens get 0.0 for both.

    ``decimals=None`` skips the output rounding (the ratios are single
    correctly-rounded IEEE divisions of exact integers, so unrounded
    they are bit-identical cross-engine — what tie-safe attestation
    needs, since small-integer ratios like 7/32 land exactly on
    d-decimal rounding ties)."""

    def rnd(col: Column) -> Column:
        return col if decimals is None else F.round(col, decimals)

    toks = tokens_ws(F.lower(F.col(text_col)))
    base = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        word_shingles(F.col(text_col), 2).alias("bigrams"),
    )
    dup_word = F.when(
        F.col("n_tok") > 0,
        rnd(1.0 - F.col("n_distinct") / F.col("n_tok")),
    ).otherwise(F.lit(0.0))
    uni = base.select("id", dup_word.alias("dup_word_frac"), "bigrams")
    bg = uni.select("id", F.explode("bigrams").alias("bg"))
    counts = bg.groupBy("id", "bg").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("tot_c")
    )
    top_frac = rnd(F.col("top_c") / F.col("tot_c"))
    return (
        uni.drop("bigrams")
        .join(per_doc, "id", "left")
        .select(
            "id",
            "dup_word_frac",
            F.coalesce(top_frac, F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, the number of word
    n-grams it shares with ANY benchmark doc (and the count of distinct
    benchmark docs hit). A corpus doc with n_shared > 0 leaks eval data
    and should be dropped before training.

    Shape: benchmark n-grams form a small distinct set (broadcastable
    when the benchmark is benchmark-sized); corpus n-grams explode and
    hash-join against it — the join output is only the contaminated
    slice. Never a cross join."""
    bench_sh = (
        benchmark.select(
            F.col(id_col).alias("bench_id"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), shingle_n))
            ).alias("sh"),
        )
    )
    corpus_sh = ensure_wide(corpus, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle_n))
        ).alias("sh"),
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("id")
        .agg(
            # distinct grams, NOT join pairs: a gram occurring in three
            # benchmark docs must count once toward this doc's overlap
            F.countDistinct("sh").alias("n_shared"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.coalesce("n_bench_docs", F.lit(0)).alias("n_bench_docs"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sample_mixture(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    total_rows: int,
    order_by: str,
) -> DataFrame:
    """Deterministic mixture sampling: take ``round(weight_g × total)``
    rows per group, smallest ``order_by`` first (domain-weighted corpus
    mixing — e.g. 60% web / 30% code / 10% wiki).

    Window-rank take per group: one shuffle on the group key. Groups
    absent from ``weights`` contribute 0 rows."""
    quota = F.create_map(
        *[
            x
            for g, w in sorted(weights.items())
            for x in (F.lit(g), F.lit(int(round(w * total_rows))))
        ]
    )
    w = Window.partitionBy(group_col).orderBy(order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.coalesce(quota[F.col(group_col)], F.lit(0)))
        .drop("__rn")
    )


def split_by_group_hash(
    df: DataFrame,
    group_col: str,
    split_weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment that keeps every row of a *group* in
    the same split (leakage-safe when the group is a dedup-cluster or
    source key). The assignment hashes only the group value with a
    portable md5-derived 32-bit integer, so it is stable across runs,
    engines, and corpus growth (adding rows never moves an existing
    group).

    ``split_weights`` like {'train': 0.8, 'val': 0.1, 'test': 0.1}
    (must sum to ~1) — boundaries over buckets 0..9999, split names
    assigned in sorted order."""
    from ..functions.hashing import md5_uniform

    total = sum(split_weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split_weights must sum to 1, got {total}")
    bucket = md5_uniform(F.col(group_col), salt, modulus=10000)
    expr = None
    lo = 0.0
    for name, wgt in sorted(split_weights.items()):
        hi = lo + wgt * 10000
        cond = (bucket >= F.lit(int(round(lo)))) & (bucket < F.lit(int(round(hi))))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn("split", expr.otherwise(F.lit(sorted(split_weights)[-1])))


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the RAG/context-window preprocessing op. Output: (doc_id,
    chunk_idx, chunk_text, n_chunk_chars); chunk i covers
    [i*(chunk_chars-overlap), ...+chunk_chars).

    Pure codegen: sequence → transform → explode, no UDF, no shuffle —
    chunking is a projection over the scan, and at scale the output
    inherits the input's partitioning (write ``partitionBy`` on
    whatever downstream needs). Short docs yield exactly one chunk."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    # null text behaves like the empty string (one empty chunk):
    # explode over a null-propagated sequence would silently DROP the
    # document's row, losing the doc_id from downstream joins
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.greatest(
        F.ceil((F.length(c) - F.lit(overlap)) / F.lit(step)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.substring(c, i * step + 1, chunk_chars).alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("ch")
    ).select(
        id_col,
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.length("ch.chunk_text").alias("n_chunk_chars"),
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 1_000_000,
) -> DataFrame:
    """CCNet-style language-model quality score, unigram edition: score
    each document by the mean log-probability of its tokens under the
    corpus's own unigram distribution. Outlier docs (gibberish, wrong
    language, boilerplate floods) sit in the tails; the score feeds
    percentile-based corpus filtering.

    Shape: one explode → token-count agg (map-side combine) builds the
    "model" (≤ ``vocab_cap`` rows); docs join against it on token —
    the model is dimension-table-sized, so Catalyst broadcasts it.
    Unseen-token smoothing: count 0.5 (add-half), portable arithmetic.
    """
    toks = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok"),
    )
    # top-frequency vocabulary, DETERMINISTIC: a bare limit() keeps an
    # arbitrary partition-order subset, which could drop the most
    # frequent tokens and change scores between runs
    counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok"))
        .limit(vocab_cap)
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        toks.join(F.broadcast(counts), "tok", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.log(
                F.coalesce(F.col("c").cast("double"), F.lit(0.5))
                / F.col("n_total").cast("double")
            ).alias("lp"),
        )
        .groupBy("id")
        .agg(
            F.round(F.avg("lp"), 4).alias("mean_logprob"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    return scored


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Join-key skew diagnosis: per-key counts for the ``top_n``
    hottest keys plus each key's share of all rows — the planning view
    that decides between a plain shuffle join, broadcast, or
    ``salted_join``. One hash-agg + TakeOrdered; no global sort."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col(key_col))
        .limit(top_n)
    )


def tfidf_keyword_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by TF-IDF score for a bag of query terms.

    score(d) = Σ_t tf(t, d) × ln(N / df(t)) over lowercase whitespace
    tokens. One explode + two hash-aggs; the per-term document
    frequencies are |terms| rows — broadcast back. Deterministic ties
    broken by id. The scan shape a 100 TB ad-hoc corpus probe needs:
    no inverted index required, one pass."""
    terms = [t.lower() for t in query_terms]
    toks = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok"),
    ).where(F.col("tok").isin(terms))
    # corpus size as a 1-row broadcast, not a driver-side .count() —
    # keeps the whole computation one lazy plan / one job
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
    # persisted: df(t) AND the scored join both read tf, and an
    # unpersisted plan re-tokenizes the corpus per consumer; tf is
    # bounded by |terms| × matched docs — trivially cacheable
    tf = (
        toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf")).persist()
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    idf = F.log(F.col("__n").cast("double") / F.col("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(n_docs)
        .withColumn("w", F.col("tf") * idf)
        .groupBy("id")
        .agg(F.round(F.sum("w"), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def bm25_keyword_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by Okapi BM25 for a bag of query terms — the
    length-normalized upgrade of ``tfidf_keyword_search`` (long docs no
    longer win on raw term counts).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the Lucene-style non-negative idf(t) = ln(1 + (N − df + 0.5) /
    (df + 0.5)); dl = whitespace token count of d, avgdl its corpus
    mean.

    One pass, same shape as TF-IDF: doc length is computed in the SAME
    projection as the token explode (carried through the tf aggregate —
    no second scan, no N-row join), N/avgdl are a 1-row broadcast, df(t)
    is |terms| rows broadcast back.
    """
    terms = [t.lower() for t in query_terms]
    lowered = F.lower(F.col(text_col))
    toks = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        token_count_ws(lowered).alias("dl"),
        F.explode(tokens_ws(lowered)).alias("tok"),
    ).where(F.col("tok").isin(terms))
    stats = F.broadcast(
        df.agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg(token_count_ws(lowered)).alias("__avgdl"),
        )
    )
    # persisted for the same two-consumer reason as in
    # tfidf_keyword_search (df(t) + scored join)
    tf = (
        toks.groupBy("id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    idf = F.log(
        1
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(stats)
        .withColumn("w", idf * F.col("tf") * F.lit(k1 + 1.0) / norm)
        .groupBy("id")
        .agg(F.round(F.sum("w"), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def quantile_bins(
    df: DataFrame,
    value_col: str,
    probs: list[float] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Bucket rows by exact quantile boundaries of ``value_col`` and
    return per-bucket (count, min, max) — feature binning / histogram
    equalization for training-data balance audits.

    The boundaries come from ONE exact ``percentile`` aggregate
    (distributed sort-agg), broadcast as a single row; bucket
    assignment is then a pure projection (count of boundaries below the
    value) — no global window, no single-partition sort. At extreme
    scale swap ``percentile`` for ``percentile_approx`` (same plan
    shape, mergeable sketch).
    """
    probs = probs or [0.25, 0.5, 0.75]
    bounds = F.broadcast(
        df.agg(
            F.expr(
                "percentile({}, array({}))".format(
                    value_col, ", ".join(map(repr, probs))
                )
            ).alias("__bounds")
        )
    )
    v = F.col(value_col)
    bucket = (
        (F.size(F.filter(F.col("__bounds"), lambda bnd: v > bnd)) + 1)
        .cast("bigint")
        .alias("bucket")
    )
    # null values would land in bucket 1 (the > predicate is null for
    # them, filter drops them, size()=0) and skew its count while the
    # boundaries — percentile ignores nulls — describe real values only
    return (
        df.where(v.isNotNull())
        .crossJoin(bounds)
        .select(bucket, v.alias("__v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("__v"), 2).alias("lo"),
            F.round(F.max("__v"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def duplicated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    min_docs: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-wide repeated-passage mining: the word n-grams that occur
    in at least ``min_docs`` distinct documents, most-shared first.
    This is the discovery half of substring-level dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"):
    boilerplate/license/template passages show up here long before any
    document-pair similarity fires, because the sharing is many-to-many
    at the passage level, not pairwise at the document level.

    Scale shape: explode distinct per-doc n-grams (distinct first, so a
    passage repeated inside ONE doc contributes once), then a single
    hash-agg on the gram with map-side combine, HAVING-filter to the
    shared tail, and a TakeOrderedAndProject top-k — never a self-join,
    never all-pairs. At 100 TB you would additionally group on
    xxhash64(gram) and re-attach one exemplar string via min(gram);
    the shuffle already carries grams once per containing doc, which
    the distinct-per-doc step has capped.

    Output: (gram, n_docs, first_doc) ordered by n_docs desc, gram."""
    grams = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle_n))
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            # (id, gram) rows are already distinct by construction
            # (array_distinct per doc), so plain count == distinct
            # count — without the Expand + two-phase distinct agg
            F.count(F.lit(1)).alias("n_docs"),
            F.min("id").alias("first_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("gram"))
        .limit(k)
    )


def remove_duplicated_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """The *removal* half of substring-level dedup (Lee et al. /
    RefinedWeb): cut corpus-duplicated passages out of every document,
    keeping the rest of the text intact. Documents are segmented into
    consecutive non-overlapping ``seg_words``-token windows; any
    segment whose exact (lowercased) text occurs in at least
    ``min_docs`` distinct documents is dropped, and each document is
    reassembled from its surviving segments in order.

    Complements :func:`duplicated_passages` (which only *discovers*
    shared passages): boilerplate/license/template floods are removed
    at the passage level even when the containing documents are
    nowhere near whole-document duplicates.

    Scale shape: explode segments (short strings, bounded by
    ``seg_words`` tokens) → one distinct-doc-count hash-agg builds the
    ban list (shared segments only — usually dimension-table-sized, so
    Catalyst broadcasts the anti-join) → surviving segments re-agg to
    documents via an array_sort(collect_list(struct(pos, seg))) —
    per-doc state is bounded by the doc's own length, never by corpus
    size. At 100 TB you would additionally ban on xxhash64(seg) so the
    count shuffle moves 8-byte keys; the reassembly shuffle is the
    irreducible cost of rewriting the corpus.

    Output: (id, clean_text, n_removed) — ``clean_text`` is '' when
    every segment of the doc was corpus-duplicated.
    """
    w = seg_words
    toks = tokens_ws(F.lower(F.col(text_col)))
    n_segs = F.ceil(F.size(toks) / F.lit(float(w))).cast("bigint")
    segs = F.when(F.size(toks) > 0, F.transform(
        F.sequence(F.lit(1), n_segs),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", F.slice(toks, (i - F.lit(1)) * w + F.lit(1), F.lit(w))
            ).alias("seg"),
        ),
    )).otherwise(F.array().cast("array<struct<pos:bigint,seg:string>>"))
    base = ensure_wide(df, id_col).select(F.col(id_col).alias("id"), n_segs.alias("n_segs"),
                     segs.alias("segs"))
    exploded = base.select("id", F.explode("segs").alias("s")).select(
        "id", F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg")
    )
    banned = (
        exploded.groupBy("seg")
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("seg")
    )
    kept = exploded.join(banned, "seg", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("id", "n_segs")
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    score_col: str = "score",
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of retriever result lists:
    ``rrf(d) = Σ_r 1/(k0 + rank_r(d))`` — the standard way to combine
    lexical (TF-IDF/BM25) and vector retrievers without score
    calibration, since only ranks enter the sum.

    Inputs are bounded top-k lists (each ≤ a few hundred rows by
    contract — the retrievers already did the corpus-scale work), so
    the global rank windows and outer joins here are tiny; ranks are
    assigned by (score desc, id) for deterministic ties, and the
    fused sum is a fixed-order chain of IEEE adds — portable to the
    SQL oracle. Documents missing from one list contribute 0 from it.
    """
    from functools import reduce

    ranked = []
    for i, df in enumerate(rankings):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        ranked.append(
            df.select(F.col(id_col), F.row_number().over(w).alias(f"__r{i}"))
        )
    joined = reduce(
        lambda a, b: a.join(b, id_col, "full_outer"), ranked
    )
    terms = [
        F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"__r{i}")), F.lit(0.0)
        )
        for i in range(len(rankings))
    ]
    total = reduce(lambda a, b: a + b, terms)
    return (
        joined.select(id_col, F.round(total, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    total_rows: int,
    order_by: str,
) -> DataFrame:
    """Temperature-flattened mixture sampling (α = 0.5): per-group
    quotas ∝ sqrt(group count), the multilingual-corpus rebalancing
    that upweights low-resource groups relative to proportional
    sampling. Unlike ``sample_mixture`` the weights come from the DATA
    (no hand-tuned dict) — a rarely-seen language automatically gets
    more than its raw share.

    sqrt (not pow) keeps the shares IEEE-exact across engines; quotas
    are floor(total × share) so no round-half ambiguity. All
    engine-side: group counts → broadcast share frame → window-rank
    take on the same group shuffle."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = Window.partitionBy()
    quotas = counts.select(
        group_col,
        F.floor(
            F.lit(float(total_rows))
            * F.sqrt(F.col("__c").cast("double"))
            / F.sum(F.sqrt(F.col("__c").cast("double"))).over(tot)
        ).alias("__quota"),
    )
    w = Window.partitionBy(group_col).orderBy(order_by)
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram language-model quality score (the unigram scorer's
    context-aware sibling): mean log P(w_i | w_{i-1}) over each
    document's word bigrams, with add-half smoothing over the corpus
    vocabulary — P = (c(prev, w) + 0.5) / (c_ctx(prev) + 0.5·V).
    Repetitive boilerplate scores HIGH (its bigrams are corpus-
    frequent), gibberish word salads score LOW even when every single
    word is common — the signal unigrams structurally miss.

    Shape: one posexplode + a lag window per doc builds bigrams on the
    (id) shuffle; bigram and context counts are corpus-vocab-sized
    aggregates broadcast back. Docs with < 2 tokens get score NULL
    (no bigram evidence), kept so the filter stage decides their fate.
    Returns (id, n_bigrams, score)."""
    toks = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_ws(F.lower(F.col(text_col)))).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = toks.select(
        "id", F.lag("tok").over(w).alias("prev"), F.col("tok")
    ).where(F.col("prev").isNotNull())
    bg_counts = bigrams.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).alias("__cbg")
    )
    ctx_counts = bigrams.groupBy("prev").agg(
        F.count(F.lit(1)).alias("__cctx")
    )
    vocab = toks.agg(F.countDistinct("tok").alias("__v"))
    # bg_counts is DISTINCT-BIGRAM-sized (content-scaled, far beyond
    # vocabulary) — never broadcast it; the shuffle join reuses the
    # (prev, tok) exchange its groupBy already created. ctx_counts and
    # vocab ARE vocabulary-bounded, so those stay broadcast.
    scored = (
        bigrams.join(bg_counts, ["prev", "tok"], "left")
        .join(F.broadcast(ctx_counts), "prev", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("__cbg").cast("double"), F.lit(0.0)) + 0.5)
                / (
                    F.coalesce(F.col("__cctx").cast("double"), F.lit(0.0))
                    + 0.5 * F.col("__v").cast("double")
                )
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("score"),
    )
    # keep docs with no bigrams (score NULL): visible, not dropped
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return all_ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "score",
    )


def kfold_splits(
    df: DataFrame,
    group_col: str,
    k: int,
    salt: str = "fold",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic, leakage-safe k-fold assignment: every row of a
    group (source / dedup cluster / author) lands in the same fold via
    the portable md5 group hash — stable across runs, engines, and
    corpus growth (adding rows never moves an existing group), so CV
    folds and their caches survive incremental ingestion. Projection
    only: no shuffle, no RNG state."""
    from ..functions.hashing import md5_uniform

    if k < 2:
        raise ValueError(f"kfold_splits needs k >= 2, got {k}")
    return df.withColumn(
        out_col, md5_uniform(F.col(group_col), salt, modulus=k).cast("int")
    )


def distinctive_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 3,
) -> DataFrame:
    """Characteristic vocabulary per corpus slice (c-TF-IDF, the
    BERTopic-style class-based variant): for each group, the top-``k``
    tokens by within-group frequency weighted against how many OTHER
    groups use the token — "what does this source talk about that the
    others don't". The profiling pass run on every new corpus slice
    before mixing decisions.

    score = (ctf / group_tokens) · ln(1 + n_groups / df_groups), with
    df_groups = groups containing the token. Ranking uses the ROUNDED
    score with a token tiebreak so the top-k set is reproducible
    across engines (1-ulp libm differences can't reorder ties).

    Shape: one explode → (group, token) hash count (map-side combine)
    → token group-frequency and per-group totals derived from that
    same small frame → window top-k per group. The corpus is read
    once; everything after the first aggregate is vocabulary-sized —
    ``gt`` is PERSISTED because four consumers read it (totals, group
    document-frequency, the group count, and the scored join) and an
    unpersisted plan re-tokenizes the corpus once per consumer (the
    dominant cost of the op, measured 4× the one-pass wall)."""
    gt = (
        ensure_wide(df, id_col)
        .select(
            F.col(group_col).alias("grp"),
            F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("ctf"))
        .where(F.col("ctf") >= min_count)
        .persist()
    )
    totals = gt.groupBy("grp").agg(F.sum("ctf").alias("gtot"))
    dfg = gt.groupBy("tok").agg(F.count(F.lit(1)).alias("df_groups"))
    n_groups = gt.select("grp").distinct().agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    scored = (
        gt.join(F.broadcast(totals), "grp")
        .join(F.broadcast(dfg), "tok")
        .crossJoin(F.broadcast(n_groups))
        .select(
            "grp",
            "tok",
            "ctf",
            F.round(
                (F.col("ctf") / F.col("gtot"))
                * F.log(
                    1.0 + F.col("n_groups") / F.col("df_groups")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col), "rank", "tok", "ctf", "score"
        )
    )
