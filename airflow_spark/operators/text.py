"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure built-in-function DataFrame code (codegen'd, vectorized over
the scan) — these run as projections with zero shuffles, so they cost
one corpus pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .width import ensure_wide
from ..functions.text import (
    char_shingles,
    digit_ratio,
    punct_ratio,
    token_count_bpeish,
    token_count_ws,
    tokens_ws,
    upper_ratio,
    whitespace_ratio,
)

# ---------------------------------------------------------------------------
# Language identification (stopword + script heuristic)
# ---------------------------------------------------------------------------

#: Compact per-language stopword profiles (top function words).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "on", "at", "by", "this", "are", "be", "or", "an"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "zu", "den", "von", "für", "auf", "im", "dem", "sich", "des"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "dans",
           "que", "qui", "pour", "pas", "sur", "avec", "au", "ce", "il"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "un", "de", "en",
           "que", "por", "para", "con", "no", "se", "del", "su", "al"],
    "zh": [],  # identified by script, not stopwords
}


def lang_id_col(text: Column | str, profiles: dict[str, list[str]] | None = None) -> Column:
    """Predicted language code. CJK script ratio decides 'zh'; otherwise
    argmax of stopword hit-rate per language profile (ties → 'und' if
    no stopword hits at all). One codegen expression — no UDF, no
    shuffle, no external model."""
    if profiles is None:
        profiles = LANG_PROFILES
    c = F.col(text) if isinstance(text, str) else text
    toks = F.transform(tokens_ws(c), lambda t: F.lower(t))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    cjk = F.regexp_count(c, F.lit(r"[一-鿿]")) / F.greatest(
        F.length(c), F.lit(1)
    )
    def _hits(words: list[str]):
        # Factory keeps the lambda unary (a 2-arg lambda would receive
        # the element index as its second argument).
        ws = tuple(words)
        return lambda t: t.isin(*ws)

    scores = [
        F.struct(
            (F.size(F.filter(toks, _hits(words))) / n_toks).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in profiles.items()
        if words
    ]
    best = F.array_max(F.array(*scores))
    return (
        F.when(cjk > 0.2, F.lit("zh"))
        .when(best["score"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    return df.withColumn(out_col, lang_id_col(text_col))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


def with_quality_score(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]:
    length band, mean word length band, stopword presence, low symbol
    noise. The shape follows public corpus-filtering heuristics
    (Gopher/C4-style rules); weights are transparent and tunable."""
    if stopwords is None:
        stopwords = LANG_PROFILES["en"]
    c = F.col(text_col)
    toks = F.transform(tokens_ws(c), lambda t: F.lower(t))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    # exact mean token length: the (len - n_toks + 1)/n_toks shortcut
    # assumes single-space separators, so multi-space/newline-formatted
    # text inflated it and could flip the wlen_ok band
    mean_wlen = (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / n_toks
    )
    stop_ratio = F.size(
        F.filter(toks, lambda t: t.isin(*stopwords))
    ) / n_toks

    len_ok = (F.length(c) >= 50) & (F.length(c) <= 100_000)
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    noise = punct_ratio(c) + digit_ratio(c)

    score = (
        F.when(len_ok, 0.3).otherwise(0.0)
        + F.when(wlen_ok, 0.2).otherwise(0.0)
        + F.least(stop_ratio * 2.5, F.lit(0.3))
        + F.greatest(F.lit(0.2) - noise, F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", token_count_ws(c))
        .withColumn("mean_word_len", F.round(mean_wlen, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 4))
        .withColumn("digit_ratio", F.round(digit_ratio(c), 4))
        .withColumn("upper_ratio", F.round(upper_ratio(c), 4))
        .withColumn("ws_ratio", F.round(whitespace_ratio(c), 4))
        .withColumn("quality_score", F.round(score, 4))
    )


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts as columns."""
    return df.withColumn("n_tokens_ws", token_count_ws(F.col(text_col))).withColumn(
        "n_tokens_bpe", token_count_bpeish(F.col(text_col))
    )


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


def with_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    shingle_k: int = 8,
    sketch_size: int = 8,
) -> DataFrame:
    """Two fingerprints per document:
    - ``fp_md5``: exact-content hash (dedup key),
    - ``fp_sketch``: min-k sketch of rolling k-gram hashes (a compact
      winnowing-style near-dup signature; equal sketches ⇒ very likely
      near-identical prefixe/content)."""
    c = F.col(text_col)
    hashes = F.transform(char_shingles(c, k=shingle_k), lambda s: F.xxhash64(s))
    sketch = F.slice(F.array_sort(F.array_distinct(hashes)), 1, sketch_size)
    return df.withColumn("fp_md5", F.md5(c.cast("binary"))).withColumn(
        "fp_sketch", sketch
    )


def hashed_tf(
    text: Column | str,
    dim: int = 64,
    hash_fn: str = "xxhash64",
    lowercase: bool = True,
) -> Column:
    """Hashing-trick term-frequency vector (``array<bigint>`` of length
    ``dim``): each whitespace token is hashed into one of ``dim``
    buckets; the vector is the bucket counts. A model-free document
    embedding for clustering / LSH / cheap similarity when no learned
    embedding column exists.

    Expression-only — O(dim × tokens) per row, NO explode, NO shuffle:
    the form that runs inside the corpus scan at 100 TB. ``hash_fn``
    'xxhash64' is the fast engine default; 'md5' derives the bucket
    from the md5 hex prefix so an external SQL engine (the DuckDB
    oracle) can reproduce the exact vector."""
    from ..functions.text import tokens_ws

    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_ws(F.lower(c) if lowercase else c)

    def bucket(t: Column) -> Column:
        if hash_fn == "xxhash64":
            h = F.xxhash64(t)
        elif hash_fn == "md5":
            h = F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
        else:
            raise ValueError(f"hash_fn must be xxhash64 or md5, got {hash_fn!r}")
        return F.pmod(h, F.lit(dim))

    def bucket_counter(i: int):
        # one-arg lambda: a two-arg lambda would make pyspark bind the
        # second parameter to the array index, shadowing the constant
        return F.size(F.filter(toks, lambda t: bucket(t) == F.lit(i)))

    return F.array(*[bucket_counter(i).cast("long") for i in range(dim)])


def char_entropy_col(
    text: Column | str,
    alphabet: str = "abcdefghijklmnopqrstuvwxyz",
) -> tuple[Column, Column]:
    """(n_letters, Shannon entropy in bits) of the character
    distribution over a fixed alphabet in the lowercased text — a
    classic corpus-quality signal (near-0 = degenerate repetition;
    English prose sits around 4.1 bits).

    Pure projection over ``length``/``replace`` — counts come from the
    length-difference trick, so there is NO explode, NO shuffle, and
    one corpus pass computes everything. Expressible verbatim in any
    SQL engine (the DuckDB oracle reproduces it exactly).

    Expression shape: the lowered text, the 26-count array, and the
    letter total are LET-BOUND via one-element-array + ``transform``
    (the binding idiom from ``functions.text.char_shingles``). The
    naive inlined spelling duplicates ``lower(text)`` into all 52
    length/replace sites and the whole 26-count sum into every one of
    the 26 entropy denominators — a ~1400-node tree that Catalyst then
    COPIES wholesale into any filter pushed below the projection;
    codegen compile alone made the cold run 4.4 s at sf0.1 vs 1.2 s
    bound (same warm answer, measured)."""
    raw = F.col(text) if isinstance(text, str) else text
    k = len(alphabet)

    def stats(s: Column) -> Column:
        cs = F.array(
            *[
                F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))
                for ch in alphabet
            ]
        )

        def with_counts(csb: Column) -> Column:
            n = csb[0]
            for i in range(1, k):
                n = n + csb[i]

            def with_n(nn: Column) -> Column:
                terms = []
                for i in range(k):
                    cnt = csb[i]
                    p = cnt.cast("double") / nn
                    terms.append(
                        F.when(cnt > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
                    )
                ent = terms[0]
                for t in terms[1:]:
                    ent = ent + t
                return F.struct(
                    nn.cast("bigint").alias("n"), ent.alias("ent")
                )

            return F.get(F.transform(F.array(n.cast("double")), with_n), 0)

        return F.get(F.transform(F.array(cs), with_counts), 0)

    st = F.get(F.transform(F.array(F.lower(raw)), stats), 0)
    return st.getField("n"), st.getField("ent")


# ---------------------------------------------------------------------------
# Readability & lexical-diversity signals
# ---------------------------------------------------------------------------


def with_readability(
    df: DataFrame,
    text_col: str = "text",
    quantize_pow2: int | None = None,
) -> DataFrame:
    """Flesch reading-ease score (206.835 − 1.015·words/sentences −
    84.6·syllables/words) with a vowel-group syllable estimate — the
    classic grade-level proxy used alongside the Gopher-style rules in
    ``with_quality_score`` for corpus filtering.

    All three counts are single ``regexp_count`` projections over the
    scan (sentence = ``[.!?]+`` run, syllable = ``[aeiouy]+`` run —
    vowel groups never span token boundaries, so no explode is
    needed): zero shuffles, whole-stage codegen, one corpus pass at
    any scale."""
    c = F.col(text_col)
    n_words = F.greatest(token_count_ws(c), F.lit(1))
    n_sentences = F.greatest(
        F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(1)
    )
    n_syllables = F.greatest(
        F.regexp_count(F.lower(c), F.lit(r"[aeiouy]+")), F.lit(1)
    )
    fre = (
        F.lit(206.835)
        - F.lit(1.015)
            * (n_words.cast("double") / n_sentences.cast("double"))
        - F.lit(84.6)
            * (n_syllables.cast("double") / n_words.cast("double"))
    )
    out = (
        df.withColumn("n_words", n_words.cast("bigint"))
        .withColumn("n_sentences", n_sentences.cast("bigint"))
        .withColumn("n_syllables", n_syllables.cast("bigint"))
    )
    if quantize_pow2 is not None:
        # tie-safe attestation form: the formula is a fixed sequence of
        # IEEE ops over identical integer counts on both engines, so
        # the double is bit-identical and floor(x·2^q) is exact — no
        # round(double, d) half-tie surface (r10 tie-audit hardening)
        return out.withColumn(
            "flesch_fp", F.floor(fre * F.lit(float(2**quantize_pow2)))
        )
    return out.withColumn("flesch_ease", F.round(fre, 4))


def type_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize_pow2: int | None = None,
) -> DataFrame:
    """Lexical diversity per document: token count, vocabulary size
    (types), type-token ratio, and hapax-legomenon fraction (share of
    tokens occurring exactly once in the doc). Near-0 TTR flags
    keyword-stuffed / template spam; natural prose sits well above.

    Shape: one explode → (doc, token) hash count → per-doc re-agg —
    both aggregates map-side combine, keys are (doc, token) so hot
    vocabulary never concentrates on one reducer. No windows, no
    joins."""
    tok = ensure_wide(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(tokens_ws(F.lower(F.col(text_col)))).alias("tok"),
    )
    per_tok = tok.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n_tokens = F.sum("c").cast("bigint")
    n_types = F.count(F.lit(1)).cast("bigint")
    n_hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint")
    if quantize_pow2 is not None:
        # tie-safe attestation form: each ratio is ONE IEEE division of
        # identical BIGINTs on both engines; floor(x·2^q) is exact, so
        # the attested integers carry no round() half-tie surface
        scale = F.lit(float(2**quantize_pow2))
        return per_tok.groupBy("id").agg(
            n_tokens.alias("n_tokens"),
            n_types.alias("n_types"),
            n_hapax.alias("n_hapax"),
            F.floor(
                n_types.cast("double") / n_tokens.cast("double") * scale
            ).alias("ttr_fp"),
            F.floor(
                n_hapax.cast("double") / n_tokens.cast("double") * scale
            ).alias("hapax_fp"),
        )
    return per_tok.groupBy("id").agg(
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        n_hapax.alias("n_hapax"),
        F.round(
            n_types.cast("double") / n_tokens.cast("double"), 4
        ).alias("ttr"),
        F.round(
            n_hapax.cast("double") / n_tokens.cast("double"), 4
        ).alias("hapax_frac"),
    )
