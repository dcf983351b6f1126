"""Deduplication operators for large text corpora.

Five strategies, all shuffle-light by construction (the 100 TB posture):

- **exact** (`dedup_exact`, `exact_text_groups`): group on a 128-bit
  content hash, not the full text — the shuffle moves 16-byte keys.
- **MinHash + LSH** (`minhash_signatures`, `minhash_candidate_pairs`,
  `dedup_minhash`): shingle → k minhashes (ONE shuffle: groupBy doc) →
  band buckets → pairs emerge from same-bucket grouping. Jaccard is
  estimated from signature agreement — candidate verification never
  re-joins the shingle sets.
- **SimHash** (`simhash_signatures`, `simhash_neardup_pairs`): 64-bit
  signatures via per-bit token votes; near-dup candidates from 16-bit
  band equality (any pair within Hamming distance 3 shares ≥1 of 4
  bands), verified with `bit_count(xor)`.
- **n-gram Jaccard** (`ngram_jaccard_pairs`): exact Jaccard via a
  shingle-inverted-index self-join, with a document-frequency cap that
  drops stop-shingles (the skew guard that makes this survive scale).
- **embedding cosine** (see similarity.py `cosine_neardup_pairs`):
  random-hyperplane LSH buckets, exact cosine only within buckets.

Reference analog: the corpus has no dedup (it is an orchestrator); this
implements the north-star LLM-pipeline extension declared in
SURVEY.md §2 M5. Everything is built-in-function DataFrame code — no
Python UDFs anywhere in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_shingles, tokens_ws
from .width import ensure_wide

# canonical implementation lives in operators/width.py (shared by the
# curation / corpus-stats / text modules); the old private name is kept
# for existing call sites
_ensure_parallelism = ensure_wide


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, keys: list[str], order_by: str | None = None) -> DataFrame:
    """Keep one row per distinct ``keys``. With ``order_by``, keep the
    row with the smallest value (deterministic representative) via
    min_by-style window; else ``dropDuplicates`` (any representative —
    cheaper: map-side partial dedup before the shuffle)."""
    if order_by is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_by).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_text_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups by exact content: (content_hash, keep_id,
    n_copies). Shuffles only the md5 key + id — never the document."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_exact_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rows surviving exact-content dedup (min-id representative)."""
    keep = exact_text_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    shingle_k: int = 5,
    mode: str = "char",
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — one row per doc.

    Plan shape: shingle once → explode → ONE hash-aggregate computing
    all k salted minima (map-side partial combine makes the shuffle
    k×8 bytes per doc per partition, never the shingles themselves).
    A projection-only variant (k nested transforms over the shingle
    array) re-evaluates the shingle expression per hash — measured
    ~30× slower — so the explode+agg form is deliberate. A single
    ``aggregate`` fold over the hashed array (k-long accumulator,
    ``zip_with(acc, idx, least(a, xxhash64(i, x)))`` per element — the
    no-explode shape) was also measured and REJECTED: 11.1 s vs 2.0 s
    at sf0.1/k=128 (bit-identical output; the per-element k-array
    rebuild in interpreted HOF eval dwarfs the explode's shuffle).

    ``mode='word'`` shingles on word k-grams instead of char k-grams so
    the signatures estimate the SAME Jaccard space as the exact word-
    shingle pair operators (their over-budget LSH fallback)."""
    from ..functions.text import word_shingles

    mk = char_shingles if mode == "char" else word_shingles
    shingled = _ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"),
        # hash each shingle STRING once, INSIDE the array, and dedupe
        # the 8-byte hash values instead of the strings: the k salted
        # hashes then mix the long (xxhash64 over (int, long)) rather
        # than re-hashing variable-length text k times, the distinct
        # compares longs rather than strings, and the exploded rows
        # carry 8 bytes each. A hash collision merging two distinct
        # shingles cannot change any signature component — min over
        # the multiset of hashed values equals min over its set.
        # Measured sf0.1 char-5/k=128 (noop, 4 runs): 2.23 s -> 1.83 s
        # warm, 9.3 s -> 2.9 s cold; signatures bit-identical.
        F.explode(
            F.array_distinct(
                F.transform(
                    mk(F.col(text_col), shingle_k), lambda s: F.xxhash64(s)
                )
            )
        ).alias("sh"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return (
        shingled.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"mh_{i}" for i in range(num_hashes)]).alias("sig"))
    )


def minhash_band_miss_prob(
    jaccard: float, num_bands: int, rows_per_band: int, min_matches: int
) -> float:
    """P(a pair with true Jaccard ``jaccard`` matches fewer than
    ``min_matches`` of the ``num_bands`` bands) — the banding recall
    bound. Per-band match is Bernoulli(p = jaccard**rows_per_band);
    matches are independent across bands, so the miss mass is the
    Binomial(num_bands, p) lower tail below ``min_matches``."""
    import math

    p = jaccard**rows_per_band
    return sum(
        math.comb(num_bands, i) * p**i * (1.0 - p) ** (num_bands - i)
        for i in range(min_matches)
    )


def minhash_candidate_pairs(
    sigs: DataFrame,
    num_bands: int = 32,
    max_bucket: int = 64,
    min_band_matches: int = 1,
) -> DataFrame:
    """LSH banding: split the signature into ``num_bands`` bands, hash
    each band, group by (band, hash). Pairs sharing any band are
    candidates. ``max_bucket`` caps pathological buckets (boilerplate
    text) — dropped buckets are the standard recall/cost trade at scale.

    ``min_band_matches`` > 1 turns banding into band VOTING: a pair is
    a candidate only if it collides in at least that many bands. On
    boilerplate-dense corpora single-band collisions are dominated by
    low-similarity noise (one 4-row band matching is common at
    Jaccard ~0.25; two matching is ~C(B,2)·p² ≈ rare), so requiring a
    second vote cuts the candidate set ~50× while the miss probability
    for a genuinely-similar pair stays negligible — quantify it with
    :func:`minhash_band_miss_prob` before raising the floor (the
    caller owns that recall budget; see ``dedup_minhash_verified``).
    The vote count reuses the exact shuffle the distinct() otherwise
    needs — zero extra cost.

    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    n_hashes_col = F.size("sig")
    rows_per_band = (n_hashes_col / num_bands).cast("int")
    # hash the band SLICE directly (xxhash64 folds array elements) —
    # the old spelling cast the slice array<bigint> → array<string> →
    # string, building 32 strings per doc just to feed the hash. The
    # bucket ids change but bucket MEMBERSHIP does not: equal slices
    # hash equal under any function, so no true pair is lost, and the
    # ~2^-64 chance of two different slices colliding only ADDS a
    # candidate that the estimate/exact verification stages discard.
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(
                    F.lit("band:"),
                    b,
                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    # Count first, collect second: a degenerate bucket (millions of
    # identical docs) must be dropped BEFORE any task materializes its
    # member array — the count aggregate has map-side combine; the
    # collect then only ever sees buckets ≤ max_bucket.
    ok_buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("band_id", "band_hash")
    )
    # sort ONCE in its own projection: inlining array_sort at every
    # reference inside the nested pair-enumeration lambdas made codegen
    # re-emit (and re-run) the sort per member — measured 16.5 s cold /
    # 2 s warm for ~1k pairs on the simhash twin of this block; with
    # the sorted array bound to an attribute it is sorted once and the
    # generated code shrinks to the enumeration itself
    buckets = (
        banded.join(ok_buckets, ["band_id", "band_hash"], "left_semi")
        .groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
    )
    ids_sorted = F.col("ids")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids_sorted,
                    lambda a, i: F.transform(
                        F.slice(ids_sorted, i + 2, F.size(ids_sorted)),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    if min_band_matches <= 1:
        return pairs.distinct()
    # same shuffle as distinct(): a pair appears at most once per band
    # bucket, so the group count IS the number of matching bands
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__bands"))
        .where(F.col("__bands") >= min_band_matches)
        .select("id_a", "id_b")
    )


def minhash_estimate_jaccard(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature components
    (the unbiased MinHash estimator) — verification without touching
    the original shingle sets."""
    a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (agree / F.size("sig_a")).cast("double").alias("jaccard_est"),
        )
    )


def dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 128,
    num_bands: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard_est ≥ threshold).

    The signature frame feeds the banding AND both sides of the
    verification join — persist it so the shingle+128-min aggregation
    runs once, not three times (signatures are ~1 KB/doc: safely
    cacheable at any scale, spills to disk if not)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).persist()
    pairs = minhash_candidate_pairs(sigs, num_bands)
    return minhash_estimate_jaccard(pairs, sigs).where(
        F.col("jaccard_est") >= threshold
    )


def verify_pairs_exact_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    mode: str = "char",
    include_containment: bool = False,
) -> DataFrame:
    """Exact Jaccard for the given candidate pairs — the verification
    leg of candidate-generation dedup (MinHash banding proposes, this
    disposes). Values are computed in the 64-bit shingle-hash domain
    (sets of ``xxhash64(shingle)``), so a cross-doc hash collision can
    in principle perturb a count — probability ~2^-64 per shingle pair,
    ~1e-13 per doc pair on these set sizes. ``include_containment``
    adds the asymmetric ``containment = common / min(|A|, |B|)`` column
    (same inputs, one extra projection).

    Scale shape: shingling is *restricted to candidate ids* via a
    semi-join, so the exact computation touches only the (tiny)
    candidate subset of the corpus, never all documents — and each
    doc's distinct-shingle SET travels as one array row (bounded by
    doc length), never as exploded (id, shingle) rows. The
    intersection is one JVM hash-set ``array_intersect`` per pair —
    the same verification shape :func:`ngram_jaccard_pairs_prefix`
    ships — which replaces the former explode → shingle-keyed join →
    per-pair count-aggregate → two size joins (four extra exchanges,
    with the widest one keyed on shingle text). Pairs sharing zero
    shingles drop out (their Jaccard is 0 — below any useful
    threshold)."""
    from ..functions.text import word_shingles

    mk = char_shingles if mode == "char" else word_shingles
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # semi-join BEFORE shingling: Catalyst cannot prune rows through
    # the shingle expression, so restricting afterwards would still
    # shingle the entire corpus — the exact cost this function exists
    # to avoid. The set frame feeds both join sides: persist so the
    # shingling runs once. Sets are hashed INSIDE the array and deduped
    # as 8-byte longs (the ngram_jaccard_pairs_prefix convention): the
    # per-pair intersection compares longs, and the cached/joined
    # arrays carry 8 bytes per shingle instead of text.
    sets = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .join(ids, "id", "left_semi")
        .select(
            "id",
            F.array_distinct(
                F.transform(
                    mk(F.col("__t"), shingle_k), lambda s: F.xxhash64(s)
                )
            ).alias("shs"),
        )
        .persist()
    )
    joined = pairs.join(
        sets.select(F.col("id").alias("id_a"), F.col("shs").alias("__sa")),
        "id_a",
    ).join(
        sets.select(F.col("id").alias("id_b"), F.col("shs").alias("__sb")),
        "id_b",
    ).select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("__sa", "__sb")).alias("n_common"),
        F.size("__sa").alias("n_a"),
        F.size("__sb").alias("n_b"),
    ).where(F.col("n_common") > 0)
    cols = [
        F.col("id_a"),
        F.col("id_b"),
        (
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        ).alias("jaccard"),
    ]
    if include_containment:
        cols.insert(
            2,
            (F.col("n_common") / F.least("n_a", "n_b")).alias("containment"),
        )
    return joined.select(*cols)


def dedup_minhash_verified(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 128,
    num_bands: int = 32,
    shingle_k: int = 5,
    est_margin: float = 0.2,
    mode: str = "char",
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs with *exact* Jaccard ≥ threshold, candidates
    from MinHash-LSH banding. The production three-phase shape:

    1. banding proposes candidates (cheap, recall-oriented — on
       boilerplate-heavy corpora this set can be 1000× the true pairs),
    2. the signature ESTIMATE prunes candidates below
       ``threshold - est_margin`` using the already-materialized sigs
       (one zip_with per pair, no shuffle of text) — with 128 hashes a
       true ≥ 0.8 pair falls below 0.6 with probability ~1e-8, so the
       prune is recall-safe,
    3. exact verification re-touches shingles ONLY for the estimate
       survivors, so the expensive join is bounded by true-pair count,
       not candidate count.
    """
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, mode=mode
    ).persist()
    # band VOTING: require a second band collision when that is
    # recall-free at this threshold (miss probability < 1e-5 for a
    # pair AT the final threshold — e.g. t=0.8, 32 bands of 4 rows:
    # P(<2 matches) ≈ 2e-6). On boilerplate-dense corpora this cuts
    # the candidate set ~50× (single-band collisions are ~all noise
    # at Jaccard 0.2-0.4); with loose thresholds where two votes
    # would cost real recall, it degrades to the classic any-band OR.
    votes = (
        2
        if minhash_band_miss_prob(
            threshold, num_bands, num_hashes // num_bands, 2
        )
        < 1e-5
        else 1
    )
    cand = minhash_candidate_pairs(
        sigs, num_bands, max_bucket=max_bucket, min_band_matches=votes
    )
    # survivors are ~true-pair-count sized and feed verification three
    # times (both sides of the id restriction + the pair join): persist
    survivors = (
        minhash_estimate_jaccard(cand, sigs)
        .where(F.col("jaccard_est") >= threshold - est_margin)
        .select("id_a", "id_b")
        .persist()
    )
    return verify_pairs_exact_jaccard(
        survivors, df, text_col, id_col, shingle_k, mode=mode
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per doc: sign of per-bit votes over token hashes.

    Shape: hash each token once, explode, then ONE grouped aggregate
    computes all per-bit vote sums (map-side combine — the shuffle
    carries num_bits small ints per doc per partition, never tokens).
    The earlier projection-only form (num_bits separate ``aggregate``
    folds) re-traversed the token array once PER BIT and its generated
    code took seconds to compile — the same pathology
    ``minhash_signatures`` documents; explode+agg is the fix in both.
    Token-less docs are preserved via a left join (all-zero votes →
    signature 0), exactly as the fold form behaved.

    ``hash_fn='xxhash64'`` (default, fastest: JVM intrinsic) yields
    64-bit signatures; ``hash_fn='md5'`` yields 60-bit signatures from
    the first 15 hex chars of md5 — a *portable* hash every engine
    computes identically, so the signature (and downstream Hamming
    pairs) is reproducible outside Spark for cross-engine attestation.
    """
    import functools

    num_bits = 64 if hash_fn == "xxhash64" else 60
    if hash_fn == "xxhash64":
        tok_hash = lambda t: F.xxhash64(t)  # noqa: E731
    elif hash_fn == "md5":
        tok_hash = lambda t: F.conv(  # noqa: E731
            F.substring(F.md5(t.cast("binary")), 1, 15), 16, 10
        ).cast("bigint")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")

    base = _ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"),
        tokens_ws(F.col(text_col)).alias("__t"),
    )
    exploded = base.select("id", F.explode("__t").alias("__tok")).select(
        "id", tok_hash(F.col("__tok")).alias("__h")
    )
    h = F.col("__h")
    voted = exploded.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"__v{j}")
            for j in range(num_bits)
        ]
    )
    sig = functools.reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.when(
                F.col(f"__v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
            ).otherwise(F.lit(0).cast("bigint"))
            for j in range(num_bits)
        ],
    )
    return (
        base.select("id")
        .join(voted, "id", "left")
        .select(
            "id",
            F.coalesce(sig, F.lit(0).cast("bigint")).alias("simhash"),
        )
    )


def simhash_neardup_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 256,
    num_bits: int = 64,
) -> DataFrame:
    """Near-dup pairs within ``max_hamming`` bits. Candidates via the
    banding trick with ``max_hamming + 1`` bands (Hamming ≤ h ⇒ at
    least one of h+1 bands is untouched — pigeonhole, so recall is
    exactly 1.0 for ANY threshold, not just the classic 4-band h≤3),
    verified with bit_count(xor). Only same-band docs meet — no cross
    join. More bands = smaller bands = more candidate collisions, the
    usual recall/cost trade as the threshold loosens."""
    num_bands = max_hamming + 1
    if num_bands > num_bits:
        raise ValueError(
            f"max_hamming {max_hamming} needs {num_bands} bands but the "
            f"signature has only {num_bits} bits"
        )
    bounds = [b * num_bits // num_bands for b in range(num_bands + 1)]
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", bounds[b])
                        .bitwiseAND(
                            F.lit((1 << (bounds[b + 1] - bounds[b])) - 1)
                        )
                        .alias("chunk"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.chunk")
    # count-first bucket guard (see minhash_candidate_pairs): never
    # materialize a hot bucket's member array
    ok = (
        banded.groupBy("band", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("band", "chunk")
    )
    # sort once, outside the nested enumeration lambdas — see the
    # identical rewrite in minhash_candidate_pairs (an inlined
    # array_sort re-ran per member and dominated the op's wall)
    buckets = (
        banded.join(ok, ["band", "chunk"], "left_semi")
        .groupBy("band", "chunk")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("id", "simhash"))
            ).alias("docs")
        )
    )
    docs_sorted = F.col("docs")
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        docs_sorted,
                        lambda a, i: F.transform(
                            F.slice(docs_sorted, i + 2, F.size(docs_sorted)),
                            lambda b: F.struct(
                                a.id.alias("id_a"),
                                b.id.alias("id_b"),
                                F.bit_count(
                                    a.simhash.bitwiseXOR(b.simhash)
                                ).alias("hamming"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.hamming")
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs.distinct()


#: MinHash signature definition version, persisted with every store
#: row. v2 = shingle string hashed once, the k salts mix the 8-byte
#: value (5x cheaper, same estimator); v1 stores are incompatible.
SIGNATURE_VERSION = 2


def incremental_neardup(
    spark,
    new_docs: DataFrame,
    sig_store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 128,
    num_bands: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup check of a NEW batch against corpus history, without
    recomputing history: signatures live in a persistent store
    (parquet, upserted per batch); banding runs over new ∪ history but
    only pairs touching a new doc are returned.

    Cost per batch: signature computation for the batch only + one
    banded join against the store (shuffle of signatures, never text).
    Returns (id_a, id_b, jaccard_est, is_historical_pair=false-side).
    """
    from ..sources.tables import upsert_parquet

    new_sigs = (
        minhash_signatures(new_docs, text_col, id_col, num_hashes, shingle_k)
        .withColumn("sig_v", F.lit(SIGNATURE_VERSION))
        .persist()
    )
    # existence via the reader (driver-local os.path is always False on
    # remote stores, which would silently skip the history side)
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(sig_store_path).schema
        have_store = True
    except AnalysisException:
        # missing/empty store only; transient failures propagate
        have_store = False
    if have_store:
        history = spark.read.parquet(sig_store_path)
        # signature definitions are versioned: comparing v1 (per-salt
        # string hashing) against v2 (hash-once + salt-mix) signatures
        # yields ~zero agreement and silently under-drops duplicates,
        # so an incompatible store must fail loudly, not degrade.
        # The O(1) check is a sidecar written at store creation (the
        # pq_save_codes pattern); only a sidecar-less legacy/remote
        # store pays the one-off column scan (isNull: mixed-schema
        # stores read v1 rows as NULL).
        ver = _read_sig_version(sig_store_path)
        incompatible = (
            ver != SIGNATURE_VERSION
            if ver is not None
            else (
                "sig_v" not in history.columns
                or bool(
                    history.where(
                        F.col("sig_v").isNull()
                        | (F.col("sig_v") != SIGNATURE_VERSION)
                    ).take(1)
                )
            )
        )
        if incompatible:
            raise ValueError(
                f"signature store at {sig_store_path} was built by an "
                f"older minhash signature version (current: "
                f"v{SIGNATURE_VERSION}); rebuild it from the corpus "
                "(delete the store and re-ingest history)"
            )
        # a re-delivered batch's ids already sit in the store: keep the
        # new copy only, or the union holds each id twice and every
        # band bucket emits (X, X) self-pairs with jaccard 1.0
        history = history.join(
            new_sigs.select("id"), "id", "left_anti"
        )
        allsigs = history.unionByName(new_sigs).persist()
    else:
        allsigs = new_sigs
    pairs = minhash_candidate_pairs(allsigs, num_bands)
    nid = new_sigs.select("id")
    touching_new = (
        pairs.join(nid.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .unionByName(
            pairs.join(nid.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
        )
        .distinct()
    )
    out = minhash_estimate_jaccard(touching_new, allsigs).where(
        F.col("jaccard_est") >= threshold
    )
    # sever lineage from the store BEFORE rewriting it (the upsert
    # swaps the directory out from under the lazy plan)
    out = out.localCheckpoint(eager=True)
    upsert_parquet(spark, sig_store_path, new_sigs, "id")
    _write_sig_version(sig_store_path)
    new_sigs.unpersist()
    return out


def _read_sig_version(store_path: str) -> int | None:
    """Version sidecar (underscore-prefixed: invisible to parquet
    readers). None = absent/unreadable (legacy or non-local store)."""
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(store_path, "_sig_version.json")) as f:
            return int(_json.load(f)["version"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _write_sig_version(store_path: str) -> None:
    """Best-effort atomic sidecar write (a remote object store skips
    it and falls back to the column check)."""
    import json as _json
    import os as _os

    try:
        tmp = _os.path.join(store_path, "._sig_version.json.tmp")
        with open(tmp, "w") as f:
            _json.dump({"version": SIGNATURE_VERSION}, f)
        _os.replace(tmp, _os.path.join(store_path, "_sig_version.json"))
    except OSError:
        pass


# ---------------------------------------------------------------------------
# Pair graph → duplicate clusters
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: DataFrame,
    max_iters: int = 20,
    require_convergence: bool = True,
    pairs_distinct: bool = False,
) -> DataFrame:
    """Connected components over a near-dup pair graph (id_a, id_b) →
    (id, cluster) with cluster = min id of the component (the survivor
    under the min-id keep rule).

    Iterative min-label propagation with POINTER JUMPING (each round:
    label ← min over neighbors' labels, then label ← label(label)),
    so chains converge in O(log diameter) rounds, not O(diameter).
    Every round's frame is materialized through the graph family's
    lineage-truncating checkpoint (``graph._materialize_truncated``):
    the pair frame usually arrives with a huge upstream plan (the
    whole LSH pipeline), and a union-of-joins loop over an untruncated
    lineage makes Catalyst re-analyze a combinatorially growing tree
    on every action — measured 95 s of pure driver-side planning on a
    512-edge graph at sf0.1 before truncation, ~8 s after.
    Deterministic. Stops early at fixpoint (checked via count of
    changed labels). If the fixpoint is not reached within
    ``max_iters``, partial clusters would silently retain duplicates —
    so that raises unless ``require_convergence=False`` (then it warns
    and returns the partial labels).

    ``pairs_distinct=True`` skips the defensive ``distinct`` on the
    symmetric edge frame: a canonical ``id_a < id_b`` pair list that is
    itself duplicate-free produces a reversed union that is disjoint by
    construction, so the dedup shuffle would be a pure no-op pass over
    the heaviest frame in the loop (every LSH pair generator in this
    module emits exactly that shape)."""
    from .graph import _materialize_truncated

    # Evaluate the pair frame EXACTLY ONCE. The pair plan is usually
    # the whole LSH + exact-verify pipeline; the old spelling
    # (pairs ∪ pairs-reversed, then nodes derived from that union and
    # unioned back for self-loops) referenced the pairs subtree FOUR
    # times inside the one edge-materialization job, and Spark does not
    # reuse repeated unpersisted subtrees — every reference re-ran the
    # un-cached tail of the pipeline (measured ~2 s of the collapse
    # rows at sf0.1). Both directions now come from one explode over a
    # single pass, materialized before the node set is derived from it.
    sym_raw = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a"), F.col("id_b")),
                F.struct(
                    F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
                ),
            )
        ).alias("e")
    ).select("e.id_a", "e.id_b")
    if not pairs_distinct:
        sym_raw = sym_raw.distinct()
    sym = _materialize_truncated(sym_raw)
    # SELF-LOOP FOLD: append one (id, id) row per node so the per-round
    # neighbor-min aggregate sees the node's OWN label through its
    # self-loop — least(own, nbr_min) then needs no |V|-sized left join
    # against the label frame (one join gone per round), and round 1
    # needs no join at ALL (labels start as identity, so min(id_b) over
    # neighbors ∪ self IS the propagated label). The old label for the
    # convergence probe is recovered inside the same aggregate as
    # min(label WHERE id_b = id_a) — exactly the self-loop row.
    # The loop rows are materialized separately (|V|-sized, read from
    # the sym checkpoint) and the per-round edge frame is the LAZY
    # union of the two checkpoints — no second |E|-sized copy.
    loops = _materialize_truncated(
        sym.select(F.col("id_a")).distinct().select(
            "id_a", F.col("id_a").alias("id_b")
        )
    )
    edges = sym.unionByName(loops)
    labels: DataFrame | None = None  # None ⇒ identity (round 1)
    converged = False
    prev_round: DataFrame | None = None
    for _ in range(max_iters):
        if labels is None:
            propagated = edges.groupBy("id_a").agg(
                F.min("id_b").alias("cluster"),
                F.min(
                    F.when(F.col("id_b") == F.col("id_a"), F.col("id_b"))
                ).alias("__prev"),
            )
        else:
            propagated = (
                edges.join(
                    labels.select(
                        F.col("id").alias("id_b"), F.col("cluster").alias("__lb")
                    ),
                    "id_b",
                )
                .groupBy("id_a")
                .agg(
                    F.min("__lb").alias("cluster"),
                    F.min(
                        F.when(F.col("id_b") == F.col("id_a"), F.col("__lb"))
                    ).alias("__prev"),
                )
            )
        # the jump join consumes ``propagated`` on BOTH sides and Spark
        # does not reuse repeated unpersisted subtrees, so without this
        # checkpoint each round ran the edges⋈labels aggregate twice
        propagated = _materialize_truncated(propagated)
        # pointer jumping: label ← label(label). Labels are always ids
        # of same-component nodes, so the self-join stays inside the
        # component while halving the remaining chain depth. Every
        # label IS a node id and every node appears in ``propagated``
        # (self-loops guarantee it), so the jump join is safely INNER.
        # The OLD label rides along as __prev so the convergence probe
        # is a filter over the materialized frame, not a join of two
        # rounds.
        new_labels = _materialize_truncated(
            propagated.alias("a")
            .join(
                propagated.select(
                    F.col("id_a").alias("pid"), F.col("cluster").alias("pcluster")
                ),
                F.col("a.cluster") == F.col("pid"),
            )
            .select(
                F.col("a.id_a").alias("id"),
                F.least(F.col("a.cluster"), F.col("pcluster")).alias("cluster"),
                F.col("a.__prev").alias("__prev"),
            )
        )
        # new_labels is materialized — the jump input's blocks are
        # dead weight from here
        propagated.unpersist()
        changed = (
            new_labels.where(F.col("cluster") != F.col("__prev"))
            .limit(1)
            .count()
        )
        # round k is materialized (eagerly, above) — round k-1's
        # checkpoint blocks are dead weight from here
        if prev_round is not None:
            prev_round.unpersist()
        prev_round = new_labels
        labels = new_labels.select("id", "cluster")
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"dedup_clusters did not reach a fixpoint in {max_iters} "
            "iterations (a component has diameter > max_iters); the "
            "partial labels would keep extra duplicates"
        )
        if require_convergence:
            sym.unpersist()
            loops.unpersist()
            if prev_round is not None:
                prev_round.unpersist()
            raise RuntimeError(msg + " — raise max_iters")
        import warnings

        warnings.warn(msg, stacklevel=2)
    # the returned labels read only the final round's checkpoint; the
    # edge checkpoints' blocks are consumed
    sym.unpersist()
    loops.unpersist()
    return labels


def keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every near-dup cluster member except the min-id survivor
    (the complete dedup: pairs → components → one kept per group)."""
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def keep_best_representatives(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup survivorship: within each near-dup cluster
    keep the HIGHEST-``quality_col`` member (ties → smallest id)
    instead of the arbitrary min-id — the form a curation pipeline
    actually wants ("of these 5 near-copies, keep the cleanest").

    Same component machinery as :func:`keep_representatives`; the
    survivor pick is one window over the cluster-joined frame (cluster
    cardinality per partition, never corpus-wide)."""
    from pyspark.sql import Window

    clusters = dedup_clusters(pairs)  # (id, cluster)
    members = df.join(
        clusters.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn(
        # singletons (no pair edge) form their own cluster
        "cluster",
        F.coalesce(F.col("cluster"), F.col(id_col)),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        members.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "cluster")
    )


def collapse_and_survivors(
    df: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **minhash_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Compute-once production composition of the corpus collapse and
    its emit side: ONE MinHash-LSH verified pair graph and ONE
    component labelling feed BOTH outputs, where the standalone
    registry attestations (``op_dedup_collapse`` /
    ``op_dedup_survivors``) deliberately recompute them independently
    (~2× the cost — each entry is a self-contained oracle check).

    Returns ``(collapse, survivors)``:

    - ``collapse``: one row per multi-member duplicate cluster —
      (keep_id = min member id, n_members, id_sum) — the collapse
      PLAN a pipeline logs/audits before deleting anything;
    - ``survivors``: the kept corpus — one row per surviving document
      (keep_id, cluster_id, n_members, quality), highest
      ``quality_col`` per cluster (ties → smallest id), singletons
      passing through as their own one-member cluster.

    Scale shape: the pair graph comes from the banded/bucket-capped
    LSH path (never all-pairs); components run on the pairs-sized
    graph with pointer jumping + lineage truncation
    (:func:`dedup_clusters`); the cluster labels are persisted ONCE
    so the two outputs share the physical computation — the caller
    should unpersist via ``spark.catalog.clearCache()`` (or consume
    both outputs in one job) when done."""
    from pyspark.sql import Window

    pairs = dedup_minhash_verified(
        df, id_col=id_col, threshold=threshold, **minhash_kwargs
    ).select("id_a", "id_b")
    # dedup_clusters already materializes its result through the
    # lineage-truncating checkpoint; persist() here makes the SHARING
    # explicit so neither output recomputes the component loop
    # (pairs_distinct: the verified pair list is canonical id_a<id_b
    # and duplicate-free by construction)
    clusters = dedup_clusters(pairs, pairs_distinct=True).persist()
    collapse = (
        clusters.groupBy(F.col("cluster").alias("keep_id"))
        .agg(F.count("*").alias("n_members"), F.sum("id").alias("id_sum"))
    )
    members = (
        df.select(id_col, F.col(quality_col).alias("quality"))
        .join(clusters.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster", F.col(id_col)))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    survivors = (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count("*").over(Window.partitionBy("cluster_id"))
        )
        .where(F.col("rn") == 1)
        .select(
            F.col(id_col).alias("keep_id"), "cluster_id", "n_members",
            "quality",
        )
    )
    return collapse, survivors


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index self-join)
# ---------------------------------------------------------------------------


class CandidateBudgetExceeded(RuntimeError):
    """An exact pair operator refused to launch its inverted-index
    self-join because it would materialize more candidate pairs than
    its ``candidate_budget``. On duplication-dense corpora (clique-
    shaped duplicates) Σ C(df, 2) grows quadratically in the clique
    size — the thing that kills a 100 TB run. Use the LSH family
    (:func:`dedup_minhash_verified`, which caps pathological buckets)
    or pass ``on_over_budget='lsh'`` to downgrade automatically."""


def _candidate_pair_count(keyed: DataFrame, key: str, df_cap: int | None) -> int:
    """Σ C(n, 2) over the per-``key`` group sizes of ``keyed`` — the
    EXACT number of (pre-dedup) pair rows the inverted-index self-join
    on ``key`` will emit. One map-side-combined aggregate over an
    already-persisted frame: control-plane cheap next to the join it
    guards, and runs BEFORE any quadratic task is launched."""
    counts = keyed.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    if df_cap is not None:
        counts = counts.where(F.col("n") <= df_cap)
    row = counts.select(
        F.sum(F.col("n").cast("bigint") * (F.col("n") - 1) / 2).alias("c")
    ).first()
    return int(row["c"] or 0)


def _over_budget(
    op_name: str, n_candidates: int, budget: int, on_over_budget: str
) -> None:
    """Raise (the default) unless the caller opted into the LSH
    downgrade; callers handle the 'lsh' branch themselves."""
    if on_over_budget != "lsh":
        raise CandidateBudgetExceeded(
            f"{op_name}: inverted-index self-join would materialize "
            f"{n_candidates:,} candidate pairs (> candidate_budget="
            f"{budget:,}). The corpus is duplication-dense; use "
            f"dedup_minhash_verified (banded LSH with bucket caps, "
            f"exact-verified) or pass on_over_budget='lsh' to "
            f"downgrade automatically, or raise candidate_budget "
            f"if the cluster can absorb the shuffle."
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 5,
    df_cap: int = 1000,
    mode: str = "char",
    candidate_budget: int | None = 50_000_000,
    on_over_budget: str = "raise",
) -> DataFrame:
    """Exact Jaccard over n-gram shingle sets for every pair sharing at
    least one (non-stop) shingle. Computed in the 64-bit shingle-hash
    domain (collision probability ~2^-64 per shingle pair).

    ``mode='char'`` uses k-char shingles; ``mode='word'`` uses k-word
    shingles — far more selective on small-vocabulary text (char
    shingles there are near-universal → quadratic pair blowup).

    Plan shape: explode distinct shingles → drop shingles with document
    frequency > ``df_cap`` (stop-shingles create quadratic bucket
    blowup; dropping them only loses pairs whose entire overlap is
    boilerplate) → hash-join the inverted index with itself on shingle
    → count common shingles per pair → join per-doc set sizes →
    ``jaccard = common / (|A| + |B| - common)``.

    The df-cap bounds the per-shingle worst case but NOT clique blow-up
    (N exact copies share every shingle → C(N, 2) pairs per shingle,
    all under the cap). ``candidate_budget`` guards that: the exact
    Σ C(df, 2) candidate count is aggregated FIRST (cheap — one
    map-side-combined pass over the persisted index), and above the
    budget the operator raises :class:`CandidateBudgetExceeded`
    (``on_over_budget='raise'``) or downgrades to the banded-LSH
    exact-verified path (``'lsh'`` — same scores; recall bounded by
    banding + a 1024-member bucket cap, so duplicate cliques up to
    1024 copies are fully recovered and larger ones should be
    collapsed by exact dedup first — the designed 100 TB posture).
    ``candidate_budget=None`` disables the guard (trusted inputs).
    """
    from ..functions.text import word_shingles

    mk = char_shingles if mode == "char" else word_shingles
    # the inverted index feeds doc sizes, shingle DF counts, and both
    # join sides — persist so shingling runs once, not four times.
    # Shingles are hashed INSIDE the array and deduped as 8-byte longs
    # (the convention ngram_jaccard_pairs_prefix already ships): the
    # self-join key — the widest shuffle here — carries 8 bytes instead
    # of shingle text, and the distinct compares longs. Set sizes and
    # intersections are then hash-domain counts, identical on any
    # corpus without a 64-bit shingle collision (~1e-13 per doc pair).
    shingled = _ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    mk(F.col(text_col), shingle_k), lambda s: F.xxhash64(s)
                )
            )
        ).alias("sh"),
    ).persist()
    if candidate_budget is not None:
        n_cand = _candidate_pair_count(shingled, "sh", df_cap)
        if n_cand > candidate_budget:
            shingled.unpersist()
            _over_budget(
                "ngram_jaccard_pairs", n_cand, candidate_budget, on_over_budget
            )
            # identical copies share every band, so a duplicate clique
            # lands in ONE bucket per band — the cap must exceed the
            # clique sizes worth recovering (1024 -> <=0.5M pairs per
            # bucket); collapse mega-cliques with exact dedup first
            return dedup_minhash_verified(
                df, text_col, id_col, threshold,
                shingle_k=shingle_k, mode=mode, max_bucket=1024,
            )
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_df = shingled.groupBy("sh").agg(F.count(F.lit(1)).alias("sh_df"))
    filtered = shingled.join(
        sh_df.where(F.col("sh_df") <= df_cap).select("sh"), "sh"
    )
    left = filtered.select(F.col("id").alias("id_a"), "sh")
    right = filtered.select(F.col("id").alias("id_b"), "sh")
    common = (
        left.join(right, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 5,
    mode: str = "char",
    candidate_budget: int | None = 50_000_000,
    on_over_budget: str = "raise",
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (the public
    PPJoin/AllPairs family) — same output as
    :func:`ngram_jaccard_pairs` with no document-frequency cap, but the
    self-joined inverted index holds only each doc's PREFIX: with
    shingles canonically ordered rarest-first, two sets with
    ``J ≥ t`` must overlap within their first ``⌈(1−t)·|S|⌉ + 1``
    shingles (pigeonhole on the ``t/(1+t)``-overlap bound), so only
    those need indexing. At ``t = 0.8`` the index — and the quadratic
    bucket work — shrinks ~5×, and rarest-first ordering puts the
    surviving index entries in the LOW-frequency buckets, killing the
    stop-shingle skew the df-cap heuristic existed for (without its
    recall caveat).

    Verification joins candidate pairs back to per-doc sorted
    shingle-hash arrays (bounded by doc length) and computes the exact
    intersection JVM-side (``array_intersect``) — one extra narrow
    join, no Python.

    Prefix filtering shrinks boilerplate skew but not CLIQUE blow-up
    (N exact copies keep identical prefixes), so the same
    ``candidate_budget`` guard as :func:`ngram_jaccard_pairs` applies:
    candidates counted over the (persisted) prefix index before the
    self-join; over budget → raise or LSH downgrade.
    """
    from ..functions.text import word_shingles

    mk = char_shingles if mode == "char" else word_shingles
    # hash INSIDE the array and dedupe the longs (cheaper than string
    # dedup followed by a post-explode hash projection; same values)
    shingled = (
        _ensure_parallelism(df, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        mk(F.col(text_col), shingle_k), lambda s: F.xxhash64(s)
                    )
                )
            ).alias("h"),
        )
        .persist()
    )
    sh_df = shingled.groupBy("h").agg(F.count(F.lit(1)).alias("sh_df"))
    # rarest-first canonical order; (sh_df, h) is a total order
    w_doc = Window.partitionBy("id").orderBy("sh_df", "h")
    ranked = shingled.join(sh_df, "h").select(
        "id",
        "h",
        F.row_number().over(w_doc).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("n_sh"),
    )
    prefix_len = F.ceil((1.0 - threshold) * F.col("n_sh")).cast("int") + 1
    prefix = ranked.where(F.col("rn") <= prefix_len).select("id", "h", "n_sh")
    if candidate_budget is not None:
        prefix = prefix.persist()  # feeds the guard count + both join sides
        n_cand = _candidate_pair_count(prefix, "h", None)
        if n_cand > candidate_budget:
            prefix.unpersist()
            shingled.unpersist()
            _over_budget(
                "ngram_jaccard_pairs_prefix", n_cand, candidate_budget,
                on_over_budget,
            )
            return dedup_minhash_verified(
                df, text_col, id_col, threshold,
                shingle_k=shingle_k, mode=mode, max_bucket=1024,
            )
    # size filter inside the bucket join: t·|A| ≤ |B| ≤ |A|/t
    cand = (
        prefix.select(F.col("id").alias("id_a"), "h", F.col("n_sh").alias("n_a"))
        .join(
            prefix.select(F.col("id").alias("id_b"), "h", F.col("n_sh").alias("n_b")),
            "h",
        )
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") * F.lit(threshold) <= F.col("n_a"))
            & (F.col("n_a") * F.lit(threshold) <= F.col("n_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = shingled.groupBy("id").agg(F.sort_array(F.collect_list("h")).alias("hs"))
    verified = (
        cand.join(
            sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
        )
        .join(
            sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_common"),
            F.size("hs_a").alias("n_a"),
            F.size("hs_b").alias("n_b"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    shingle_n: int = 3,
    df_cap: int = 1000,
    candidate_budget: int | None = 50_000_000,
    on_over_budget: str = "raise",
) -> DataFrame:
    """Asymmetric near-dup: containment = |A ∩ B| / min(|A|, |B|) over
    word n-gram sets, computed in the 64-bit shingle-hash domain
    (collision probability ~2^-64 per shingle pair). Catches SUBSET
    duplication — a short doc quoted
    wholesale inside a much longer one — which symmetric Jaccard
    misses (|A ∩ B| / |A ∪ B| stays small when |B| ≫ |A|). Returns
    both scores so the gap (high containment, low jaccard) flags the
    embedded-copy case specifically.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (explode
    distinct shingles, document-frequency cap against stop-shingle
    bucket blowup, self-join on shingle, one pair-count hash-agg) —
    the only change is the denominator, so the 100 TB posture is
    identical: shuffles carry shingles and ids, never document text —
    including the ``candidate_budget`` clique-blow-up guard. The
    ``'lsh'`` downgrade uses symmetric MinHash banding for candidates,
    which under-recalls the ASYMMETRIC subset case (a short doc inside
    a much longer one has high containment but low Jaccard, so its
    bands rarely collide) — on over-budget corpora the blow-up is
    clique-shaped near-identical copies, which banding catches for
    cliques up to its bucket cap (1024 members here; collapse larger
    identical-copy cliques with exact dedup first — their pair lists
    are output-infeasible regardless of algorithm); the raise default
    stays right when embedded-copy recall matters.
    """
    from ..functions.text import word_shingles

    # hash-in-array + dedupe-as-longs, exactly as ngram_jaccard_pairs:
    # the shingle self-join shuffles 8-byte keys, never n-gram text
    shingled = _ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    word_shingles(F.col(text_col), shingle_n),
                    lambda s: F.xxhash64(s),
                )
            )
        ).alias("sh"),
    ).persist()
    if candidate_budget is not None:
        n_cand = _candidate_pair_count(shingled, "sh", df_cap)
        if n_cand > candidate_budget:
            shingled.unpersist()
            _over_budget(
                "ngram_containment_pairs", n_cand, candidate_budget,
                on_over_budget,
            )
            sigs = minhash_signatures(
                df, text_col, id_col, shingle_k=shingle_n, mode="word"
            ).persist()
            cand = minhash_candidate_pairs(sigs, max_bucket=1024)
            return verify_pairs_exact_jaccard(
                cand, df, text_col, id_col, shingle_n, mode="word",
                include_containment=True,
            ).where(F.col("containment") >= threshold)
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_df = shingled.groupBy("sh").agg(F.count(F.lit(1)).alias("sh_df"))
    filtered = shingled.join(
        sh_df.where(F.col("sh_df") <= df_cap).select("sh"), "sh"
    )
    left = filtered.select(F.col("id").alias("id_a"), "sh")
    right = filtered.select(F.col("id").alias("id_b"), "sh")
    common = (
        left.join(right, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common") / F.least(F.col("n_a"), F.col("n_b"))
            ).alias("containment"),
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .where(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# Bloom-pruned incremental exact dedup
# ---------------------------------------------------------------------------


def bloom_dedup_new(
    new_docs: DataFrame,
    history: DataFrame,
    key: Column | str,
    id_col: str = "doc_id",
    expected_items: int | None = None,
    fpp: float = 0.01,
    num_bits: int | None = None,
    num_hashes: int | None = None,
) -> DataFrame:
    """Exact incremental dedup: rows of ``new_docs`` whose ``key`` does
    not appear in ``history``, keeping the min-``id_col`` row per key
    within the new batch. The result is EXACT — the bloom filter only
    prunes; its false positives are eliminated by the verify join.

    100 TB shape: the history corpus is scanned (never shuffled) twice
    — once to build a fixed-size bloom bitset, once under a broadcast
    LeftSemi probe restricted to the few bloom-surviving candidate
    keys. The new batch (assumed ≪ history) pays one small shuffle for
    the within-batch min-id pick. Size the filter with
    ``expected_items`` ≈ distinct history keys (from table metadata at
    scale; an exact count is only acceptable on small inputs) or pass
    ``num_bits``/``num_hashes`` directly.
    """
    from . import bloom as _bloom

    key_col = F.col(key) if isinstance(key, str) else key
    if num_bits is None or num_hashes is None:
        if expected_items is None:
            raise ValueError(
                "bloom_dedup_new needs expected_items (approx distinct history "
                "keys) or explicit num_bits + num_hashes"
            )
        num_bits, num_hashes = _bloom.bloom_params(expected_items, fpp)

    hist_keys = history.select(key_col.alias("__k"))
    new_keyed = new_docs.withColumn("__k", key_col)
    filt = _bloom.bloom_build(hist_keys, "__k", num_bits, num_hashes)
    candidates = _bloom.bloom_filter_might_contain(
        new_keyed, "__k", filt, num_bits, num_hashes, id_col
    )
    # Only candidate keys (dup fraction + fpp of the batch) probe the
    # history: broadcast semi join — no history shuffle, no sort.
    matched_keys = (
        hist_keys.join(
            F.broadcast(candidates.select("__k").distinct()), "__k", "left_semi"
        )
        .distinct()
    )
    fresh = new_keyed.join(F.broadcast(matched_keys), "__k", "left_anti")
    w = Window.partitionBy("__k").orderBy(F.col(id_col))
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__k")
    )
