"""Driver-facing registry for the LLM-data-pipeline operators.

Each entry is a ``(spark, sf_dir) -> DataFrame`` callable over the
driver testdata. SQL-expressible ops carry a DuckDB oracle; the
LSH/embedding family is declared rows-only (float accumulation order
and hash salts are not portable SQL) and is property-tested in
``tests/test_llm_ops.py`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from . import dedup, relational, sampling, similarity, text

# ---------------------------------------------------------------------------
# SQL-expressible operator queries (oracle-checked)
# ---------------------------------------------------------------------------


def op_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup groups: one keep-id per distinct md5(text)."""
    t = load_tables(spark, sf_dir)
    return (
        dedup.exact_text_groups(t.documents)
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
        .limit(200)
    )


def op_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts (space-arithmetic form: portable SQL)."""
    t = load_tables(spark, sf_dir)
    c = F.col("text")
    return (
        t.documents.select(
            "doc_id",
            (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + 1).alias(
                "n_tokens"
            ),
        )
        .orderBy("doc_id")
        .limit(200)
    )


def op_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content fingerprints (md5 hex)."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("fp_md5")
        )
        .orderBy("doc_id")
        .limit(200)
    )


def op_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable quality features: length, space count, word density."""
    t = load_tables(spark, sf_dir)
    c = F.col("text")
    n_spaces = F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit("")))
    return (
        t.documents.select(
            "doc_id",
            F.length(c).alias("n_chars_calc"),
            n_spaces.alias("n_spaces"),
            F.round(
                (n_spaces + 1).cast("double") / F.greatest(F.length(c), F.lit(1)), 4
            ).alias("word_density"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


def op_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each error event matched to the latest
    preceding purchase by the same user (merge-join formulation, one
    shuffle — the DuckDB oracle uses native ASOF JOIN)."""
    t = load_tables(spark, sf_dir)
    errors = t.events.where(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = t.events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event"), "ts"
    )
    joined = relational.asof_join(
        errors, purchases, key="user_id", right_cols=["purchase_event"]
    )
    return (
        joined.where(F.col("purchase_event_r").isNotNull())
        .select("event_id", "user_id", F.col("purchase_event_r").alias("purchase_id"))
        .orderBy("event_id")
        .limit(200)
    )


def op_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via bucketed equi-join: error events inside
    [purchase_ts, purchase_ts + 2h) windows of the same user."""
    t = load_tables(spark, sf_dir)
    errors = t.events.where(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    windows = t.events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("end"),
    )
    joined = relational.interval_join(
        errors, windows, key="user_id", bucket="1 hour"
    )
    return (
        joined.select("event_id", "purchase_id")
        .orderBy("event_id", "purchase_id")
        .limit(200)
    )


def op_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 frame-spec window: cumulative customer spend over time."""
    t = load_tables(spark, sf_dir)
    out = relational.running_total(
        t.orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        key="o_custkey",
        order_by=["o_orderdate", "o_orderkey"],
        value_col="o_totalprice",
    )
    return (
        out.select(
            "o_custkey", "o_orderkey", F.round("running_total", 2).alias("running_total")
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    )


def op_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over order status × priority."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


def op_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns (explicit value
    list keeps the plan one-pass — no distinct-values pre-query)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("user_id")
    )


def op_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~2000-char budgets (n_chars as the token
    proxy): per-pack doc/char totals, deterministic in doc_id order."""
    from . import packing

    t = load_tables(spark, sf_dir)
    packed = packing.pack_sequences(
        t.documents.select("doc_id", "n_chars"), "n_chars", 2000
    )
    return (
        packing.pack_stats(packed, "n_chars")
        .select("pack_id", "n_docs", "n_tokens")
        .orderBy("pack_id")
        .limit(200)
    )


def op_stratified_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample of documents (training-data
    stratified take: window rank over the unique key)."""
    t = load_tables(spark, sf_dir)
    return (
        sampling.stratified_take(
            t.documents.select("doc_id", "lang"), "lang", 10, order_by="doc_id"
        )
        .orderBy("lang", "doc_id")
    )


def op_above_own_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (orders above their customer's own
    average) expressed as a window aggregate — the decorrelated plan
    Catalyst would build, stated directly: one shuffle on the key
    instead of a per-row subquery."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    return (
        t.orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(200)
    )


def op_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per key (Spark percentile ≡ DuckDB
    quantile_cont, verified)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 2).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 2).alias("p95"),
        )
        .orderBy("event_type")
    )


def op_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth: trim/pad/replace/substr/reverse over
    part names (all portable built-ins, F-family coverage)."""
    t = load_tables(spark, sf_dir)
    name = F.col("p_name")
    return (
        t.part.select(
            "p_partkey",
            F.trim(name).alias("t"),
            F.lpad(F.col("p_brand"), 12, "_").alias("padded"),
            F.replace(name, F.lit(" "), F.lit("-")).alias("dashed"),
            F.reverse(F.substring(name, 1, 6)).alias("rev6"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def op_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 JSON path extraction over events.props (different dialect
    functions, identical values: Spark get_json_object vs DuckDB
    json_extract_string)."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t.events.select((k % 10).alias("k_mod"))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k_mod")
    )


# ---------------------------------------------------------------------------
# Rows-only operator queries (deterministic, but not portable SQL)
# ---------------------------------------------------------------------------


def op_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate (accuracy property-tested vs
    exact; not oracle-hashable — estimator differs across engines)."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx")
    )


def op_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over documents (est. Jaccard ≥ 0.8)."""
    t = load_tables(spark, sf_dir)
    return dedup.dedup_minhash(t.documents, threshold=0.8).orderBy("id_a", "id_b")


def op_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3) over documents."""
    sigs = dedup.simhash_signatures(load_tables(spark, sf_dir).documents)
    return dedup.simhash_neardup_pairs(sigs).orderBy("id_a", "id_b")


def op_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ 0.8 over documents (word 3-grams:
    selective even on small-vocabulary corpora)."""
    t = load_tables(spark, sf_dir)
    return (
        dedup.ngram_jaccard_pairs(t.documents, threshold=0.8, mode="word", shingle_k=3)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


def op_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0."""
    t = load_tables(spark, sf_dir)
    qv = [float(x) for x in t.embeddings.where(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.cosine_topk(
        t.embeddings.where(F.col("vec_id") != 0), qv, k=10
    )


def op_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 for the same probe vector."""
    t = load_tables(spark, sf_dir)
    qv = [float(x) for x in t.embeddings.where(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ann_topk(
        t.embeddings.where(F.col("vec_id") != 0), qv, k=10, num_bits=8, n_probe=4
    )


def op_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell approximate top-10 for the same probe vector (k-means
    cells trained on a seeded sample; deterministic)."""
    t = load_tables(spark, sf_dir)
    qv = [float(x) for x in t.embeddings.where(F.col("vec_id") == 0).first()["embedding"]]
    corpus = t.embeddings.where(F.col("vec_id") != 0)
    index = similarity.IVFIndex.train(corpus, k=8, seed=42)
    return similarity.ivf_topk(corpus, qv, k=10, index=index, n_probe=3)


def op_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ 0.95) via sign-LSH."""
    t = load_tables(spark, sf_dir)
    return similarity.cosine_neardup_pairs(t.embeddings, threshold=0.95, dim=64).orderBy(
        "id_a", "id_b"
    )


def op_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted-language distribution over documents."""
    t = load_tables(spark, sf_dir)
    return (
        text.with_lang_id(t.documents)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred")
    )


def op_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score distribution (bucketed to 0.1) over documents."""
    t = load_tables(spark, sf_dir)
    return (
        text.with_quality_score(t.documents)
        .groupBy(F.round(F.floor(F.col("quality_score") * 10) / 10, 1).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )


OPERATOR_QUERIES = {
    "op_asof_join": op_asof_join,
    "op_interval_join": op_interval_join,
    "op_running_total": op_running_total,
    "op_cube": op_cube,
    "op_pivot": op_pivot,
    "op_sequence_pack": op_sequence_pack,
    "op_stratified_take": op_stratified_take,
    "op_above_own_avg": op_above_own_avg,
    "op_percentile": op_percentile,
    "op_string_funcs": op_string_funcs,
    "op_json_extract": op_json_extract,
    "op_approx_count_distinct": op_approx_count_distinct,
    "op_dedup_exact": op_dedup_exact,
    "op_token_count": op_token_count,
    "op_fingerprint": op_fingerprint,
    "op_text_quality": op_text_quality,
    "op_dedup_minhash": op_dedup_minhash,
    "op_dedup_simhash": op_dedup_simhash,
    "op_dedup_ngram_jaccard": op_dedup_ngram_jaccard,
    "op_similarity_topk": op_similarity_topk,
    "op_similarity_ann": op_similarity_ann,
    "op_similarity_ivf": op_similarity_ivf,
    "op_embedding_neardup": op_embedding_neardup,
    "op_lang_id": op_lang_id,
    "op_quality_score": op_quality_score,
}

OPERATOR_ORACLE_SQL = {
    "op_asof_join": """
SELECT e.event_id, e.user_id, p.event_id AS purchase_id
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id LIMIT 200
""",
    "op_interval_join": """
SELECT e.event_id, p.event_id AS purchase_id
FROM events e
JOIN events p
  ON e.user_id = p.user_id
 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 2 HOUR
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
ORDER BY e.event_id, purchase_id LIMIT 200
""",
    "op_running_total": """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey LIMIT 200
""",
    "op_cube": """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
""",
    "op_pivot": """
SELECT user_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error
FROM events GROUP BY user_id ORDER BY user_id
""",
    "op_sequence_pack": """
SELECT pack_id, count(*) AS n_docs, sum(n_chars) AS n_tokens
FROM (SELECT doc_id, n_chars,
             cast(floor((sum(n_chars) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_chars) / 2000) AS BIGINT) AS pack_id
      FROM documents) t
GROUP BY pack_id ORDER BY pack_id LIMIT 200
""",
    "op_stratified_take": """
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents) t
WHERE rn <= 10 ORDER BY lang, doc_id
""",
    "op_above_own_avg": """
SELECT o_orderkey FROM orders o
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey LIMIT 200
""",
    "op_percentile": """
SELECT event_type, round(quantile_cont(value, 0.5), 2) AS p50,
       round(quantile_cont(value, 0.95), 2) AS p95
FROM events GROUP BY event_type ORDER BY event_type
""",
    "op_string_funcs": """
SELECT p_partkey, trim(p_name) AS t, lpad(p_brand, 12, '_') AS padded,
       replace(p_name, ' ', '-') AS dashed,
       reverse(substr(p_name, 1, 6)) AS rev6
FROM part ORDER BY p_partkey LIMIT 100
""",
    "op_json_extract": """
SELECT cast(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       count(*) AS cnt
FROM events
GROUP BY k_mod ORDER BY k_mod
""",
    "op_dedup_exact": """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
ORDER BY keep_id LIMIT 200
""",
    "op_token_count": """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
FROM documents ORDER BY doc_id LIMIT 200
""",
    "op_fingerprint": """
SELECT doc_id, md5(text) AS fp_md5
FROM documents ORDER BY doc_id LIMIT 200
""",
    "op_text_quality": """
SELECT doc_id,
       length(text) AS n_chars_calc,
       length(text) - length(replace(text, ' ', '')) AS n_spaces,
       round(cast(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
             / greatest(length(text), 1), 4) AS word_density
FROM documents ORDER BY doc_id LIMIT 200
""",
}
