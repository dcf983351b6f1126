"""Product quantization (PQ): embedding compression + ADC top-k search.

PQ splits each D-dim vector into ``m`` contiguous subvectors of D/m dims
and replaces each subvector with the id of its nearest centroid from a
per-subspace codebook of ``ksub`` entries — so a row stores m small ints
(bytes when ksub <= 256) instead of D floats. For the 64-dim float32
corpus here, m=8 codes shrink 256 B to 8 B: a 32x storage cut, which is
what lets a 100 TB embedding corpus sit retrieval-hot on a cluster
(codes fit page cache; raw vectors stay cold for optional re-ranking).

Query-time scoring is asymmetric distance (ADC): the query stays exact.
Per subspace j, the squared distances from the query's j-th subvector to
all ksub centroids form an (m x ksub) lookup table computed once
driver-side (tiny: m*ksub doubles) and shipped into the plan as
literals; a row's approximate squared-L2 distance is the sum of m table
lookups on its codes — a pure whole-stage-codegen projection over the
codes column (no vector decode, no shuffle), with top-k via
TakeOrderedAndProject. Encoding itself is also projection-only, so at
scale the codes table is written once (partitioned like the corpus) and
every query is a codes-scan + projection + top-k.

Public-knowledge basis: Jegou, Douze, Schmid — "Product Quantization
for Nearest Neighbor Search" (IEEE TPAMI 2011). The reference workflow
repo has no vector surface at all (SURVEY.md §2 — its data plane is
JSON-over-REST monitoring); PQ extends the LLM-data similarity family
(`operators/similarity.py`: brute/LSH/IVF) with the compressed-domain
path.

Determinism contract (what makes ``op_similarity_pq`` hash-attestable
against the DuckDB oracle):

- codebooks train on the first ``sample_rows`` rows ordered by id
  (bounded TakeOrdered — independent of partitioning and scan order)
  with seeded numpy Lloyd's, so ``pq_codebooks_from_parquet`` rebuilds
  bit-identical codebooks straight from the parquet file;
- encoding argmin ties break toward the smaller code on both sides
  (Spark: ``array_min`` over (dist, code) structs; SQL: ``ORDER BY
  dist, c LIMIT 1``);
- every accumulation is an in-order sequential fold on both sides
  (Spark ``F.aggregate`` left fold / DuckDB ``list_sum`` over
  ``list_transform`` — the same pairing every oracle in the similarity
  family relies on).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def pq_train(
    sample: "np.ndarray",
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> "np.ndarray":
    """Seeded per-subspace Lloyd's k-means over an (n, D) float64 sample
    → (m, ksub, D/m) codebooks. Pure numpy and fully deterministic in
    (sample order, m, ksub, iters, seed) — shared by the Spark-side
    ``PQIndex.train`` and the parquet-side ``pq_codebooks_from_parquet``
    oracle twin. Empty cells keep their previous centroid (same guard as
    ``similarity.spherical_kmeans``)."""
    sample = np.asarray(sample, dtype=float)
    n, dim = sample.shape
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    if n < ksub:
        raise ValueError(f"pq_train: sample rows {n} < ksub {ksub}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=float)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            # squared L2 to each centroid; argmin ties -> smallest code
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_codebooks_from_parquet(
    path: str,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> "np.ndarray":
    """Recompute ``PQIndex.train``'s exact codebooks directly from a
    parquet file (pyarrow, no Spark) — the oracle-side twin used to
    embed codebook literals into DuckDB SQL. Bit-identical because both
    sides sort the sample by id and run ``pq_train``."""
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(path, columns=[id_col, vec_col])
    ids = np.asarray(tbl.column(id_col).to_pylist())
    vecs = np.asarray(tbl.column(vec_col).to_pylist(), dtype=float)
    if exclude_id is not None:
        keep = ids != exclude_id
        ids, vecs = ids[keep], vecs[keep]
    order = np.argsort(ids, kind="stable")
    sample = vecs[order][:sample_rows]
    return pq_train(sample, m=m, ksub=ksub, iters=iters, seed=seed)


def _seq_sum(terms: Column) -> Column:
    """In-order left fold of an array<double> — the accumulation shape
    DuckDB's ``list_sum(list_transform(...))`` reproduces exactly."""
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


class PQIndex:
    """Trained PQ codebooks + the expressions that use them.

    Codebooks are tiny (m × ksub × dsub doubles) and live in the plan as
    literals — encoding and ADC scoring are both pure projections, so
    neither adds a shuffle and both stay inside whole-stage codegen.
    """

    def __init__(self, codebooks: "np.ndarray"):
        books = np.asarray(codebooks, dtype=float)
        if books.ndim != 3:
            raise ValueError("PQIndex: codebooks must be (m, ksub, dsub)")
        self.codebooks = books
        self.m, self.ksub, self.dsub = books.shape

    @classmethod
    def train(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str | None = "vec_id",
        m: int = 8,
        ksub: int = 16,
        sample_rows: int = 10_000,
        iters: int = 10,
        seed: int = 42,
    ) -> "PQIndex":
        """Train on a bounded driver-side sample: the first
        ``sample_rows`` rows ordered by id (TakeOrdered — cheap and
        reproducible regardless of partitioning), same contract as
        ``similarity.IVFIndex.train``."""
        q = df.select(*([id_col] if id_col else []), vec_col)
        if id_col is not None:
            q = q.orderBy(id_col)
        sample = np.asarray(
            [r[vec_col] for r in q.limit(sample_rows).collect()], dtype=float
        )
        return cls(pq_train(sample, m=m, ksub=ksub, iters=iters, seed=seed))

    def _sub_dist2(self, vec_col: Column, j: int, c: int) -> Column:
        """Squared L2 from the j-th subvector to codebook entry c, as a
        sequential fold in dimension order."""
        sub = F.slice(vec_col, j * self.dsub + 1, self.dsub)
        lit = F.array(*[F.lit(float(x)) for x in self.codebooks[j, c]])
        diffs = F.zip_with(
            sub,
            lit,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        )
        return _seq_sum(diffs)

    def code_col(self, vec_col: Column | str, j: int) -> Column:
        """Nearest-centroid code for subspace j: ``array_min`` over
        (dist, code) structs — ties break to the smaller code, matching
        the oracle's ``ORDER BY dist, c LIMIT 1``."""
        v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        scored = [
            F.struct(
                self._sub_dist2(v, j, c).alias("dist"),
                F.lit(c).alias("code"),
            )
            for c in range(self.ksub)
        ]
        return F.array_min(F.array(*scored))["code"]

    def codes_col(self, vec_col: Column | str) -> Column:
        """All m codes as one array<int> — the compressed row."""
        return F.array(*[self.code_col(vec_col, j) for j in range(self.m)])

    def adc_table(self, query_vec: list[float]) -> "np.ndarray":
        """(m, ksub) squared-L2 lookup table for one exact query —
        computed driver-side in float64; the same numpy path generates
        the oracle's literal table, so both engines look up identical
        doubles."""
        q = np.asarray(query_vec, dtype=float)
        if q.shape != (self.m * self.dsub,):
            raise ValueError(
                f"adc_table: query dim {q.shape} != {self.m * self.dsub}"
            )
        subs = q.reshape(self.m, 1, self.dsub)
        return ((subs - self.codebooks) ** 2).sum(axis=2)

    def adc_score_col(
        self, codes_col: Column | str, table: "np.ndarray"
    ) -> Column:
        """Approximate squared L2 = in-order sum over j of
        table[j][codes[j]] — m literal-array lookups, zero vector math
        at query time."""
        codes = F.col(codes_col) if isinstance(codes_col, str) else codes_col
        terms = F.array(
            *[
                F.element_at(
                    F.array(*[F.lit(float(v)) for v in table[j]]),
                    F.element_at(codes, j + 1) + F.lit(1),
                )
                for j in range(self.m)
            ]
        )
        return _seq_sum(terms)


def pq_encode(
    df: DataFrame,
    index: PQIndex,
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Compress the corpus: append the m-code column (projection-only —
    at scale, write this once, partitioned like the corpus, and drop the
    raw vectors from the retrieval path)."""
    return df.withColumn(codes_col, index.codes_col(vec_col))


def pq_save_codes(
    df: DataFrame,
    index: PQIndex,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Production index build: encode the corpus ONCE and persist the
    (id, codes) table as parquet with a codebooks sidecar — retrieval
    then reads 32×-compressed codes and never touches raw vectors (or
    pays re-train/re-encode) again. The codebooks are m×ksub×dsub
    doubles (~KB): a JSON sidecar, written atomically LAST so its
    presence marks a complete index."""
    import json
    import os

    pq_encode(df, index, vec_col).select(id_col, "codes").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "codes.parquet"))
    tmp = os.path.join(path, ".codebooks.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"id_col": id_col, "codebooks": index.codebooks.tolist()}, f
        )
    os.replace(tmp, os.path.join(path, "codebooks.json"))


def pq_load_codes(spark, path: str) -> tuple[PQIndex, DataFrame]:
    """Load a :func:`pq_save_codes` index: (PQIndex, codes DataFrame).
    The codes frame feeds :func:`pq_adc_topk` directly (its ``codes``
    column short-circuits encoding)."""
    import json
    import os

    with open(os.path.join(path, "codebooks.json")) as f:
        meta = json.load(f)
    codes = spark.read.parquet(os.path.join(path, "codes.parquet"))
    return PQIndex(np.asarray(meta["codebooks"], dtype=float)), codes


def pq_adc_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    index: PQIndex | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    codes_col: str = "codes",
) -> DataFrame:
    """Compressed-domain top-k: encode (or reuse a pre-encoded
    ``codes_col``), score by ADC lookup, keep the k smallest distances
    (TakeOrderedAndProject — no global sort). Pass a pre-trained
    ``index`` to amortize training across queries (the production
    shape). Ties break on id."""
    if index is None:
        index = PQIndex.train(
            df, vec_col=vec_col, id_col=id_col, m=m, ksub=ksub, seed=seed
        )
    table = index.adc_table(query_vec)
    if codes_col in df.columns:
        coded = df.select(
            F.col(id_col).alias("id"), F.col(codes_col).alias("codes")
        )
    else:
        coded = df.select(F.col(id_col).alias("id"), F.col(vec_col)).withColumn(
            "codes", index.codes_col(vec_col)
        )
    scored = coded.select(
        "id", index.adc_score_col("codes", table).alias("adc_dist")
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col("id").asc()).limit(k)
