"""Training-data assembly pipeline: the round-2 curation operators
composed end-to-end — the stage that runs AFTER corpus-prep
(pipelines/corpus.py) and turns a clean corpus into packed, split,
mixture-balanced training shards.

    ingest ─▶ decontaminate ─▶ repetition_gate ─▶ mixture ─▶ split ─▶ pack ─▶ publish

Shuffle budget: decontamination joins against broadcast benchmark
shingles; the repetition gate is one bigram agg; mixture/split/pack are
window/projection work on the (already deduped) survivor set. Every
stage reports row counts through XCom so a run's attrition funnel is
auditable from the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import curation, packing
from ..pipeline.core import Context, Param, Pipeline
from ..pipeline.expectations import expect_nonempty
from ..sources.tables import write_partitioned


def build_training_data_pipeline(
    source: "callable",
    benchmark: "callable",
    output_path: str | None = None,
    mixture: dict[str, float] | None = None,
    total_rows: int = 1000,
    **pipeline_kw,
) -> Pipeline:
    """``source(ctx) -> DataFrame[doc_id, text, lang, n_chars]``;
    ``benchmark(ctx) -> DataFrame[doc_id, text]`` (the eval set that
    must not leak into training)."""
    p = Pipeline(
        "training-data",
        params={
            "max_dup_word_frac": Param(0.9, type="number"),
            "pack_budget": Param(2000, type="number"),
            "tokenizer": Param("chars", type="string"),
        },
        **pipeline_kw,
    )

    @p.task
    def ingest(ctx: Context) -> dict:
        docs = source(ctx)
        expect_nonempty(docs, "empty corpus")
        ctx.outputs["_docs"] = docs
        return {"n_docs": docs.count()}

    @p.task(depends_on=["ingest"])
    def decontaminate(ctx: Context) -> dict:
        docs: DataFrame = ctx.outputs["_docs"]
        flags = curation.decontaminate(docs, benchmark(ctx))
        clean_ids = flags.where(~F.col("contaminated")).select("id")
        kept = docs.join(
            clean_ids.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi"
        )
        ctx.outputs["_clean"] = kept
        return {"n_after_decontam": kept.count()}

    @p.task(depends_on=["decontaminate"])
    def repetition_gate(ctx: Context) -> dict:
        docs: DataFrame = ctx.outputs["_clean"]
        sig = curation.repetition_signals(docs)
        ok = sig.where(
            F.col("dup_word_frac") <= float(ctx.param("max_dup_word_frac"))
        ).select(F.col("id").alias("doc_id"))
        kept = docs.join(ok, "doc_id", "left_semi")
        ctx.outputs["_unrepetitive"] = kept
        return {"n_after_repetition": kept.count()}

    @p.task(depends_on=["repetition_gate"])
    def mixture_sample(ctx: Context) -> dict:
        docs: DataFrame = ctx.outputs["_unrepetitive"]
        if mixture:
            docs = curation.sample_mixture(
                docs, "lang", mixture, total_rows, order_by="doc_id"
            )
        ctx.outputs["_mixed"] = docs
        return {"n_after_mixture": docs.count()}

    @p.task(depends_on=["mixture_sample"])
    def split(ctx: Context) -> dict:
        docs: DataFrame = ctx.outputs["_mixed"]
        out = curation.split_by_group_hash(
            docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        )
        ctx.outputs["_split"] = out
        return {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }

    @p.task(depends_on=["split"])
    def pack(ctx: Context) -> dict:
        docs: DataFrame = ctx.outputs["_split"]
        budget = int(ctx.param("pack_budget"))
        tokenizer = str(ctx.param("tokenizer"))
        if tokenizer == "bpe":
            # pack on REAL subword token counts: train merges on the
            # surviving corpus (bounded by vocab), count distributed,
            # budget means model tokens instead of characters
            from ..operators import tokenize

            merges = tokenize.train_bpe(
                tokenize.word_counts_from_df(docs), n_merges=40
            )
            counts = tokenize.bpe_token_counts(
                docs, "doc_id", "text", merges
            ).select(F.col("id").alias("doc_id"), "n_tokens")
            docs = docs.join(counts, "doc_id")
            budget_col = "n_tokens"
        else:
            budget_col = "n_chars"
        sharded = docs.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(8)))
        packed = packing.pack_sequences(
            sharded, budget_col, budget, shard_col="shard"
        )
        ctx.outputs["_packed"] = packed
        return {
            "n_packs": packed.select("pack_id").distinct().count(),
            "budget_col": budget_col,
        }

    @p.task(depends_on=["pack"])
    def publish(ctx: Context) -> dict:
        out: DataFrame = ctx.outputs["_packed"]
        if output_path:
            write_partitioned(out, output_path, ["split"])
            return {"published_to": output_path}
        return {"published_to": None}

    return p
