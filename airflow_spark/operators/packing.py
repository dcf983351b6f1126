"""Sequence packing: assign documents to ~fixed-token-budget packs.

Training pipelines concatenate documents into fixed-length sequences;
the assignment step is a running-total partition: pack k = the docs
whose cumulative token count lands in [k·B, (k+1)·B). Expressed as a
window cumulative sum — one sort-shuffle, no driver loop, deterministic
given a total order.

This is the streaming-friendly first-fit-in-order approximation (packs
can overflow by at most one document); exact bin-packing is NP-hard
and never worth a shuffle's cost at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    pack_budget: int,
    order_by: str = "doc_id",
    out_col: str = "pack_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign ``out_col`` = floor((cumsum_before) / budget) in
    ``order_by`` order. Docs larger than the budget get their own
    pack(s) downstream — they still receive a deterministic id here.

    **Scale note**: without ``shard_col`` the window is global — one
    sorted partition, fine for test scale, a straggler at corpus
    scale. Production packs per shard: pass ``shard_col`` (e.g.
    ``pmod(xxhash64(id), n_shards)``) and each shard packs
    independently in parallel; pack ids are (shard, local) made
    globally unique by composition."""
    if shard_col is None:
        w = Window.orderBy(order_by).rowsBetween(Window.unboundedPreceding, 0)
        cum = F.sum(token_col).over(w) - F.col(token_col)
        return df.withColumn(out_col, F.floor(cum / pack_budget).cast("long"))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(token_col).over(w) - F.col(token_col)
    local = F.floor(cum / pack_budget).cast("long")
    # globally unique pack id: (shard, local) packed into one long.
    # The composition is only injective while 0 <= local < 1e9 and
    # shard >= 0 — a shard holding a billion packs (or a caller passing
    # a signed hash instead of pmod) would silently merge unrelated
    # packs downstream, so out-of-range rows raise instead.
    shard = F.col(shard_col).cast("long")
    return df.withColumn(
        out_col,
        F.when(
            (local >= 0) & (local < F.lit(1_000_000_000)) & (shard >= 0),
            shard * F.lit(1_000_000_000) + local,
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "pack id overflow: shard=%s local=%s — use more "
                    "shards (or a struct id) past 1e9 packs per shard; "
                    "shard values must be non-negative (pmod, not hash)",
                    shard,
                    local,
                )
            ).cast("long")
        ),
    )


def pack_stats(packed: DataFrame, token_col: str, pack_col: str = "pack_id") -> DataFrame:
    """Per-pack fill statistics (docs, tokens, utilization vs budget is
    the caller's division)."""
    return packed.groupBy(pack_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
    )
