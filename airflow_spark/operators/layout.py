"""Physical-layout operators: multi-dimensional (Z-order) clustering.

A 100 TB table is usually range-partitioned/sorted on ONE key, so
filters on a second column prune nothing. Z-ordering interleaves the
bits of several normalized key columns into one scalar and
range-sorts on it, so rows close in ANY of the dimensions land in the
same files — parquet min/max stats then prune scans for filters on
every participating column (the public Delta/Iceberg `OPTIMIZE ZORDER
BY` technique, re-expressed as native Spark exprs).

``zorder_value`` is a pure codegen projection (shift/mask/or bit
arithmetic, no UDF); ``write_zordered`` = repartitionByRange +
sortWithinPartitions on that scalar — one range shuffle, the same
cost as any global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_value(cols: Sequence[Column | str], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already
    integer-normalized) column into one Z-value scalar.

    Callers map raw values into ``[0, 2**bits)`` first — e.g.
    ``pmod(hash(c), 2**bits)`` for categoricals or a width-bucket for
    numerics; this function only interleaves. With ``d`` columns the
    result uses ``d * bits`` bits (≤ 63 enforced).
    """
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder_value needs at least 2 columns")
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols × {bits} bits exceeds a signed long")
    parts = []
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            # bit i of column j → output bit (i * ncols + j)
            parts.append(
                F.shiftleft(
                    F.shiftright(cc, i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-value of ``cols``
    (columns must already be integer-normalized to ``[0, 2**bits)``).

    Range-partitioning on the Z-value balances files by data volume;
    the within-partition sort gives each file a tight min/max envelope
    on every participating column.
    """
    if num_files is not None and num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    z = zorder_value(list(cols), bits).alias("__z")
    out = df.withColumn("__z", z)
    shaped = (
        out.repartitionByRange(num_files, "__z")
        if num_files is not None
        else out.repartitionByRange("__z")
    )
    shaped.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    id_col: str = "file_id",
    n_shards: int | None = None,
    out_col: str = "bin_id",
) -> DataFrame:
    """Small-file compaction planning: group files into rewrite bins of
    ~``target_bytes`` each (the public Delta/Iceberg `OPTIMIZE`
    bin-packing step, planned as a DataFrame — no driver-side loop
    over a million file names).

    Shape: order files largest-first (classic first-fit-decreasing
    ordering — big files seed bins, small ones fill them), running
    cumulative size, bin = floor(cum_before / target). Like
    ``pack_sequences`` this is the in-order approximation (a bin can
    overflow by at most one file) — exact bin packing is NP-hard and
    pointless when the rewrite job tolerates ±1 file of skew.

    **Scale note**: the global form sorts in ONE partition. Past ~1M
    files pass ``n_shards``: each shard plans independently (portable
    md5 hash of the id, so oracles reproduce the plan bit-for-bit)
    and bin ids compose as shard*1e9+local — same contract as sharded
    sequence packing. Files already >= the target are their own bins
    either way.
    """
    from ..functions.hashing import md5_uniform

    size = F.col(size_col).cast("long")
    order = [F.col(size_col).desc(), F.col(id_col).asc()]
    if n_shards is None:
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        cum_before = F.sum(size).over(w) - size
        return files.withColumn(
            out_col, F.floor(cum_before / target_bytes).cast("long")
        )
    shard = md5_uniform(F.col(id_col), "compact", modulus=n_shards)
    sharded = files.withColumn("__shard", shard)
    w = (
        Window.partitionBy("__shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_before = F.sum(size).over(w) - size
    local = F.floor(cum_before / target_bytes).cast("long")
    return sharded.withColumn(
        out_col, F.col("__shard").cast("long") * F.lit(1_000_000_000) + local
    ).drop("__shard")
