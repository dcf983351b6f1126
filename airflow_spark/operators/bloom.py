"""Explicit Bloom-filter pre-filtering built from native DataFrame ops.

Spark injects runtime bloom filters into shuffle joins on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) but does not
expose the aggregate as a public SQL function, so these helpers build
an explicit, engine-controlled bloom filter as a tiny
``(word_idx, word)`` DataFrame: ``num_bits`` bits stored as 64-bit
words, populated by ONE grouped ``bit_or`` aggregation over the build
side (bit_or is partially aggregable, so the shuffle after the
``num_hashes``-way probe explode carries at most ``num_bits/64`` rows
per map task). The filter never has to touch the driver — membership
tests broadcast-join the words table, so the whole path stays
distributed and lazy.

100 TB posture: the point of the filter is to make *incremental* exact
dedup of a small new batch against a huge history corpus cheap — see
``dedup.bloom_dedup_new``. The history is scanned once to build a
fixed-size bitset (KBs-MBs regardless of corpus size); the new batch
is pruned to probable-duplicates; only those few keys ever probe the
history again, via broadcast semi join — the history is never
shuffled.

Reference analog: behavior contract only — the reference
(jnstockley/airflow) has no dedup at all; this is part of the
north-star LLM-pipeline extension (SURVEY.md §2 M5).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: bits ``m = -n·ln p / (ln 2)²`` rounded up to a
    multiple of 64, hash count ``k = m/n·ln 2``. Returns
    ``(num_bits, num_hashes)``."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    num_bits = max(64, int(math.ceil(m / 64.0)) * 64)
    num_hashes = max(1, round(num_bits / expected_items * math.log(2)))
    return num_bits, min(num_hashes, 16)


def _probe_positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for ``key`` — independent
    probes from ``xxhash64(key, i)`` (seeding by an extra hashed column
    rather than ``h1 + i·h2`` double hashing, which could overflow
    BIGINT under ANSI mode)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str | Column,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Build the filter over ``key_col``: returns a sparse
    ``(word_idx, word)`` DataFrame with at most ``num_bits/64`` rows
    (absent words are all-zero). One explode + one grouped bit_or;
    duplicates on the build side just re-set the same bits, so no
    distinct pass is needed."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pos = df.select(
        F.explode(_probe_positions(key, num_bits, num_hashes)).alias("pos")
    )
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(cast(1 AS BIGINT), cast(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_filter_might_contain(
    df: DataFrame,
    key_col: str | Column,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
    id_col: str,
) -> DataFrame:
    """Rows of ``df`` whose key is *possibly* in the filter (every
    probe bit set). No false negatives — membership is decided per
    DISTINCT KEY and joined back on the key itself, so duplicate or
    null ``id_col`` values cannot merge the probe sets of different
    keys (grouping probes by a non-unique row id would bool_and across
    unrelated keys and drop true members). False-positive rate set by
    the build parameters. The probe explodes the distinct keys
    ``num_hashes``-fold and broadcast-joins the (tiny) words table —
    ``df`` is the small side of the incremental pattern, so the
    explode is cheap. ``id_col`` is retained for signature
    compatibility but no longer needs to be unique."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    keyed = (
        df.select(key.alias("__bloom_k"))
        .where(F.col("__bloom_k").isNotNull())
        .distinct()
    )
    probes = keyed.select(
        "__bloom_k",
        F.explode(
            _probe_positions(F.col("__bloom_k"), num_bits, num_hashes)
        ).alias("pos"),
    ).select(
        "__bloom_k",
        F.shiftright("pos", 6).alias("word_idx"),
        (F.col("pos") % 64).alias("bit_idx"),
    )
    hit = F.coalesce(
        F.expr("(word >> cast(bit_idx AS INT)) & 1 = 1"), F.lit(False)
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select("__bloom_k", hit.alias("hit"))
        .groupBy("__bloom_k")
        .agg(F.bool_and("hit").alias("all_hit"))
        .where("all_hit")
        .select("__bloom_k")
    )
    return df.join(
        F.broadcast(hits), key.eqNullSafe(F.col("__bloom_k")), "left_semi"
    )
