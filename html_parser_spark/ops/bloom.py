"""Bloom-filter "seen set" over URL / document keys.

A crawl frontier asks one question billions of times: *have I seen this
URL before?*  An exact answer needs the full seen-set (an anti-join
against 10^10 rows); a Bloom filter answers "definitely new" for the
overwhelming majority of candidates with a few bit probes and NO false
negatives, shrinking the exact anti-join to the "maybe seen" sliver.

Two paths, matching the engine's two needs:

* :func:`bloom_build` / :func:`bloom_probe` — a **deterministic,
  cross-engine-exact** Bloom filter kept as a DISTRIBUTED ``(word_idx,
  word)`` bitset table.  Hashes are salted md5 slices, so the DuckDB
  oracle reproduces every bit; the bitset is rows, never one giant
  driver-side blob, so ``m_bits`` can scale to billions (the table IS
  already sharded by ``word_idx``).  Build is one groupBy with
  map-side ``bit_or`` partials (associative — partial aggregation is
  exact); probe is an equi-join on ``word_idx`` + one groupBy per key.
* Spark's own runtime bloom-filter join pruning (on by default) covers
  the in-plan case; see the note at the bottom of this module for why
  there is no user-facing ``bloom_filter_agg`` wrapper here.

Words hold **62 bits, not 64**: ``1 << 63`` overflows a signed BIGINT
in DuckDB (and flips the sign bit in Spark), so capping the in-word
shift at 61 keeps every word non-negative and bit-identical in both
engines.  The 3 % space overhead is noise next to portability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BITS_PER_WORD = 62


def _positions(key: Column, k_hashes: int, m_bits: int) -> list[Column]:
    """k independent bit positions: the first 8 hex chars (32 bits) of
    md5(key ++ '_' ++ i), mod m_bits — deterministic, engine-portable."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(key, F.lit(f"_{i}"))), 1, 8), 16, 10
            ).cast("long")
            % F.lit(int(m_bits))
        )
        for i in range(k_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Seen-set bitset: ``(word_idx, word)`` rows holding every set word
    of an ``m_bits`` Bloom filter over ``keys``.

    Plan: explode the k positions per key (narrow) → ONE groupBy on
    ``word_idx`` with ``bit_or`` partials.  Output is at most
    ``m_bits / 62`` rows regardless of key count — small enough to
    broadcast into the probe join for any sane ``m_bits``.
    """
    pos = keys.select(
        F.explode(
            F.array(*_positions(F.col(key_col), k_hashes, m_bits))
        ).alias("pos")
    )
    return (
        pos.select(
            F.floor(F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(pos % {BITS_PER_WORD} as int))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    bitset: DataFrame,
    candidates: DataFrame,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """``(key, maybe_seen)``: True iff ALL k bits are set — possible
    false positives, never false negatives (the filter's contract).

    Plan: explode candidate positions → equi-join the bitset on
    ``word_idx`` (AQE broadcasts the tiny bitset side) → per-key
    all-bits-hit via a min over 0/1 — one groupBy, map-side partials.
    ``m_bits`` / ``k_hashes`` MUST match the build call (documented
    rather than carried in-band: the bitset is a plain table).
    """
    cand = candidates.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(*_positions(F.col(key_col), k_hashes, m_bits))
        ).alias("pos"),
    ).select(
        "key",
        F.floor(F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(cast(1 as bigint), cast(pos % {BITS_PER_WORD} as int))"
        ).alias("mask"),
    )
    j = cand.join(bitset, "word_idx", "left")
    hit = (
        F.col("word").isNotNull()
        & (F.col("word").bitwiseAND(F.col("mask")) != 0)
    ).cast("int")
    return (
        j.groupBy("key")
        .agg((F.min(hit) == 1).alias("maybe_seen"))
        .select(F.col("key").alias(key_col), "maybe_seen")
    )


# NOTE on the Spark-native alternative: Spark's own Bloom machinery
# (BloomFilterAggregate / might_contain) is NOT a user-callable SQL
# routine in Spark 4.1 — it exists only as the internal expression pair
# the optimizer injects for runtime bloom-filter join pruning
# (spark.sql.optimizer.runtime.bloomFilter.enabled, on by default), or
# via DataFrameStatFunctions into a DRIVER-side sketch object.  Joins
# against the seen set already get that pruning for free; the
# cross-engine bitset above is for the cases the optimizer cannot
# cover: persisting the filter as a table between crawl rounds and
# probing without loading the seen set at all.
