"""Distributed Bloom filter as a DataFrame — membership at 10^12 keys.

The cross-snapshot question a crawler asks every tick — "which of
these urls/hashes have we EVER seen?" — is an anti-join against a
standing table that only grows. At 10^12 keys the exact anti-join
shuffles the probe set against the full standing key column; a Bloom
filter answers probably-seen/definitely-new from a bitset a thousandth
that size (the reference's import path asks the same question against
Postgres per batch, /root/reference/files/import.go).

Spark's built-in BloomFilter (df.stat.bloomFilter) materializes the
bitset ON THE DRIVER and broadcasts it — a dead end past a few GB.
Spark's internal bloom_filter_agg expression is not SQL-registered in
4.1. So the bitset lives as a DataFrame instead: one row per 64-bit
word, (word, bits). Build = explode each key into k bit positions,
partial-aggregated bit_or per word — one shuffle keyed on word index,
perfectly uniform by construction (no skew, no salt needed). Probe =
explode probe keys into the same positions and join on word — also
uniform. A 10^12-key / 1% bitset is ~1.1 TB: far past any broadcast,
trivially fine as a sharded join side; sorted-bucketed on word, the
probe join co-locates.

No false negatives, ever (deterministic xxhash64 positions); false
positives at the textbook (1 - e^{-kn/m})^k rate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_mask(key: Column, m_bits: int, seed: int) -> tuple[Column, Column]:
    pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
    word = (pos / F.lit(64)).cast("long")
    # F.shiftleft only takes a Python-int shift; the SQL function form
    # accepts a column
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return word, mask


def optimal_k(m_bits: int, n_keys: int) -> int:
    """k minimizing the false-positive rate for m bits / n keys."""
    if n_keys <= 0:
        return 1
    return max(1, round(math.log(2) * m_bits / n_keys))


def false_positive_rate(m_bits: int, n_keys: int, k: int) -> float:
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int, k: int = 6
) -> DataFrame:
    """→ (word, bits): the set bitset words (absent word ≡ 0). One
    explode (k rows/key) + one partial-aggregated bit_or shuffle keyed
    on the uniformly-distributed word index."""
    cols = []
    for i in range(k):
        w, m = _word_mask(F.col(key_col), m_bits, i)
        cols.append(F.struct(w.alias("word"), m.alias("mask")))
    return (
        df.select(F.explode(F.array(*cols)).alias("wm"))
        .select("wm.word", "wm.mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 6,
) -> DataFrame:
    """→ df columns + might_contain. A key is probably-seen iff every
    one of its k probe bits is set; any missing word row decides
    definitely-new (NULL bits → bit unset). The join keys on word —
    uniform, co-locatable with a word-bucketed standing bitset."""
    probes = []
    for i in range(k):
        w, m = _word_mask(F.col(key_col), m_bits, i)
        probes.append(F.struct(w.alias("word"), m.alias("mask")))
    exploded = df.select(key_col, F.explode(F.array(*probes)).alias("wm")).select(
        key_col, F.col("wm.word").alias("word"), F.col("wm.mask").alias("mask")
    )
    hit = (
        exploded.join(bloom, "word", "left")
        .withColumn(
            "bit_set",
            F.coalesce(
                (F.col("bits").bitwiseAND(F.col("mask")) != 0), F.lit(False)
            ),
        )
        .groupBy(key_col)
        .agg(F.min("bit_set").alias("might_contain"))
    )
    return df.join(hit, key_col)


def definitely_new(
    probe_df: DataFrame,
    seen_df: DataFrame,
    key_col: str,
    bits_per_key: int = 16,
    n_seen: int | None = None,
) -> DataFrame:
    """The crawl-frontier filter: rows of ``probe_df`` whose key is
    DEFINITELY not in ``seen_df`` (no false negatives → nothing seen
    leaks through; a small false-positive share of genuinely-new rows
    is deferred to the exact path, never lost). ``n_seen`` from table
    metadata when the caller has it (commit markers / snapshot
    summary); one count job otherwise."""
    if n_seen is None:
        n_seen = seen_df.count()
    m_bits = max(64, bits_per_key * max(1, n_seen))
    k = optimal_k(m_bits, max(1, n_seen))
    bloom = bloom_build(seen_df, key_col, m_bits, k)
    return bloom_probe(probe_df, bloom, key_col, m_bits, k).filter(
        ~F.col("might_contain")
    ).drop("might_contain")
