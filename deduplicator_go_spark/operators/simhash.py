"""SimHash near-duplicate detection — fully native column algebra.

Complementary to MinHash: a single 64-bit signature whose Hamming
distance tracks cosine similarity of the token multiset.  No
reference analog (the reference only has exact SHA-256); included as
a first-class dedup operator for the training-data pipeline tier.

Implementation is pure pyspark.sql.functions (no UDF): tokens →
xxhash64 per token → per-bit vote via bitwise ops inside an
aggregate over the exploded token table.  The banding trick for
candidate lookup splits the 64-bit simhash into 4 16-bit bands
(pigeonhole: any pair within Hamming distance 3 shares at least one
exact band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash(docs: DataFrame, text_col: str = "text", n_bits: int = 64) -> DataFrame:
    """→ (url, simhash: long). Token-level simhash, native exprs only."""
    toks = docs.select(
        "url", F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    hashed = toks.select("url", F.xxhash64("tok").alias("h"))
    # per-bit votes: +1 if bit set else -1, summed per url
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(n_bits)
    ]
    agg = hashed.groupBy("url").agg(*votes)
    sig = agg.select(
        "url",
        sum(
            (F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** b if b < 63 else -(2 ** 63)))
            for b in range(n_bits)
        ).cast("long").alias("simhash"),
    )
    return sig


def hamming_distance(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(
    sig: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    scope_cols: list[str] | None = None,
) -> DataFrame:
    """Band the 64-bit simhash into ``n_bands`` chunks; pairs agreeing on
    any band and within ``max_hamming`` overall are candidates.
    (Pigeonhole guarantees completeness when max_hamming < n_bands.)

    ``scope_cols`` join into the bucket key, so pairs can only form
    within a scope (e.g. per media kind for perceptual hashes) and the
    scope rides along in the output."""
    scope = list(scope_cols or [])
    width = 64 // n_bands
    mask = F.lit((1 << width) - 1)
    bands = sig.select(
        *scope,
        "url",
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(mask)
                for i in range(n_bands)
            ])
        ).alias("band_id", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, scope + ["band_id", "band_val"])
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            *scope,
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
