"""Deduplication operator family for training-data pipelines at 100 TB scale.

Five strategies, all shuffle-disciplined and UDF-free (every hash/signature is a JVM
expression, so signatures compute inside the scan stage):

- exact:        hash-groupBy on content (or selected columns);
- fingerprint:  canonical-token rolling hash (layout-insensitive exact dedup);
- MinHash+LSH:  shingle -> k permuted min-hashes -> banded buckets -> candidate
                join -> exact-Jaccard verify. The self-join shuffles only on
                (band, band_hash) — candidates, never the full cross product;
- SimHash:      64-bit sign-aggregated token hashes; banded (4x16-bit) candidate
                join + Hamming verify;
- embedding:    cosine near-dup via random-hyperplane buckets (see similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from plenario_mapper_spark.functions import text as TX

# Mersenne prime 2^31-1 for the affine permutations (classic MinHash
# construction h_i(x) = (a_i * x + b_i) mod p). 31-bit domain keeps a*h < 2^62,
# inside signed-64 range — Spark 4 runs ANSI mode, where silent wraparound is an
# ARITHMETIC_OVERFLOW error.
_MERSENNE = (1 << 31) - 1


def _perm_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact deduplication: distinct over the given columns (hash agg — partial
    dedup map-side, one shuffle on the content hash)."""
    return df.select(*cols).distinct() if cols else df.distinct()


def fingerprint_dedup_keep_first(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Keep the lowest-id row per canonical-token fingerprint — deterministic
    exact dedup that ignores whitespace/punctuation layout."""
    fp = TX.fingerprint(F.col(text_col)).alias("fp")
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


def minhash_signature(
    text: Column, num_hashes: int = 64, shingle_n: int = 3, seed: int = 42
) -> Column:
    """MinHash signature as an array<long>, fully JVM-side.

    Shingle hashes are computed ONCE (xxhash64); then ONE fold over them carries
    a num_hashes-wide running-min vector, with zip_with applying every affine
    permutation h_i = (a_i*h + b_i) mod p per step. Same O(shingles x num_hashes)
    arithmetic as the naive form but a single array traversal and a compact
    expression tree — the 64-separate-array_min version was ~40x slower (each
    permutation re-walked the array through interpreted HOF nodes)."""
    sh = TX.shingles(text, shingle_n)
    hashes = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    coeffs = _perm_coeffs(num_hashes, seed)
    ab = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in coeffs
        ]
    )
    init = F.array(*[F.lit(_MERSENNE).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, c: F.least(m, F.pmod(h * c["a"] + c["b"], F.lit(_MERSENNE)))
        ),
    )


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Banded LSH keys: array of (band_idx, band_hash) structs."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice(sig, b * rows_per_band + 1, rows_per_band).cast("string")).alias(
                    "bh"
                ),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.

    Scale shape: signatures/bands are narrow per-row work in the scan stage; the
    only shuffle is the candidate self-join keyed (band, band_hash); the exact
    verify runs ONLY on candidates. Band/row choice (16x4 at 64 hashes) targets
    the s-curve knee near J≈0.7. Skew guard: a degenerate band bucket (e.g. empty
    docs) would quadratically blow up — AQE skew-join splitting handles it.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        TX.shingles(F.col(text_col), shingle_n).alias("sh"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    )
    banded = sig.select(
        "id", "sh", F.explode(minhash_bands(F.col("sig"), bands, rows_per_band)).alias("bk")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.bk") == F.col("r.bk")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs — the brute-force baseline that verifies the
    MinHash path (and the DuckDB-oracle-able variant). Quadratic: use only on
    bounded subsets; the LSH path is the 100 TB route."""
    s = df.select(
        F.col(id_col).alias("id"), TX.shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("j"),
        )
        .filter(F.col("j") >= threshold)
        .select("id_a", "id_b", F.round("j", 6).alias("jaccard"))
    )


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash: sign-aggregate token hashes into a `bits`-wide fingerprint (long).

    bit_i(doc) = sign( sum_tokens (2*bit_i(xxhash64(token)) - 1) ). Single fold
    over the token array carrying a `bits`-wide vote vector (zip_with update) --
    one array traversal total, not one per bit; all JVM ops, no UDF. Packing is
    two's complement (bit 63 contributes -2^63) so the result stays a plain
    signed long under ANSI arithmetic."""
    toks = TX.tokens(text)
    h = F.transform(toks, lambda t: F.xxhash64(t))
    idx = F.array(*[F.lit(i) for i in range(bits)])
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(bits)])
    votes = F.aggregate(
        h,
        zeros,
        lambda acc, x: F.zip_with(
            acc, idx, lambda a, i: a + (F.getbit(x, i).cast("long") * 2 - 1)
        ),
    )
    powers = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(bits)]
    )
    signed = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(signed, F.lit(0).cast("long"), lambda a, x: a + x)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dups: 4x16-bit band join (pigeonhole: hamming<=3 implies at
    least one of 4 bands identical), then exact Hamming verify on candidates."""
    s = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    banded = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.bk") == F.col("r.bk")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
