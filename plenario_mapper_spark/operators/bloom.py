"""Bloom-filter semi-join pre-filter: scan-stage fact reduction from a dim key set.

The 100 TB problem this solves: a selective dimension filter (thousands of keys)
against a fact table (billions of rows) plans as a shuffle join — the entire fact
table shuffles to learn that 80% of its rows match nothing. Spark's own runtime
row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects a
bloom probe into the fact scan for exactly this reason, but only when join stats
line up. This operator makes the pattern explicit and composable: build a bloom
filter from the dim keys (one distributed aggregate, ~m/64 longs back to the
driver — bounded by the CONSTANT filter width, not by data), then probe the fact
side with pure Column expressions inside the scan stage — no shuffle, no join, no
Python, whole-stage-codegen-friendly. Rows that fail the probe never leave the
scan; the residual exact join (if any) runs over the tiny survivor set.

Guarantees (standard Bloom): NO false negatives — every true match passes the
probe; false positives bounded by (1 - e^(-k*n/m))^k. `sized_bits` picks m ≈ 16
bits/key (fp ≈ 1.4e-3 at k=5), the same sizing regime as Spark's built-in
runtime filter defaults.

Determinism: xxhash64 is a fixed published algorithm, so the filter — and the
exact survivor SET — is identical across partitionings, cluster sizes, and
re-runs. Arithmetic is ANSI-overflow-safe: both hashes are reduced mod m before
the double-hashing combine (h1 + j*h2 < (k+1)*m << 2^63).

No reference counterpart (the reference joins row-at-a-time in JS,
app/mapper.js:114-130 does per-record map lookups); this is part of the [ext]
scale family (SURVEY §2.H).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_K = 5
_MIN_BITS = 1 << 13  # 8 Kbit floor: tiny filters stay well-conditioned
_MAX_BITS = 1 << 22  # 4 Mbit cap: 64k-long literal (~512 KB) in the plan


def sized_bits(n_keys: int) -> int:
    """Power-of-two filter width targeting ~16 bits per key (fp ~1.4e-3 at
    k=5), clamped to [8 Kbit, 4 Mbit]. Power-of-two so pmod compiles to a
    cheap mask-equivalent and the word table is a fixed dense array."""
    m = _MIN_BITS
    while m < 16 * max(n_keys, 1) and m < _MAX_BITS:
        m <<= 1
    return m


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions via Kirsch–Mitzenmacher double hashing: both base
    hashes reduced mod m FIRST so the combine never overflows a long under
    ANSI arithmetic; h2 forced ODD (2*pmod(h, m/2) + 1 ∈ [1, m-1]) so it is
    coprime to the power-of-two m and the k probe positions are guaranteed
    distinct — a merely-nonzero h2 that shares a power of two with m (e.g.
    m/2) collapses the probes to fewer than k distinct bits, making the
    (1-e^(-kn/m))^k false-positive bound slightly optimistic (ADVICE r7).
    No-false-negatives is unaffected either way (build and probe share
    these positions). The coprimality argument NEEDS a power-of-two m —
    callers bypassing sized_bits with an arbitrary width would silently
    void the distinctness/FP bound, so it is a hard ValueError — an assert
    is stripped under `python -O`, silently voiding the invariant, and
    m_bits=1 would pass it while making h2's modulus zero (ADVICE r8+r9)."""
    if m_bits < 2 or m_bits & (m_bits - 1) != 0:
        raise ValueError(
            f"m_bits must be a power of two >= 2 (got {m_bits}): h2's oddness "
            f"only guarantees distinct probes against a power-of-two modulus, "
            f"and m_bits=1 makes h2's modulus m_bits//2 == 0"
        )
    h1 = F.pmod(F.xxhash64(key, F.lit(0x5BF0)), F.lit(m_bits))
    h2 = F.lit(2) * F.pmod(F.xxhash64(key, F.lit(0x1337)), F.lit(m_bits // 2)) + F.lit(1)
    return [F.pmod(h1 + F.lit(j) * h2, F.lit(m_bits)) for j in range(k)]


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int, k: int = DEFAULT_K
) -> list[int]:
    """Distributed build: explode each key to its k positions, OR the bit
    masks per 64-bit word (map-side partial bit_or, one tiny shuffle on the
    word index), and collect the <= m/64 non-zero words. The collect is
    bounded by the constant filter width — metadata-sized, like Spark's own
    runtime-filter build — never by the key count."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = [0] * (m_bits >> 6)
    for r in words:
        arr[r["word"]] = r["bits"]
    return arr


def might_contain(
    key: Column, words: list[int], m_bits: int, k: int = DEFAULT_K
) -> Column:
    """Pure-expression probe: true iff all k bits are set. The word table is a
    SINGLE array<long> literal (one Literal node, not m/64 expression nodes),
    so the probe lives inside the fact table's scan stage under whole-stage
    codegen. NULL keys probe to NULL, matching SQL join semantics (xxhash64
    would otherwise hash a NULL as the bare seed and yield a spurious
    boolean, so the gate is explicit)."""
    lit_words = F.lit(words)
    checks = [
        F.getbit(
            F.element_at(lit_words, (F.shiftright(p, 6) + F.lit(1)).cast("int")),
            F.pmod(p, 64).cast("int"),
        )
        == F.lit(1)
        for p in _positions(key, m_bits, k)
    ]
    hit = reduce(lambda a, b: a & b, checks)
    return F.when(key.isNull(), F.lit(None).cast("boolean")).otherwise(hit)


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    k: int = DEFAULT_K,
    m_bits: int | None = None,
) -> DataFrame:
    """The production composition: size the filter from the exact key count
    (one cheap dim aggregate — the same stats pass Spark's runtime filter
    does), build, and return the fact rows passing the probe. Possible false
    positives remain (callers needing exactness follow with the now-cheap
    exact join over the survivors); no true match is ever dropped."""
    n = keys.count()
    m = m_bits or sized_bits(n)
    words = build_bloom(keys, key_col, m, k)
    return fact.filter(might_contain(F.col(fact_key), words, m, k))
