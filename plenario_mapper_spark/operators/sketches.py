"""KMV (k-minimum-values) distinct sketches for set-operation estimation.

Completes the sketch family — HLL (cardinality, q_agg_hll_rollup), Misra–Gries
(frequency, operators/frequency), GK (rank, q_agg_approx_percentile) — with the
fourth classic: SET OPERATIONS over distinct keys (union size, Jaccard,
intersection size) from constant-size samples. Two audiences/corpora whose raw
key sets are billions of rows each compare in O(k) after one pass per side —
the audience-overlap / corpus-overlap question a data-mixing decision asks.

Algorithm (Beyer et al., SIGMOD'07 / the theta-sketch family): hash every key
uniformly into [0, 2^48); keep the k smallest DISTINCT hash values. With tau =
the k-th smallest, |S| ~= (k-1) * 2^48 / tau (unbiased); if fewer than k
distinct hashes exist the sketch IS the set and estimates are exact. Sketches
compose: the k smallest of (sketch_A ∪ sketch_B) is exactly the KMV sketch of
A ∪ B, and the fraction of those present in both sketches estimates Jaccard.

Determinism: the hash is md5-based (the repo's sampling-gate discipline,
operators/sampling.py) so an external system — or the DuckDB oracle — can
reproduce the sketch, and therefore the ESTIMATES, bit for bit. Estimates are
ratios of exact integers: full value parity, not just certification bits.
48-bit hash values so both engines hold them exactly in a BIGINT (and a
DOUBLE's 53-bit mantissa never rounds one).

100 TB shape: per-partition k-smallest-distinct fold inside Arrow-batched
mapInPandas (bounded at k + one batch's distincts; the Misra–Gries pattern,
operators/frequency.py), then distinct + TakeOrdered over <= k * partitions
hashes — the raw key stream is never shuffled, which is the point: an exact
distinct-intersection shuffles both domains.

No reference counterpart (SURVEY §2.D "[absent]" extension surface).
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

KMV_DOMAIN = 1 << 48  # hash range; 12 hex digits of md5, exact in BIGINT/DOUBLE


def kmv_hash(key: Column, salt: str) -> Column:
    """Uniform 48-bit integer from md5(salt|key) — the engine-independent
    mirror is CAST(('0x' || substr(md5(salt || '|' || key), 1, 12)) AS BIGINT).
    NULL keys hash the explicit '<null>' sentinel (sampling._hash_u32's rule).
    """
    canon = F.coalesce(key.cast("string"), F.lit("<null>"))
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), canon)), 1, 12), 16, 10
    ).cast("long")


def kmv_sketch(df: DataFrame, key_col: str, k: int, salt: str = "kmv0") -> DataFrame:
    """The k smallest distinct hash values of df[key_col], as a one-column
    relation `h` (<= k rows — constant-size by construction).

    Local fold first: each partition keeps its k smallest distinct hashes in a
    bounded set (never more than k + one Arrow batch's distincts in memory),
    so the global distinct + TakeOrdered runs over <= k * partitions hashes,
    never the raw key stream."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = df.select(kmv_hash(F.col(key_col), salt).alias("h"))

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keep: set = set()
        for pdf in batches:
            keep.update(int(v) for v in pdf["h"].unique())
            if len(keep) > k:
                keep = set(heapq.nsmallest(k, keep))
        yield pd.DataFrame({"h": sorted(keep)})

    return hashed.mapInPandas(prune, "h long").distinct().orderBy("h").limit(k)


def kmv_union(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """KMV sketch of A ∪ B: the k smallest of the two sketches' union — exact
    by the KMV composition property (both inputs cover everything below their
    own tau)."""
    return sketch_a.union(sketch_b).distinct().orderBy("h").limit(k)


def kmv_estimate(tau: Column, m: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch's k-th minimum `tau` and actual
    size `m`: exact when the sketch is the whole set (m < k), else the
    (k-1)/tau unbiased estimator scaled to the hash domain. (k-1)*2^48 stays
    exactly representable in a double (small mantissa, power-of-two factor),
    so the division is one correctly-rounded IEEE op both engines replicate.
    """
    return F.when(m < k, m.cast("double")).otherwise(
        F.lit(float((k - 1) * KMV_DOMAIN)) / tau.cast("double")
    )


def kmv_overlap_stats(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """One-row overlap estimates from two composable sketches: (tau, m, rho,
    est_union, est_jaccard, est_intersect). rho/m estimates Jaccard (the
    fraction of the union sketch present in both sides — exact when m < k);
    est_intersect = est_jaccard * est_union. All sketch joins are <= k-row
    broadcasts; the raw sets are never touched."""
    st = (
        kmv_union(sketch_a, sketch_b, k)
        .join(sketch_a.withColumn("in_a", F.lit(1)), "h", "left")
        .join(sketch_b.withColumn("in_b", F.lit(1)), "h", "left")
        .agg(
            F.max("h").alias("tau"),
            F.count("*").cast("long").alias("m"),
            F.count(
                F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)
            )
            .cast("long")
            .alias("rho"),
        )
    )
    est_union = kmv_estimate(F.col("tau"), F.col("m"), k)
    est_j = F.col("rho").cast("double") / F.col("m").cast("double")
    return st.select(
        "tau",
        "m",
        "rho",
        est_union.alias("est_union"),
        est_j.alias("est_jaccard"),
        (est_j * est_union).alias("est_intersect"),
    )


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J.Alg'05): point-frequency
# estimates with a ONE-SIDED error — est >= true always (a theorem, not a
# tendency: every occurrence of a key lands in all d of its cells), and the
# overcount is bounded by (e/w)·N with probability 1−e^−d. The directional
# complement to Misra–Gries (operators/frequency.py), whose estimates only
# UNDERcount: together they bracket the true frequency from both sides.
#
# 100 TB shape: the token stream first collapses map-side to its VOCAB
# domain (token, count); the d-way explode runs over vocab rows, never the
# corpus, and the sketch itself is a CONSTANT d×w cell table (KBs) that
# broadcasts to any probe. Determinism: md5 row hashes (the KMV/sampling
# discipline) so the DuckDB oracle reproduces cells, estimates, and
# overcounts bit for bit — full value parity, not certification-only.
# --------------------------------------------------------------------------


def cm_cell(key: Column, row: int, width: int) -> Column:
    """Row `row`'s cell index for `key`: first 8 md5 hex digits mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cm{row}|"), key)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cm_build(weighted_keys: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Sketch (j, cell, total) from a (key, c) weighted-domain table —
    callers pass the map-side-combined histogram, not raw rows."""
    entries = weighted_keys.select(
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cm_cell(F.col("key"), j, width).alias("cell")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e"),
    ).select("c", F.col("e.j").alias("j"), F.col("e.cell").alias("cell"))
    return entries.groupBy("j", "cell").agg(F.sum("c").cast("long").alias("total"))


def cm_estimate(
    queries: DataFrame, sketch: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """min-over-rows point estimates for a (key,) query table: joins the
    constant-size sketch (broadcastable by construction) on (j, cell)."""
    probes = queries.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cm_cell(F.col("key"), j, width).alias("cell")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e"),
    ).select("key", F.col("e.j").alias("j"), F.col("e.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("key")
        .agg(F.min("total").cast("long").alias("cm_est"))
    )
