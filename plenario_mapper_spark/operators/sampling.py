"""Deterministic sampling operators for training-data pipelines.

Spark's `df.sample()` / `sampleBy()` are seeded per-partition, so the selected
row SET changes with partitioning — a repartition (or a cluster resize at
100 TB) silently changes the sample. Training-data curation wants the opposite:
membership decided by a pure function of the ROW, so the sample is stable
across re-runs, re-partitions, and incremental appends, and any two pipelines
(or engines) agree on it. That is what these hash-gate operators provide; it is
also what makes them oracle-checkable in DuckDB bit-for-bit (md5 is md5
everywhere, and the gate compares INTEGERS, never floats).

The reference has no sampling surface (it forwards every record); this is part
of the [ext] training-data family (SURVEY §2.H).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from plenario_mapper_spark.functions import parity as PAR

# 32-bit hash domain: thresholds are exact integers, so the gate has no
# floating-point boundary to disagree on.
_DOMAIN_BITS = 32


def _hash_u32(key: Column, salt: str) -> Column:
    """Uniform 32-bit integer from md5(salt|key). md5 (not xxhash64) so an
    external system — or the DuckDB oracle — reproduces membership exactly.

    NULL keys hash the explicit sentinel '<null>' (all null-keyed rows land
    together, deterministically). Without the coalesce, concat_ws silently
    drops the null, Spark hashes md5(salt) alone, and the documented SQL
    mirror `md5(salt || '|' || CAST(key AS VARCHAR))` — which is NULL —
    disagrees. The engine-independent mirror for nullable keys is
    `md5(salt || '|' || COALESCE(CAST(key AS VARCHAR), '<null>'))`."""
    canon = F.coalesce(key.cast("string"), F.lit("<null>"))
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), canon)), 1, 8),
        16,
        10,
    ).cast("long")


def threshold_for(fraction: float) -> int:
    """Integer gate threshold for a fraction in [0, 1]."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return int(round(fraction * (1 << _DOMAIN_BITS)))


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep each row iff hash(salt|key) falls below fraction of the hash domain.
    Narrow (no shuffle), pushdown-friendly (one projection + filter), and
    content-addressed: the same keys survive no matter how the data is split."""
    return df.filter(_hash_u32(F.col(key_col), salt) < F.lit(threshold_for(fraction)))


def deterministic_stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum hash-gate sampling (e.g. downsample the dominant language of
    a corpus). `fractions` maps stratum value -> keep fraction; unlisted strata
    keep `default_fraction`. The threshold lookup is a literal CASE chain —
    strata sets are small (languages, sources, buckets), so this stays a single
    narrow JVM-side filter with no join and no shuffle, and at 100 TB it
    prunes rows AT THE SCAN (predicate on a scanned column + cheap hash)."""
    thr: Column = F.lit(threshold_for(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(threshold_for(frac))
        ).otherwise(thr)
    return df.filter(_hash_u32(F.col(key_col), salt) < thr)


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer gate bounds for named splits (must sum to 1.0 within
    rounding; the final split absorbs the full remaining domain so every row
    lands in exactly one split)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bounds, cum = [], 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        bounds.append((name, threshold_for(cum)))
    bounds.append((names[-1], 1 << _DOMAIN_BITS))
    return bounds


def deterministic_split(
    df: DataFrame, key_col: str, splits: dict[str, float], salt: str = "s0"
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test and friends)
    by cumulative hash-gate bands — the split a training pipeline must be able
    to reproduce forever: membership is a pure function of (salt, key), so the
    assignment survives repartitioning, appends (old rows never migrate), and
    re-runs on any engine. Adds a `split` column; single narrow projection,
    no shuffle, no state."""
    h = _hash_u32(F.col(key_col), salt)
    bounds = split_thresholds(splits)
    expr = F.when(h < F.lit(bounds[0][1]), F.lit(bounds[0][0]))
    for name, bound in bounds[1:-1]:
        expr = expr.when(h < F.lit(bound), F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(bounds[-1][0])))


def weighted_resample(
    df: DataFrame, key_col: str, weight_col: str, salt: str = "w0"
) -> DataFrame:
    """Deterministic weighted UP/DOWN-sampling: each row emits
    floor(w) + (u < frac(w)) copies, where w is the row's weight (>= 0,
    may exceed 1 — upsampling repeats rows) and u is the md5 hash gate.
    In expectation every row contributes exactly w copies; realized counts
    are a pure function of (salt, key), so the resampled corpus is stable
    under repartitioning and appends and reproducible by any engine (the
    fractional gate threshold is floor(frac(w) * 2^32) — explicit FLOOR,
    because a bare double->int CAST truncates in Spark but rounds in
    DuckDB). Output adds copy_idx (1..n_copies): downstream shuffles spread
    repeated keys, and the pair (key, copy_idx) stays unique. This is the
    APPLY step for mixture weighting (q_doc_mixture_weights produces w;
    this executes the resample)."""
    w = F.col(weight_col)
    frac = w - F.floor(w)
    gate = _hash_u32(F.col(key_col), salt) < F.floor(
        frac * F.lit(float(1 << _DOMAIN_BITS))
    ).cast("long")
    n_copies = (F.floor(w).cast("long") + F.when(gate, 1).otherwise(0)).alias(
        "n_copies"
    )
    out = df.withColumn("n_copies", n_copies).filter(F.col("n_copies") > 0)
    return out.withColumn(
        "copy_idx", F.explode(F.sequence(F.lit(1), F.col("n_copies")))
    ).drop("n_copies")


def deterministic_group_sample(
    df: DataFrame, key_col: str, group_col: str, k: int, salt: str = "g0"
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically — the
    fixed-budget variant of stratified sampling (hash-gate fractions cannot
    promise exact counts). Selection order is the md5 hash of the row key
    (uniform, key-pure), tie-broken by the key itself, so the chosen SET is a
    pure function of (salt, group membership): stable under repartitioning,
    and append-monotone in the reservoir sense (a new row displaces the
    current max-hash pick iff it hashes lower — exactly classic reservoir
    sampling with hash(key) as the priority, made deterministic).

    One shuffle on the group key feeding a rank-truncate window; at 100 TB
    group skew is the hazard — for pathological groups, pre-filter with a
    coarse hash gate (keep fraction >> k/|group|) so the window sees a
    bounded slice, same final set."""
    from pyspark.sql import Window

    h = _hash_u32(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "aes0",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, fixed budget k —
    Efraimidis–Spirakis A-ES with the hash gate as the randomness source:
    each row gets u = (hash_u32 + 0.5) / 2^32 (exact in a double: 33
    significant bits) and priority -ln(u)/w; the k SMALLEST priorities win,
    which selects each row with probability proportional to its weight. The
    missing member of the family: `deterministic_sample` keeps a fraction,
    `deterministic_group_sample` keeps k uniformly — this keeps k
    weight-proportionally (e.g. a quality-weighted corpus subset for
    training), still as a pure function of (salt, membership, weights):
    repartition-stable and engine-reproducible.

    Cross-engine parity: u is bit-identical by construction; ln is the one
    libm call that may differ in the last ulp, so ranking happens on the
    12-ROUNDED priority with the key as tie-break — the round-then-rank
    discipline (cf. the ANN top-k certification) that makes membership
    exactly decidable on both engines (a 1-ulp ln divergence is ~1e-21 at
    these magnitudes, ten orders under the 0.5e-12 grid; 6 digits would put
    the grid at the same order as the priorities themselves and quantize the
    weighting away). The priority column `aes_priority` stays in the output
    as the audit trail — consumers feeding a 6-rounding comparator should
    re-round it.

    Rows with NULL or non-positive weight are excluded (they have no defined
    inclusion probability). Global form is sort+limit — TakeOrdered, i.e.
    per-partition top-k then a k-row merge, no single-reducer window; the
    grouped form is the usual group-keyed rank-truncate (one shuffle)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (_hash_u32(F.col(key_col), salt).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << _DOMAIN_BITS)
    )
    w = F.col(weight_col).cast("double")
    pri = PAR.round_at(-F.log(u) / w, 12)
    out = df.filter(w.isNotNull() & (w > 0)).withColumn("aes_priority", pri)
    if group_col is None:
        return out.orderBy(F.col("aes_priority").asc(), F.col(key_col).asc()).limit(k)
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy(
        F.col("aes_priority").asc(), F.col(key_col).asc()
    )
    return (
        out.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )
