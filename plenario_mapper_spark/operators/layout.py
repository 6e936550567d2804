"""Z-order (Morton-curve) layout for multi-dimensional data skipping.

Parquet scans prune row groups and files from min/max column statistics, but
stats are only selective for columns the data is SORTED by: a table sorted by
x skips nothing for a predicate on y. Interleaving the bits of several columns
into one Morton key and sorting by it gives every interleaved column
locality — each file/row group covers a small hyper-rectangle of the key
space, so min/max stats prune scans for box predicates on ANY of the columns
(the Delta/Iceberg OPTIMIZE ZORDER feature, built here from stock Spark
expressions + repartitionByRange).

Everything is JVM expressions (shift/mask/or — whole-stage codegen), one
range shuffle on the Morton key, and a per-partition sort: exactly the cost
of any global sort-by-one-column rewrite, but buying skipping on k columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton key of non-negative integer columns: bit b of column j lands at
    position b * len(cols) + j. `bits * len(cols)` must fit a signed long
    (<= 62); inputs are masked to `bits` so an out-of-range value cannot
    corrupt neighbors' bit lanes. Pure expression — codegen, no UDF."""
    n = len(cols)
    if n == 0:
        raise ValueError("interleave_bits needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed long")
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + j
        )
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_scale(col: Column, lo, hi, bits: int) -> Column:
    """Min-max scale a numeric column onto the [0, 2^bits) integer lattice
    (clamped, NULL -> 0 so null rows cluster at the curve origin instead of
    poisoning the sort). Layout only — never used for query semantics, so
    float rounding here is harmless."""
    span = (hi - lo) or 1
    cells = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(float(span)) * cells
    )
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)), F.lit(0)
    ).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Rewrite df z-ordered by `cols`: one stats pass (per-column min/max —
    an O(1)-row action), scale each column onto the bit lattice, range-
    partition + locally sort by the Morton key, drop it, write parquet. File
    and row-group min/max stats over the original columns then prune box
    predicates on any of `cols`. At 100 TB this is the same cost as any
    global sort rewrite (one range exchange with skew-balanced sampled
    bounds); run it from the compaction schedule, not per query."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    # empty input or an all-NULL column yields NULL stats: degrade that
    # column's lane to the constant 0 cell (same place zorder_scale sends
    # NULL rows) instead of crashing a scheduled rewrite on a just-truncated
    # or degenerate dataset.
    bounds = [
        (stats[f"_lo_{c}"], stats[f"_hi_{c}"]) for c in cols
    ]
    bounds = [(0, 0) if lo is None or hi is None else (lo, hi) for lo, hi in bounds]
    z = interleave_bits(
        [
            zorder_scale(F.col(c), lo, hi, bits)
            for c, (lo, hi) in zip(cols, bounds)
        ],
        bits,
    )
    out = df.withColumn("_z", z)
    parted = (
        out.repartitionByRange(num_files, "_z")
        if num_files
        else out.repartitionByRange("_z")
    )
    parted.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
