"""Interval-overlap join via epoch-bucket blocking.

`[start_a, end_a] overlaps [start_b, end_b]` has no equi-key, so a naive plan
is a nested-loop cross join — quadratic, the same cliff as all-pairs dedup.
The scalable form blocks on TIME BUCKETS: every interval explodes to the
epoch buckets it covers, candidates join on the bucket equi-key (+ any
partition attributes), and the exact predicate filters candidates. Each
overlapping pair is emitted EXACTLY once without a distinct: the pair is kept
only in the bucket of `max(start_a, start_b)` — the later start lies inside
both intervals whenever they overlap, so that bucket is always shared, and it
is unique by construction.

Cost model at 100 TB: the shuffle carries (interval x covered-buckets) rows,
so choose `bucket` near the TYPICAL interval length (a few buckets per
interval). Degenerate long intervals (span >> bucket, e.g. one corrupted
far-future end timestamp) would fan out unboundedly — and Spark's `sequence`
hard-errors past its element limit. Pass `max_buckets` to route such rows
through a broadcast pass instead: intervals covering more than `max_buckets`
buckets never explode; they join against everything by the exact predicate
with the long side broadcast (they are few by definition — if they are not,
the bucket size is wrong, not the cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _with_bucket_bounds(df: DataFrame, start: str, end: str, bucket_us: int) -> DataFrame:
    # FLOOR division in exact integer arithmetic: (x - pmod(x, b)) div b.
    # Spark's bare `div` truncates toward zero, which disagrees with floor
    # (and with DuckDB's `//`) for pre-1970 (negative-epoch) timestamps.
    def fdiv(col: str) -> F.Column:
        x = f"unix_micros({col})"
        return F.expr(f"({x} - pmod({x}, {bucket_us})) div {bucket_us}")

    return df.withColumns({"_b_start": fdiv(start), "_b_end": fdiv(end)})


def interval_overlap_self_join(
    df: DataFrame,
    id_col: str,
    start: str = "start",
    end: str = "end",
    bucket_us: int = 3_600_000_000,
    block_cols: list[str] | None = None,
    max_buckets: int | None = None,
) -> DataFrame:
    """All unordered pairs of rows whose [start, end] intervals overlap
    (inclusive endpoints), optionally also required to agree on `block_cols`.
    Output: a.*/b.* id + bounds (suffixed _a/_b) and `overlap_us`, the exact
    integer overlap duration (microseconds; 0 for touching endpoints).

    Pairs are ordered (id_a < id_b) and emitted exactly once via the
    max-start-bucket ownership rule — no global distinct. With `max_buckets`
    set, intervals spanning more buckets than that are excluded from the
    explode and handled in a separate broadcast pass (see module docstring);
    the union is still exactly-once: bucket-pass pairs are normal x normal,
    broadcast-pass pairs have >=1 long side, and within the broadcast pass
    each unordered pair survives exactly one of its two orientations."""
    blocks = list(block_cols or [])
    bounded = _with_bucket_bounds(df, start, end, bucket_us)
    if max_buckets is not None:
        if max_buckets < 1:
            raise ValueError("max_buckets must be >= 1")
        span_ok = (F.col("_b_end") - F.col("_b_start")) < F.lit(max_buckets)
        normal, overflow = bounded.filter(span_ok), bounded.filter(~span_ok)
    else:
        normal, overflow = bounded, None

    b = normal.withColumn("_bucket", F.explode(F.sequence("_b_start", "_b_end")))
    keep = [id_col, start, end, "_b_start", "_bucket", *blocks]
    left = b.select(
        *[F.col(c).alias(f"{c}_a" if c not in ("_bucket", *blocks) else c) for c in keep]
    )
    right = b.select(
        *[F.col(c).alias(f"{c}_b" if c not in ("_bucket", *blocks) else c) for c in keep]
    )
    j = left.join(right, ["_bucket", *blocks])
    overlap = (F.col(f"{start}_a") <= F.col(f"{end}_b")) & (
        F.col(f"{start}_b") <= F.col(f"{end}_a")
    )
    owner = F.col("_bucket") == F.greatest("_b_start_a", "_b_start_b")
    overlap_us = F.least(
        F.expr(f"unix_micros({end}_a)"), F.expr(f"unix_micros({end}_b)")
    ) - F.greatest(
        F.expr(f"unix_micros({start}_a)"), F.expr(f"unix_micros({start}_b)")
    )
    out_cols = [
        f"{id_col}_a", f"{start}_a", f"{end}_a",
        f"{id_col}_b", f"{start}_b", f"{end}_b",
        *blocks, "overlap_us",
    ]
    bucketed = (
        j.filter((F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & overlap & owner)
        .withColumn("overlap_us", overlap_us)
        .select(*out_cols)
    )
    if overflow is None:
        return bucketed

    # Broadcast pass: long intervals vs EVERYTHING (long and normal alike).
    # Orientation rule for exactly-once: a pair with one long side is emitted
    # from the long row's orientation only (long is always side _a' of the
    # join, then columns are swapped into id order); a long-long pair appears
    # in both orientations and the id_a < id_b filter keeps one.
    flat = [id_col, start, end, *blocks, "_b_start", "_b_end"]
    o = overflow.select(*[F.col(c).alias(f"_o_{c}") for c in flat])
    full = bounded.select(*flat)
    cond = F.lit(True)
    for c in blocks:
        cond = cond & (F.col(f"_o_{c}") == F.col(c))
    o_overlap = (F.col(f"_o_{start}") <= F.col(end)) & (
        F.col(start) <= F.col(f"_o_{end}")
    )
    other_is_long = (F.col("_b_end") - F.col("_b_start")) >= F.lit(max_buckets)
    pair_once = (~other_is_long) | (F.col(f"_o_{id_col}") < F.col(id_col))
    cross = (
        F.broadcast(o)
        .join(full, cond & o_overlap & (F.col(f"_o_{id_col}") != F.col(id_col)) & pair_once)
    )
    # normalize so _a holds the smaller id, matching the bucket pass contract
    a_first = F.col(f"_o_{id_col}") < F.col(id_col)

    def pick(o_col: str, n_col: str, want_a: bool) -> F.Column:
        if want_a:
            return F.when(a_first, F.col(o_col)).otherwise(F.col(n_col))
        return F.when(a_first, F.col(n_col)).otherwise(F.col(o_col))

    o_us = F.least(
        F.expr(f"unix_micros(_o_{end})"), F.expr(f"unix_micros({end})")
    ) - F.greatest(
        F.expr(f"unix_micros(_o_{start})"), F.expr(f"unix_micros({start})")
    )
    routed = cross.select(
        pick(f"_o_{id_col}", id_col, True).alias(f"{id_col}_a"),
        pick(f"_o_{start}", start, True).alias(f"{start}_a"),
        pick(f"_o_{end}", end, True).alias(f"{end}_a"),
        pick(f"_o_{id_col}", id_col, False).alias(f"{id_col}_b"),
        pick(f"_o_{start}", start, False).alias(f"{start}_b"),
        pick(f"_o_{end}", end, False).alias(f"{end}_b"),
        *[F.col(c) for c in blocks],
        o_us.alias("overlap_us"),
    )
    return bucketed.unionByName(routed)
