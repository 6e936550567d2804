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
interval). Degenerate long intervals (span >> bucket) fan out linearly —
split those into a coarse-bucket pass, or cap with `max_buckets` and route
the overflow through a broadcast pass (they are few by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _with_bucket_bounds(df: DataFrame, start: str, end: str, bucket_us: int) -> DataFrame:
    return df.withColumns(
        {
            "_b_start": F.expr(f"unix_micros({start}) div {bucket_us}"),
            "_b_end": F.expr(f"unix_micros({end}) div {bucket_us}"),
        }
    )


def interval_overlap_self_join(
    df: DataFrame,
    id_col: str,
    start: str = "start",
    end: str = "end",
    bucket_us: int = 3_600_000_000,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All unordered pairs of rows whose [start, end] intervals overlap
    (inclusive endpoints), optionally also required to agree on `block_cols`.
    Output: a.*/b.* id + bounds (suffixed _a/_b) and `overlap_us`, the exact
    integer overlap duration (microseconds; 0 for touching endpoints).

    Pairs are ordered (id_a < id_b) and emitted exactly once via the
    max-start-bucket ownership rule — no global distinct."""
    blocks = list(block_cols or [])
    b = _with_bucket_bounds(df, start, end, bucket_us).withColumn(
        "_bucket", F.explode(F.sequence("_b_start", "_b_end"))
    )
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
    return (
        j.filter((F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & overlap & owner)
        .withColumn("overlap_us", overlap_us)
        .drop("_bucket", "_b_start_a", "_b_start_b")
    )
