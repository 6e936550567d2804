"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union-tag/last-value composition (public, classic pattern —
the same shape Flink's temporal join and pandas merge_asof describe): tag both
sides, union them, sort within each key group by time, and carry the most recent
right-side row forward with last(..., ignorenulls) over an unbounded-preceding
window. Left rows then read their match off the carried column.

Scale shape: ONE shuffle on the `by` keys (the window partition) — same cost as
any co-partitioned join — no range explosion, no per-key driver loop, no UDF.
Skewed keys are handled by AQE only at the join; for pathological single-key
skew, salt the key and as-of join per salt bucket (the match is per-key so
salting by time range is required — out of scope here).

The reference has no as-of join (SURVEY §2.C [absent] row); this is part of the
declared engine surface, oracle-checked against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks the latest right row with
    right_ts <= left_ts within the same `by` group (inclusive, like DuckDB
    `ASOF JOIN ... ON l.ts >= r.ts`). Unmatched left rows keep NULLs.

    right_cols are projected from the matched right row, renamed with `suffix`
    if they collide with a left column. `tolerance_seconds` drops matches older
    than the given horizon (pandas merge_asof semantics).
    """
    l_tagged = left.withColumn("_asof_t", F.col(left_ts)).withColumn(
        "_is_left", F.lit(True)
    )
    r_payload = F.struct(
        F.col(right_ts).alias("_matched_ts"), *[F.col(c) for c in right_cols]
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("_asof_t"),
        F.lit(False).alias("_is_left"),
        r_payload.alias("_asof_r"),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # At equal timestamps the right row must sort BEFORE the left row so the
    # inclusive match sees it: False < True orders right first.
    w = (
        Window.partitionBy(*by)
        .orderBy("_asof_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn(
        "_asof_r", F.last("_asof_r", ignorenulls=True).over(w)
    ).filter(F.col("_is_left"))

    if tolerance_seconds is not None:
        in_tol = (
            F.col("_asof_t").cast("double")
            - F.col("_asof_r._matched_ts").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.withColumn(
            "_asof_r", F.when(in_tol, F.col("_asof_r"))
        )

    left_names = set(left.columns)
    out_cols = [F.col(c) for c in left.columns]
    for c in right_cols:
        out_name = f"{c}{suffix}" if c in left_names else c
        out_cols.append(F.col(f"_asof_r.{c}").alias(out_name))
    return carried.select(*out_cols)
