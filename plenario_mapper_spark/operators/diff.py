"""Snapshot diff / reconciliation: what changed between two versions of a table.

The operational question behind every backfill, migration, and engine swap:
"these two datasets should mostly agree — show me exactly where they don't."
Output is one row per differing key with a status:

  added    — key present only in `right` (the newer / candidate side)
  removed  — key present only in `left`
  changed  — key in both, at least one compared column differs

Design for 100 TB:
- Keys join via one co-partitioned full-outer shuffle (sort-merge; with
  bucketed inputs on the key — sources/bucketed — the exchange disappears
  entirely). Equal rows are dropped BEFORE any wide columns move further:
  each side reduces to (key, fingerprint) in a narrow scan-stage projection,
  so the shuffle carries two hashes per row, never the payload.
- The fingerprint is xxhash64 over the compared columns with NULL
  canonicalized per column (a real value never collides with NULL by
  position, because each column hashes its own null-sentinel slot).
- `value_cols=None` compares all non-key columns. Columns present on one
  side only are a SCHEMA diff — rejected loudly rather than silently hashed
  asymmetrically.

A count-only summary (`diff_summary`) folds the statuses map-side — the
usual first question ("how big is the drift?") costs one partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fingerprint(df: DataFrame, keys: list[str], cols: list[str]) -> DataFrame:
    slots = []
    for c in cols:
        # per-column sentinel slot: (isnull flag, value-as-string) — a NULL in
        # col A cannot collide with the string 'null' or with a NULL in col B
        slots.append(F.col(c).isNull().cast("int").cast("string"))
        slots.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    if not slots:
        # key-presence-only diff: every row's content is vacuously equal, so
        # only added/removed can be reported
        return df.select(*keys, F.lit(0).cast("long").alias("_fp"))
    return df.select(*keys, F.xxhash64(*slots).alias("_fp"))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of `right` vs `left` on `keys`. Returns (keys...,
    status) for differing keys only; identical rows produce nothing.
    Duplicate keys on either side are a contract violation the caller owns
    (diff semantics need key uniqueness); they surface as multiplied rows."""
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    if value_cols is None:
        if set(lcols) != set(rcols):
            raise ValueError(
                f"schema diff: left-only {sorted(set(lcols) - set(rcols))}, "
                f"right-only {sorted(set(rcols) - set(lcols))}; pass value_cols"
            )
        value_cols = sorted(lcols)
    lf = _fingerprint(left, keys, value_cols).withColumnRenamed("_fp", "_fp_l")
    rf = _fingerprint(right, keys, value_cols).withColumnRenamed("_fp", "_fp_r")
    j = lf.join(rf, keys, "full_outer")
    status = (
        F.when(F.col("_fp_l").isNull(), F.lit("added"))
        .when(F.col("_fp_r").isNull(), F.lit("removed"))
        .when(F.col("_fp_l") != F.col("_fp_r"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """(status, n) counts — the drift dashboard number. Same plan as
    table_diff plus one partial-aggregated count."""
    return table_diff(left, right, keys, value_cols).groupBy("status").agg(
        F.count("*").alias("n")
    )
