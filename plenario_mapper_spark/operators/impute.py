"""Deterministic missing-value imputation: per-group mode / median fill.

The curation step between profiling (operators/profile flags the null-rate
creep) and training (models want complete rows): fill a column's NULLs from
its group's consensus — MODE for categoricals, MEDIAN for numerics — with
every tie broken deterministically, so two runs (or two engines) impute the
identical values. Spark's own Imputer is mean/median over the whole column;
this is the grouped form a heterogeneous corpus needs (the right fill for a
'src17' doc is src17's consensus, not the global one).

Determinism contracts:
- mode: counted pass + row_number cut ordered (count DESC, value ASC) — the
  survivorship tie-break discipline (operators/dedup.consolidate_clusters);
  never the engine-unspecified mode() aggregate.
- median: exact linear-interpolated percentile(0.5) — the same interpolation
  DuckDB's quantile_cont computes, so fills hash-check cross-engine.

Scale shape: one grouped aggregate per fill column (map-side partial), a
groups-sized fill table joined back broadcast, and a scan-stage coalesce —
the fact table never shuffles. NULL-group rows fall back to the global
consensus (computed the same way over all rows).

No reference counterpart (the reference forwards records as-is; SURVEY §2.H
extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_mode(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, fill) where fill is the group's most frequent non-NULL value,
    ties to the smallest value — a counted pass + row_number cut."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc("cnt"), F.asc_nulls_last(value_col)
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("cnt"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(group_col, F.col(value_col).alias("fill"))
    )


def group_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, fill): exact interpolated median of the non-NULL values."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.percentile(F.col(value_col).cast("double"), F.lit(0.5)).alias("fill")
        )
    )


def impute(
    df: DataFrame, value_col: str, group_col: str, fills: DataFrame
) -> DataFrame:
    """Fill value_col's NULLs from the (group, fill) table; rows whose group
    has no fill (all-NULL group) keep NULL — callers chain a global-fill pass
    if they need totality. The fills table is groups-sized: broadcast join,
    the fact side never shuffles."""
    return df.join(F.broadcast(fills), group_col, "left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.col("fill"))
    ).drop("fill")
