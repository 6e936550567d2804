"""Declarative data-quality constraint checking (the deequ/dbt-test shape).

A training-data pipeline gates every ingest on a battery of table constraints
— key uniqueness, null rates, accepted domains, value ranges. Run naively
that is one scan per check; at 100 TB, k checks = k full-table reads. This
module compiles the whole check battery into ONE aggregation pass: every
constraint lowers to an aggregate expression (conditional count, exact
distinct count), Spark computes them side by side in a single partial+final
hash agg over a single scan, and the one-row result explodes into the
per-check report. Adding a check adds a column to the agg, not a pass over
the data.

Checks are data, not code (name + params), so a registry/config can own the
battery and the report is joinable history: (check_name, violations, passed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F
from plenario_mapper_spark.functions import parity as PAR


@dataclass(frozen=True)
class Check:
    """One constraint: `kind` in {not_null, unique, accepted_values, in_range,
    non_negative, row_count_min}. `violations` semantics per kind:
    - not_null: rows where any of `cols` is NULL
    - unique: duplicate fully-non-null key tuples = COUNT(rows with every key
      col non-null) - COUNT(DISTINCT cols...) — composite keys supported;
      any-NULL keys are the not_null check's business, counted once there
    - accepted_values: non-null rows outside `values`
    - in_range: non-null rows outside [lo, hi]
    - non_negative: non-null rows < 0
    - row_count_min: max(0, min_rows - COUNT(*)) — a short table 'violates'
      by its shortfall, so the report stays a plain count column"""

    name: str
    kind: str
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    min_rows: int = 0


def _violations(c: Check) -> Column:
    if c.kind in ("accepted_values", "in_range", "non_negative") and len(c.cols) != 1:
        raise ValueError(f"check {c.name!r}: kind {c.kind!r} takes exactly one column")
    if c.kind in ("not_null", "unique") and not c.cols:
        raise ValueError(f"check {c.name!r}: kind {c.kind!r} needs at least one column")
    col = F.col(c.cols[0]) if c.cols else None
    if c.kind == "not_null":
        pred = F.lit(False)
        for name in c.cols:
            pred = pred | F.col(name).isNull()
        return F.sum(F.when(pred, 1).otherwise(0))
    if c.kind == "unique":
        # composite keys: rows with every key column non-null, minus distinct
        # key tuples (count_distinct over several cols already skips any-null
        # rows, so the two sides agree on the domain)
        all_non_null = F.lit(True)
        for name in c.cols:
            all_non_null = all_non_null & F.col(name).isNotNull()
        return F.sum(F.when(all_non_null, 1).otherwise(0)) - F.count_distinct(
            *[F.col(name) for name in c.cols]
        )
    if c.kind == "accepted_values":
        return F.sum(F.when(col.isNotNull() & ~col.isin(*c.values), 1).otherwise(0))
    if c.kind == "in_range":
        return F.sum(
            F.when(col.isNotNull() & ~col.between(c.lo, c.hi), 1).otherwise(0)
        )
    if c.kind == "non_negative":
        return F.sum(F.when(col < 0, 1).otherwise(0))
    if c.kind == "row_count_min":
        return F.greatest(F.lit(c.min_rows) - F.count(F.lit(1)), F.lit(0))
    raise ValueError(f"unknown check kind: {c.kind!r}")


def check_constraints(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the battery in one aggregation pass over one scan; returns
    (check_name STRING, violations BIGINT, passed BOOLEAN), one row per
    check, in no guaranteed order (it's a report table, join/filter it).

    Scale: the agg has no grouping key, so the partial aggregates are one
    row per task and the final agg is a single-row reduce — the cost is the
    scan, paid once for the whole battery. Only the checked columns are
    read (column pruning sees through the conditional counts)."""
    aggs = [
        F.coalesce(_violations(c).cast("long"), F.lit(0)).alias(c.name)
        for c in checks
    ]
    row = df.agg(*aggs)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check_name"),
                    F.col(c.name).alias("violations"),
                )
                for c in checks
            ]
        )
    ).alias("r")
    return row.select(report).select(
        "r.check_name",
        "r.violations",
        (F.col("r.violations") == 0).alias("passed"),
    )


def fk_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]]
) -> DataFrame:
    """Cross-table referential-integrity audit: one row per foreign-key edge
    (name, child_df, fk_col, parent_df, pk_col) with child volume, orphan
    count (non-NULL FK with no parent — NULL FKs are not orphans, the SQL
    join semantics), orphan rate, and a passed bit. The companion to
    check_constraints (single-table rules): schema-wide consistency is what
    breaks silently when tables ingest on independent schedules.

    Scale shape: each edge reduces the parent to its DISTINCT keys first
    (map-side partial; dims broadcast under AQE from runtime size) and
    left-joins the child's key column only — the child's payload never
    shuffles; per-edge one-row aggregates union at the end."""
    from functools import reduce as _reduce

    outs = []
    for name, child, fk, parent, pk in edges:
        pkeys = parent.select(F.col(pk).alias("_pk")).distinct()
        joined = child.select(F.col(fk).alias("_fk")).join(
            pkeys, F.col("_fk") == F.col("_pk"), "left"
        )
        orphan = F.col("_fk").isNotNull() & F.col("_pk").isNull()
        outs.append(
            joined.agg(
                F.lit(name).alias("edge"),
                F.count("*").cast("long").alias("n_child"),
                F.count(F.when(orphan, 1)).cast("long").alias("n_orphans"),
                PAR.round6(F.count(F.when(orphan, 1)).cast("double")
                    / F.greatest(F.count("*"), F.lit(1)).cast("double")).alias("orphan_rate"),
                (F.count(F.when(orphan, 1)) == 0).alias("passed"),
            )
        )
    return _reduce(DataFrame.unionByName, outs)
