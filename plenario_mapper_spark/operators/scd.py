"""Slowly-changing-dimension (SCD type 2) maintenance.

The reference treats its sensor registry as overwrite-in-place (each refresh
re-reads current state; history is lost — `app/mapper.js:133,161` SELECTs the
live tables). A production pipeline keeps the dimension VERSIONED so facts can
join the registry as it was at event time (point-in-time correctness — the
as-of join in `operators/asof.py` is the read side of this contract; this
module is the write side).

Row model: (key, attrs..., effective_from, effective_to, is_current) with
half-open validity [effective_from, effective_to); the open row has NULL
effective_to. `scd2_merge` folds a batch of timestamped updates in:

- unchanged attrs -> no-op (no new version, no touched row)
- changed attrs   -> close the current row at the update ts, insert a new
  open row
- unseen key      -> insert an open row
- several updates for one key in one batch -> applied in ts order with
  consecutive-duplicate collapse, producing a chain of versions

Everything is one windowed pass over the (small) update batch plus one join
against the dimension keyed on the natural key; history rows for untouched
keys stream through unchanged. scd2_merge reads `dim` through three
projections (anchor, guard, untouched passthrough): free when dim is a
TABLE (pruned re-reads), but a caller passing DERIVED lineage should
persist it first or every projection replays the derivation
(q_scd2_versions does exactly this). The rewrite is the whole dimension — dims are
KB-to-GB against TB facts, and versioned tables don't admit partition-scoped
overwrite by key; if the dimension itself is huge, bucket it by key and
rewrite buckets (`sources/bucketed.py`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_init(updates: DataFrame, key: str, attrs: list[str], ts_col: str) -> DataFrame:
    """Bootstrap a versioned dimension from a timestamped update stream (also
    the reducer scd2_merge leans on for within-batch chains).

    Ties — two updates for one key at the SAME timestamp (an upstream retry,
    two sources flushing the same tick) — order deterministically by attr
    values: Window.orderBy on ts alone leaves tie order undefined, and which
    attrs end up current must not vary run to run. The attr sort is an
    arbitrary-but-stable convention (same discipline as lang_id/centroid
    tie-breaks); callers needing a semantic winner should disambiguate
    upstream with a sequence number in ts_col."""
    w = Window.partitionBy(key).orderBy(ts_col, *attrs)
    # collapse consecutive duplicates: a row opens a version only if any attr
    # differs from the key's previous update (first row always opens)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        changed = changed | ~prev.eqNullSafe(F.col(a))
    changed = changed | F.lag(ts_col).over(w).isNull()
    vers = updates.withColumn("_open", changed).filter(F.col("_open")).drop("_open")
    w2 = Window.partitionBy(key).orderBy(ts_col, *attrs)
    return vers.select(
        key,
        *attrs,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def scd2_merge(
    dim: DataFrame, updates: DataFrame, key: str, attrs: list[str], ts_col: str
) -> DataFrame:
    """Fold a batch of updates into a versioned dimension (see module doc).
    Updates at or before a key's current effective_from are rejected —
    out-of-order dimension rewrites would corrupt closed history, so the
    caller's ingest must deliver per-key-ordered batches (the same contract
    a streaming state store imposes)."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    # anchor each key's chain with its current row so the duplicate-collapse
    # sees (current attrs) -> (first update) transitions
    anchor = cur.select(key, *attrs, F.col("effective_from").alias(ts_col))
    guard = cur.select(key, F.col("effective_from").alias("_cur_from"))
    upd = (
        updates.select(key, *attrs, ts_col)
        .join(guard, key, "left")
        .filter(F.col("_cur_from").isNull() | (F.col(ts_col) > F.col("_cur_from")))
        .drop("_cur_from")
    )
    chains = scd2_init(anchor.unionByName(upd), key, attrs, ts_col)

    # keys with no (surviving) update keep their current row verbatim
    touched = upd.select(key).distinct()
    untouched_cur = cur.join(touched, key, "left_anti")
    rechained = chains.join(touched, key, "left_semi")
    return hist.unionByName(untouched_cur).unionByName(rechained)
