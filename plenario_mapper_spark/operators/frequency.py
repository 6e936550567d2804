"""Frequency sketching: distributed Misra–Gries heavy hitters.

Completes the sketch family (HLL cardinality — plans/relational.q_agg_hll_rollup;
approx percentiles — q_agg_approx_percentile) with the third classic: frequency /
heavy hitters. The reference engine ships no sketch surface at all (its
aggregation layer is the distinct-list fold, app/mapper.js:300-320); this module
is part of the declared-absent extension surface (SURVEY §2.D "[absent]").

Algorithm: Misra–Gries in its *mergeable summaries* form (Agarwal, Cormode,
Huang, Phillips, Wei, Yi — PODS'12): each partition folds its Arrow batches
into a k-counter summary; merging adds counters then subtracts the (k+1)-th
largest count from every counter, dropping non-positives. Tracked deductions
give hard, data-independent guarantees used by the certification query
(plans/pipeline_ops.q_doc_heavy_hitters):

  (1) est(x) <= true(x)                      (never overcounts)
  (2) true(x) - est(x) <= total_dec          (undercount bounded by deductions)
  (3) total_dec <= N / (k + 1)               (each subtraction of s removes
                                              >= (k+1)*s mass from counters)

so any item with true(x) > N/(k+1) is guaranteed present in the merged summary.
With phi-heavy defined as true(x)*round(1/phi) > N and k + 1 > 1/phi, capture is
a theorem, not a tuning — the certification bits are provable for ANY input.

100 TB shape: one pass over the column inside Arrow-batched mapInPandas (one
Python worker per partition, counters bounded at k entries); the merged
candidate table is <= k * num_partitions rows of (item, est) — broadcastable by
construction (ids + two longs, never payloads). The exact-count twin in the
certification query exists only for driver decidability; production serves the
sketch alone (the point at scale: no exact-distinct shuffle over the domain).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

SUMMARY_SCHEMA = "item string, est long, dec long"


def mg_merge(counter: dict, batch_counts: dict, k: int) -> int:
    """Merge `batch_counts` into `counter` in place, then prune to <= k entries
    by subtracting the (k+1)-th largest count (the PODS'12 merge rule). Returns
    the amount subtracted from every surviving counter (0 when no prune ran).
    """
    for item, c in batch_counts.items():
        counter[item] = counter.get(item, 0) + int(c)
    if len(counter) <= k:
        return 0
    vals = sorted(counter.values(), reverse=True)
    sub = vals[k]
    if sub <= 0:
        return 0
    for item in list(counter):
        nc = counter[item] - sub
        if nc > 0:
            counter[item] = nc
        else:
            del counter[item]
    return sub


def misra_gries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries of `df[col]` (cast to string).

    Returns a DataFrame with SUMMARY_SCHEMA: one (item, est, 0) row per
    surviving counter, plus one (NULL, 0, dec_p) bookkeeping row per partition
    carrying that partition's total deductions. Use `merge_summaries` for the
    global candidate table + deduction total.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        dec = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            dec += mg_merge(counter, vc.to_dict(), k)
        rows = [(item, int(c), 0) for item, c in counter.items()]
        rows.append((None, 0, int(dec)))
        yield pd.DataFrame(rows, columns=["item", "est", "dec"])

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, SUMMARY_SCHEMA
    )


def merge_summaries(summary: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a `misra_gries` output into (candidates, deductions):
    candidates = (item, est) with est summed across partitions (est <= true by
    guarantee (1)); deductions = single row (total_dec) bounding every item's
    global undercount (guarantee (2)). Candidates stay <= k * num_partitions
    rows; deductions is a one-row relation meant for a broadcast cross join —
    the repo-standard scalar-total pattern, never a collect().
    """
    candidates = (
        summary.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").cast("long").alias("est"))
    )
    deductions = summary.agg(F.sum("dec").cast("long").alias("total_dec"))
    return candidates, deductions
