"""Pareto frontier (skyline) over arbitrary minimize/maximize dimension sets.

The reference engine has no multi-objective operator (its query surface is the
mapper pipeline, app/mapper.js); skyline is part of the declared extension
surface next to top-k (SURVEY §2.E "[absent]") — the multi-objective analog of
ORDER BY ... LIMIT: rows no other row dominates (better-or-equal on every
dimension, strictly better on at least one).

Two-stage distributed shape (the standard local-prune/global-merge skyline,
e.g. Börzsönyi et al. ICDE'01 block-nested refined by partition pruning):

  1. LOCAL PRUNE — per-partition skyline inside Arrow-batched mapInPandas
     using sort-filter-scan: rows sorted by the sum of their oriented
     dimensions (dominators always sort strictly earlier, since componentwise
     <= with one strict < implies a strictly smaller sum), then a single scan
     comparing each row only against the running skyline (vectorized numpy).
     Dominated rows never leave their partition — at 100 TB this is the stage
     that matters: the full table streams through once, and only local
     survivors (typically a vanishing fraction) are exchanged.
  2. GLOBAL MERGE — the union of local survivors is anti-joined against
     itself on the dominance predicate. Non-equi left-anti plans as a
     BroadcastNestedLoopJoin over the candidate set only — quadratic in the
     number of CANDIDATES, not input rows. The frontier of anti-correlated
     dimensions is inherently large; in that regime the output itself is the
     cost, not the join.

Rows with NULL in any skyline dimension are excluded up front (dominance is
three-valued-logic-undefined for them; both engines would otherwise disagree
silently). Dimension values are compared as float64 — integer dimensions
beyond 2^53 would alias (same mantissa rule as sources/evolved.py); keep id
columns out of the dimension list.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _oriented(pdf: pd.DataFrame, minimize: list, maximize: list) -> np.ndarray:
    cols = [pdf[c].to_numpy(dtype="float64") for c in minimize]
    cols += [-pdf[c].to_numpy(dtype="float64") for c in maximize]
    return np.column_stack(cols)


def _local_skyline(pdf: pd.DataFrame, minimize: list, maximize: list) -> pd.DataFrame:
    if len(pdf) == 0:
        return pdf
    a = _oriented(pdf, minimize, maximize)
    order = np.argsort(a.sum(axis=1), kind="stable")
    a = a[order]
    keep: list[int] = []
    sky = np.empty((0, a.shape[1]))
    for i in range(len(a)):
        r = a[i]
        if len(keep) and bool(
            np.any((sky <= r).all(axis=1) & (sky < r).any(axis=1))
        ):
            continue
        keep.append(i)
        sky = a[keep]
    return pdf.iloc[order[keep]]


def pareto_frontier(
    df: DataFrame, minimize: list | tuple = (), maximize: list | tuple = ()
) -> DataFrame:
    """Rows of `df` on the Pareto frontier of the given dimensions. Ties that
    are equal on every dimension all survive (neither dominates). Preserves
    df's full schema."""
    minimize, maximize = list(minimize), list(maximize)
    dims = minimize + maximize
    if not dims:
        raise ValueError("at least one minimize/maximize dimension required")

    clean = df.na.drop(subset=dims)

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Fold batch-by-batch: skyline(running ∪ batch) keeps partition memory
        # at O(local skyline + one Arrow batch), never the whole partition.
        run: pd.DataFrame | None = None
        for p in batches:
            if not len(p):
                continue
            both = p if run is None else pd.concat([run, p], ignore_index=True)
            run = _local_skyline(both, minimize, maximize)
        if run is not None and len(run):
            yield run

    cand = clean.mapInPandas(prune, clean.schema)

    probe = cand.select([F.col(c).alias("__q_" + c) for c in dims])
    weak = [F.col("__q_" + c) <= F.col(c) for c in minimize]
    weak += [F.col("__q_" + c) >= F.col(c) for c in maximize]
    strict = [F.col("__q_" + c) < F.col(c) for c in minimize]
    strict += [F.col("__q_" + c) > F.col(c) for c in maximize]
    dominates = reduce(lambda x, y: x & y, weak) & reduce(lambda x, y: x | y, strict)
    return cand.join(probe, dominates, "left_anti")
