"""Johnson–Lindenstrauss random-sign projection: embedding compression that
provably near-preserves pairwise distances.

At 100 TB an embedding column dominates storage and every ANN/cluster/dedup
pass pays its width; JL (Achlioptas, JCSS'03 — database-friendly ±1 signs)
says a k-dim random-sign projection preserves all pairwise Euclidean
distances within (1±ε) for k = O(log n / ε²), independent of the source
dimension. This module is the deterministic, engine-reproducible form: the
sign matrix derives from md5 (the repo's oracle-mirrorable hash discipline),
so any external system — or the DuckDB oracle — reproduces the projected
vectors, and therefore the measured distortions, exactly.

Parity discipline: each projected component rounds to the driver's 6-digit
grid, downstream distances compute FROM the rounded components, and ratios
compute from the rounded distances — so cross-engine float-summation-order
differences (~1e-13) never reach a compared value. sqrt is IEEE-exact
(correctly rounded by spec), unlike the libm calls the round-then-rank rule
exists for.

Projection is pure Column HOFs (zip_with + aggregate over an array literal
per output dim) — JVM-side, scan-stage, no shuffle, no Python.

No reference counterpart (SURVEY §2.H extension surface).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, functions as F
from plenario_mapper_spark.functions import parity as PAR


def jl_signs(out_dim: int, in_dim: int, salt: str = "jl0") -> list[list[float]]:
    """Deterministic ±1 sign matrix: sign(j,i) = +1 iff the first hex digit of
    md5('salt|j|i') < 8 — unbiased, engine-independent, reproducible anywhere
    md5 exists."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}|{j}|{i}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_sql_matrix(signs: list[list[float]]) -> str:
    """The sign matrix as a SQL list-of-lists literal (for oracle mirrors)."""
    return (
        "["
        + ", ".join(
            "[" + ", ".join(f"{v:.1f}" for v in row) + "]" for row in signs
        )
        + "]"
    )


def jl_project(vec: Column, signs: list[list[float]]) -> Column:
    """Project an array column onto the sign rows, scaled by 1/sqrt(k); each
    output component rounded to 6 so both engines' downstream math starts
    from identical doubles."""
    scale = 1.0 / math.sqrt(len(signs))
    return F.array(
        *[
            PAR.round6(F.lit(scale)
                * F.aggregate(
                    F.zip_with(vec, F.lit(row), lambda a, b: a.cast("double") * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ))
            for row in signs
        ]
    )


def euclidean(a: Column, b: Column) -> Column:
    """Euclidean distance between two array columns (unrounded — callers
    round per the parity discipline)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def gram_matrix_exact(
    items, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Gram matrix M = Σ_rows x xᵀ with a BIT-DETERMINISTIC entry fold: each
    (i, j) entry is the left-to-right sum of per-row products ordered by row
    id — the oracle-twin form (DuckDB's list_reduce over list(p ORDER BY id)
    is the identical IEEE op sequence, the ANN-fold discipline). Per-row
    products x_i·x_j are EXACT doubles (float32 mantissas multiply within
    53 bits), so the whole matrix is bit-identical across engines by
    construction and everything derived from it (power iteration, traces)
    stays hash-comparable with no tolerance machinery.

    Cost: one self-join co-partitioned on the row id (d² rows per vector)
    and a d²-group aggregate that collects the per-entry product list — fine
    at oracle scale, NOT the 100 TB form (the ordered fold serializes each
    entry's sum). Production uses gram_matrix_partials below; the pytest
    gate certifies the two agree to float-sum tolerance."""
    u = items.select(
        F.col(id_col).alias("rid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "xi"),
    )
    a, b = u.alias("a"), u.alias("b")
    pairs = a.join(b, "rid").select(
        "rid",
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (F.col("a.xi") * F.col("b.xi")).alias("p"),
    )
    return pairs.groupBy("i", "j").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rid", "p"))),
            F.lit(0.0),
            lambda acc, s: acc + s["p"],
        ).alias("mij")
    )


def gram_matrix_partials(items, vec_col: str = "embedding", dim: int = 64):
    """The 100 TB Gram build: one mapInPandas pass accumulates a d×d numpy
    partial XᵀX per partition (vectorized per Arrow batch; only d² doubles
    leave each partition — the map-side-combine shape of MLlib's
    computeGramianMatrix), then a d²-key sum folds partials. Returns
    (i, j, mij). Entry values differ from gram_matrix_exact only by
    float-summation order (~1e-13 relative); use the exact twin when
    downstream must be cross-engine hash-comparable."""
    import pandas as pd

    def acc(batches):
        import numpy as np

        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(x):
                g += x.T @ x
        ii, jj = np.meshgrid(range(dim), range(dim), indexing="ij")
        yield pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "p": g.ravel()}
        )

    from plenario_mapper_spark.operators.partitioning import spread_to_parallelism

    parts = spread_to_parallelism(items.select(vec_col)).mapInPandas(
        acc, "i int, j int, p double"
    )
    return parts.groupBy("i", "j").agg(F.sum("p").alias("mij"))


def power_iteration_top(M: list[list[float]], iters: int = 12):
    """Top eigenpair of a small dense symmetric matrix by `iters` power-
    iteration steps from e₁, every sum a LEFT-TO-RIGHT Python-float fold —
    bit-identical to the DuckDB recursive-CTE mirror (list_reduce over the
    same sequences) given the same M. Returns (eigval, v, trace). Driver-
    side on purpose: M is d×d metadata (64×64 = 32 KB), the same
    size-argued collect as the bloom word table; the DATA-proportional work
    (the Gram build) already ran distributed."""
    d = len(M)
    v = [1.0] + [0.0] * (d - 1)
    lam = 0.0
    for _ in range(iters):
        w = []
        for i in range(d):
            s = 0.0
            row = M[i]
            for j in range(d):
                s = s + row[j] * v[j]
            w.append(s)
        nr = 0.0
        for wi in w:
            nr = nr + wi * wi
        lam = math.sqrt(nr)
        v = [wi / lam for wi in w]
    tr = 0.0
    for i in range(d):
        tr = tr + M[i][i]
    return lam, v, tr
