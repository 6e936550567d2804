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
