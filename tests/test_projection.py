"""JL random-sign projection (operators/projection).

Pins: sign-matrix determinism and balance, projection linearity against an
independent numpy reference, the JL distance-concentration band at the
operating k, and the scan-stage plan shape (no shuffle, no Python boundary).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import projection as PJ
from tests.conftest import final_plan


def test_signs_deterministic_and_balanced():
    s1 = PJ.jl_signs(16, 64)
    s2 = PJ.jl_signs(16, 64)
    assert s1 == s2
    flat = [v for row in s1 for v in row]
    assert set(flat) == {1.0, -1.0}
    # md5 nibble < 8 is unbiased; 1024 draws concentrate hard around half
    assert 0.40 < flat.count(1.0) / len(flat) < 0.60


def test_projection_matches_numpy(spark):
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(20, 64)).astype("float32")
    signs = PJ.jl_signs(16, 64)
    m = np.array(signs)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["pv"]
        for r in df.select(
            "vec_id", PJ.jl_project(F.col("embedding"), signs).alias("pv")
        ).collect()
    }
    for i, v in enumerate(vecs):
        want = np.round(0.25 * (m @ v.astype("float64")), 6)
        np.testing.assert_allclose(got[i], want, atol=1.5e-6)


def test_jl_distance_concentration(spark):
    """k=16: relative distortion concentrates ~ 1 ± 1/sqrt(k) = ±25%; pin a
    generous band (all pairs within [0.4, 1.8], mean within 15% of 1) on a
    deterministic gaussian cloud — regression pin, not a statistical test."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 64))
    signs = PJ.jl_signs(16, 64)
    m = np.array(signs)
    ratios = []
    for i in range(0, 60, 2):
        a, b = vecs[i], vecs[i + 1]
        d0 = np.linalg.norm(a - b)
        d1 = np.linalg.norm(0.25 * (m @ (a - b)))
        ratios.append(d1 / d0)
    assert all(0.4 < r < 1.8 for r in ratios)
    assert abs(float(np.mean(ratios)) - 1.0) < 0.15


def test_projection_is_scan_stage(spark):
    """The projection must stay inside the scan stage: no Exchange, no
    BatchEvalPython/ArrowEval — pure JVM HOFs."""
    signs = PJ.jl_signs(8, 16)
    df = spark.range(1000).select(
        F.array(*[(F.col("id") % (i + 3)).cast("float") for i in range(16)]).alias(
            "embedding"
        )
    )
    out = df.select(PJ.jl_project(F.col("embedding"), signs).alias("pv"))
    out.count()
    plan = final_plan(out)
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_sql_matrix_roundtrip():
    signs = PJ.jl_signs(2, 3)
    s = PJ.jl_sql_matrix(signs)
    assert s.count("[") == 3 and s.count("]") == 3
    import duckdb

    got = duckdb.connect().execute(f"SELECT {s} AS m").fetchone()[0]
    assert got == signs


def test_euclidean_matches_numpy(spark):
    a = [1.0, 2.0, 3.5]
    b = [0.5, -1.0, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(PJ.euclidean(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    assert got == pytest.approx(float(np.linalg.norm(np.array(a) - np.array(b))))


def test_gram_partials_matches_exact_twin_and_pca_sanity(spark):
    """The 100 TB Gram build (mapInPandas numpy partials) must agree with the
    bit-deterministic oracle-twin fold to float-summation tolerance, and the
    power iteration must return the dominant eigenpair on a constructed
    matrix with a known spectrum."""
    from plenario_mapper_spark.operators import projection as PJ

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["i"], r["j"]): r["mij"] for r in PJ.gram_matrix_exact(e).collect()
    }
    fast = {
        (r["i"], r["j"]): r["mij"]
        for r in PJ.gram_matrix_partials(e).collect()
    }
    assert set(exact) == set(fast) and len(exact) == 64 * 64
    for k, v in exact.items():
        assert fast[k] == pytest.approx(v, rel=1e-9, abs=1e-9)

    # known spectrum: diag(5, 2, 1) -> top eigenvalue 5 along dim 0
    M = [[5.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 1.0]]
    lam, vec, tr = PJ.power_iteration_top(M, iters=12)
    assert lam == pytest.approx(5.0, rel=1e-9)
    assert abs(vec[0]) == pytest.approx(1.0, rel=1e-9)
    assert tr == 8.0
