"""Column profiler: one-scan plan shape, null/cardinality accounting, approx mode."""

import pyspark.sql.functions as F

from plenario_mapper_spark.operators import profile as PR
from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    from tests.conftest import final_plan

    return final_plan(df)


def test_profile_single_scan(spark):
    plan = _plan(QUERIES["q_profile_orders"](spark, SF))
    assert plan.count("FileScan parquet") == 1, plan


def test_profile_null_and_distinct_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 1.5), (3, "b", None), (4, "a", -2.0)],
        "k int, s string, v double",
    )
    got = {r.column: r.asDict() for r in PR.profile_columns(df).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 4
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_num"] is None and got["s"]["max_num"] is None
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_num"] == -2.0 and got["v"]["max_num"] == 1.5


def test_profile_approx_mode_no_expand(spark):
    from plenario_mapper_spark.plans.relational import _t

    o = _t(spark, SF, "orders")
    exact = PR.profile_columns(o)
    approx = PR.profile_columns(o, exact_distinct=False)
    assert "Expand" in _plan(exact)
    assert "Expand" not in _plan(approx)
    e = {r.column: r.n_distinct for r in exact.collect()}
    a = {r.column: r.n_distinct for r in approx.collect()}
    for c in e:
        # rsd=0.02 -> 3-sigma band of 6%
        assert abs(a[c] - e[c]) <= max(3, 0.06 * e[c]), (c, e[c], a[c])


def test_histogram_bins_and_clamping(spark):
    from plenario_mapper_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame(
        [(0.0,), (4.9,), (5.0,), (9.99,), (10.0,), (-0.1,), (10.1,), (None,)],
        "v double",
    )
    got = {r.bin: (r.bin_lo, r.bin_hi, r.n) for r in
           numeric_histogram(df, "v", 2, 0.0, 10.0).collect()}
    # [-0.1, 10.1, None] dropped; 10.0 (== hi) clamps into the last bin
    assert got == {0: (0.0, 5.0, 2), 1: (5.0, 10.0, 3)}


def test_histogram_single_scan_single_exchange(spark):
    plan = _plan(QUERIES["q_profile_histogram"](spark, SF))
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_histogram_rejects_bad_bounds(spark):
    import pytest as _pytest

    from plenario_mapper_spark.operators.profile import numeric_histogram

    df = spark.range(1).select(F.col("id").cast("double").alias("v"))
    with _pytest.raises(ValueError):
        numeric_histogram(df, "v", 0, 0.0, 1.0)
    with _pytest.raises(ValueError):
        numeric_histogram(df, "v", 4, 2.0, 2.0)


def test_profile_drift_schema_and_values(spark):
    """Drift rows carry per-side profiles and numeric shifts; a column
    present on only one side (schema drift) emits a half-null row."""
    from plenario_mapper_spark.operators.profile import profile_drift

    a = spark.createDataFrame(
        [(1, 10.0, "x"), (2, None, "y")], "k int, v double, s string"
    )
    b = spark.createDataFrame([(3, 99.0)], "k int, v double")  # s retired
    got = {r["column"]: r for r in profile_drift(a, b).collect()}
    assert got["k"]["n_rows_a"] == 2 and got["k"]["n_rows_b"] == 1
    assert got["k"]["min_shift"] == 2.0 and got["k"]["max_shift"] == 1.0
    assert got["v"]["n_null_a"] == 1 and got["v"]["n_null_b"] == 0
    assert got["v"]["max_shift"] == 89.0
    assert got["s"]["n_rows_b"] is None  # retired column -> half-null row
