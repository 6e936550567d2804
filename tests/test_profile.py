"""Column profiler: one-scan plan shape, null/cardinality accounting, approx mode."""

import pyspark.sql.functions as F

from plenario_mapper_spark.operators import profile as PR
from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
