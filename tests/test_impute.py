"""Deterministic imputation (operators/impute).

Pins: mode tie-break determinism, exact interpolated median, NULL-group
passthrough, broadcast fill-table plan shape (the fact side never shuffles),
and idempotence (imputing a complete column is a no-op).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import impute as IM
from tests.conftest import final_plan


def _df(spark):
    rows = [
        # g1: 'b' x2 vs 'a' x2 — tie breaks to the SMALLER value 'a'
        ("g1", "a", 10.0), ("g1", "a", None), ("g1", "b", 30.0), ("g1", "b", None),
        ("g1", None, 20.0),
        # g2: clear mode 'z'; numeric median of (1, 2, 4, 8) = 3.0
        ("g2", "z", 1.0), ("g2", "z", 2.0), ("g2", "y", 4.0), ("g2", None, 8.0),
        ("g2", None, None),
        # g3: all values NULL -> no fill row, NULLs survive
        ("g3", None, None),
    ]
    return spark.createDataFrame(rows, "src string, cat string, num double")


def test_mode_tie_breaks_to_smallest_value(spark):
    fills = {r["src"]: r["fill"] for r in IM.group_mode(_df(spark), "src", "cat").collect()}
    assert fills == {"g1": "a", "g2": "z"}  # g3 absent: nothing to count


def test_median_is_exact_interpolation(spark):
    fills = {r["src"]: r["fill"] for r in IM.group_median(_df(spark), "src", "num").collect()}
    assert fills["g1"] == 20.0  # median of (10, 20, 30)
    assert fills["g2"] == 3.0  # midpoint of (2, 4)


def test_impute_fills_and_null_group_passes_through(spark):
    df = _df(spark)
    out = IM.impute(df, "cat", "src", IM.group_mode(df, "src", "cat"))
    out = IM.impute(out, "num", "src", IM.group_median(df, "src", "num"))
    rows = out.collect()
    assert all(r["cat"] is not None for r in rows if r["src"] != "g3")
    assert all(r["num"] is not None for r in rows if r["src"] != "g3")
    g3 = [r for r in rows if r["src"] == "g3"][0]
    assert g3["cat"] is None and g3["num"] is None


def test_impute_is_idempotent_on_complete_columns(spark):
    df = _df(spark).filter(F.col("cat").isNotNull())
    before = sorted(map(tuple, df.select("src", "cat").collect()))
    out = IM.impute(df, "cat", "src", IM.group_mode(df, "src", "cat"))
    after = sorted(map(tuple, out.select("src", "cat").collect()))
    assert before == after


def test_fill_join_is_broadcast(spark):
    df = _df(spark)
    out = IM.impute(df, "cat", "src", IM.group_mode(df, "src", "cat"))
    out.count()
    plan = final_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
