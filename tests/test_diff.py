"""Table diff: status semantics, NULL canonicalization, schema guard, plan width."""

import pyspark.sql.functions as F
import pytest

from plenario_mapper_spark.operators import diff as D
from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    from tests.conftest import final_plan

    return final_plan(df)


def test_statuses_and_null_handling(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [
            (1, "a", 1.0),      # identical -> absent from diff
            (2, "b", 2.0),      # NULL -> value: changed (not a silent equal)
            (3, "", 3.0),       # NULL -> empty string: changed (sentinel slot)
            (5, "e", 5.0),      # added
        ],
        "k int, s string, v double",
    )
    got = {r.k: r.status for r in D.table_diff(left, right, ["k"]).collect()}
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_summary_counts(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y")], "k int, s string")
    right = spark.createDataFrame([(2, "z"), (3, "w")], "k int, s string")
    got = {r.status: r.n for r in D.diff_summary(left, right, ["k"]).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 1}


def test_schema_drift_rejected(spark):
    left = spark.createDataFrame([(1, "x")], "k int, s string")
    right = spark.createDataFrame([(1, 2.0)], "k int, v double")
    with pytest.raises(ValueError, match="schema diff"):
        D.table_diff(left, right, ["k"])
    # explicit value_cols limited to the shared subset is the escape hatch
    assert D.table_diff(left, right, ["k"], value_cols=[]).count() == 0


def test_shuffle_carries_fingerprints_not_payload(spark):
    """The full-outer exchanges must move only (key, fingerprint): the wide
    text column must be pruned before the shuffle (projected into xxhash64
    at the scan stage)."""
    from plenario_mapper_spark.plans.relational import _t

    d = _t(spark, SF, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0)
    v2 = d.filter(F.col("doc_id") % 3 == 0)
    plan = _plan(D.table_diff(v1, v2, ["doc_id"]))
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln, ln


def test_diff_query_matches_direct_comparison(spark):
    """q_table_diff at sf0.001: recompute statuses by direct comparison in
    Spark and require set equality with the fingerprint path."""
    got = {(r.event_id, r.status) for r in QUERIES["q_table_diff"](spark, SF).collect()}
    from plenario_mapper_spark.plans.relational import _events

    e = _events(spark, SF).select("event_id", "event_type", "value")
    v1 = e.filter(F.col("event_id") % 7 != 0).alias("l")
    v2 = (
        e.filter(F.col("event_id") % 5 != 0)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 3 == 0, F.col("value") + 1).otherwise(
                F.col("value")
            ),
        )
        .alias("r")
    )
    j = v1.join(v2, F.col("l.event_id") == F.col("r.event_id"), "full_outer")
    direct = {
        (r[0], r[1])
        for r in j.select(
            F.coalesce("l.event_id", "r.event_id"),
            F.when(F.col("l.event_id").isNull(), "added")
            .when(F.col("r.event_id").isNull(), "removed")
            .when(
                ~F.col("l.event_type").eqNullSafe(F.col("r.event_type"))
                | ~F.col("l.value").eqNullSafe(F.col("r.value")),
                "changed",
            ),
        ).collect()
        if r[1] is not None
    }
    assert got == direct
