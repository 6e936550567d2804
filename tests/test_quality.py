"""Constraint-battery semantics + the one-scan plan contract."""

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import quality as QC


def _report(df, checks):
    return {r["check_name"]: (r["violations"], r["passed"])
            for r in QC.check_constraints(df, checks).collect()}


def test_violation_semantics_on_dirty_frame(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (1, "B", -5.0),      # dup key, bad domain, negative
            (None, "A", 3.0),    # null key
            (2, None, 2000.0),   # null domain col (not a domain violation), out of range
        ],
        "k long, status string, price double",
    )
    rep = _report(
        df,
        [
            QC.Check("k_not_null", "not_null", cols=("k",)),
            QC.Check("k_unique", "unique", cols=("k",)),
            QC.Check("status_domain", "accepted_values", cols=("status",), values=("A", "B")),
            QC.Check("price_range", "in_range", cols=("price",), lo=0, hi=100),
            QC.Check("price_non_negative", "non_negative", cols=("price",)),
            QC.Check("min_rows", "row_count_min", min_rows=10),
        ],
    )
    assert rep["k_not_null"] == (1, False)
    assert rep["k_unique"] == (1, False)          # one non-null duplicate
    assert rep["status_domain"] == (0, True)      # NULL status is not a domain violation
    assert rep["price_range"] == (2, False)       # -5 and 2000
    assert rep["price_non_negative"] == (1, False)
    assert rep["min_rows"] == (6, False)          # shortfall of 6 rows


def test_clean_frame_all_pass_and_empty_battery_edge(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "k long, status string")
    rep = _report(
        df,
        [
            QC.Check("k_unique", "unique", cols=("k",)),
            QC.Check("min_rows", "row_count_min", min_rows=2),
        ],
    )
    assert rep == {"k_unique": (0, True), "min_rows": (0, True)}


def test_battery_is_one_scan(spark, tmp_path):
    """Six checks must compile to a single scan of the table — the whole point
    vs the oracle's six UNION ALL passes."""
    p = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = QC.check_constraints(
        df,
        [
            QC.Check("id_not_null", "not_null", cols=("id",)),
            QC.Check("id_unique", "unique", cols=("id",)),
            QC.Check("v_range", "in_range", cols=("v",), lo=0, hi=6),
            QC.Check("v_non_negative", "non_negative", cols=("v",)),
            QC.Check("min_rows", "row_count_min", min_rows=1),
            QC.Check("v_domain", "accepted_values", cols=("v",), values=tuple(range(7))),
        ],
    )
    from tests.conftest import final_plan

    plan = final_plan(out)
    scans = sum(1 for ln in plan.splitlines() if "Scan parquet" in ln)
    assert scans == 1, plan
    assert {r["passed"] for r in out.collect()} == {True}


def test_unique_supports_composite_keys_and_guards_single_col_kinds(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (None, "a")],
        "k long, sub string",
    )
    rep = _report(df, [QC.Check("pk", "unique", cols=("k", "sub"))])
    # (1,a) duplicated once; the NULL-key row is out of the unique domain
    assert rep["pk"] == (1, False)
    with _pytest.raises(ValueError, match="exactly one column"):
        QC.check_constraints(df, [QC.Check("bad", "in_range", cols=("k", "sub"), lo=0, hi=1)]).collect()
    with _pytest.raises(ValueError, match="at least one column"):
        QC.check_constraints(df, [QC.Check("bad2", "unique")]).collect()


def test_property_battery_matches_pandas_reference(spark):
    """Property (hypothesis): on random dirty frames, every check kind's
    violation count equals an independently-written pandas model. One Spark
    pass per generated frame keeps the property fast; the frames sample
    nulls, duplicates, domain escapes, and range escapes jointly."""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
        st.one_of(st.none(), st.sampled_from(["A", "B", "C", "Z"])),
        st.one_of(st.none(), st.floats(min_value=-50, max_value=150, allow_nan=False)),
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=1, max_size=25))
    def check(rows):
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["k", "status", "price"])
        df = spark.createDataFrame(
            rows, "k long, status string, price double"
        )
        rep = _report(
            df,
            [
                QC.Check("k_not_null", "not_null", cols=("k",)),
                QC.Check("k_unique", "unique", cols=("k",)),
                QC.Check("composite_unique", "unique", cols=("k", "status")),
                QC.Check("status_domain", "accepted_values", cols=("status",), values=("A", "B", "C")),
                QC.Check("price_range", "in_range", cols=("price",), lo=0, hi=100),
                QC.Check("price_nonneg", "non_negative", cols=("price",)),
                QC.Check("min_rows", "row_count_min", min_rows=10),
            ],
        )
        k = pdf["k"]
        assert rep["k_not_null"][0] == int(k.isna().sum())
        nn = k.dropna()
        assert rep["k_unique"][0] == len(nn) - nn.nunique()
        both = pdf.dropna(subset=["k", "status"])
        assert rep["composite_unique"][0] == len(both) - len(
            both[["k", "status"]].drop_duplicates()
        )
        s = pdf["status"].dropna()
        assert rep["status_domain"][0] == int((~s.isin(["A", "B", "C"])).sum())
        p = pdf["price"].dropna()
        assert rep["price_range"][0] == int(((p < 0) | (p > 100)).sum())
        assert rep["price_nonneg"][0] == int((p < 0).sum())
        assert rep["min_rows"][0] == max(0, 10 - len(pdf))

    check()


def test_fk_audit_counts_orphans_and_ignores_null_fks(spark):
    """fk_audit: non-NULL FK without a parent is an orphan; NULL FKs are not
    (SQL join semantics); duplicate parent keys don't double-count children."""
    from plenario_mapper_spark.operators.quality import fk_audit

    parent = spark.createDataFrame([(1,), (2,), (2,)], "pk long")  # dup parent
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk long"
    )
    rows = fk_audit([("c->p", child, "fk", parent, "pk")]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_child"] == 5
    assert r["n_orphans"] == 1  # only the 99; the NULL is not an orphan
    assert r["orphan_rate"] == 0.2
    assert r["passed"] is False


def test_fk_audit_passes_on_consistent_edge(spark):
    from plenario_mapper_spark.operators.quality import fk_audit

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame([(1,), (2,), (2,)], "fk long")
    r = fk_audit([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert r["passed"] is True and r["n_orphans"] == 0


def test_pk_scorecard_detects_dup_and_null_keys(spark, tmp_path):
    """Synthetic damage: a duplicated orderkey and a NULL event_id must
    fail their tables' pass bits with exact counts; clean tables pass."""
    import datetime
    import os

    from plenario_mapper_spark.plans.registry import QUERIES

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        spark.read.parquet(f"{src}/{t}.parquet").write.parquet(f"{d}/{t}.parquet")
    # orders: append a duplicate of an existing key
    o = spark.read.parquet(f"{src}/orders.parquet")
    dup = o.limit(1)
    o.unionByName(dup).write.parquet(f"{d}/orders.parquet")
    n_orders = o.count()
    # events: one NULL event_id row
    e = spark.read.parquet(f"{src}/events.parquet")
    bad = spark.createDataFrame(
        [(None, datetime.datetime(2024, 1, 1), 1, "click", 0.0, "{}")],
        e.schema,
    )
    e.unionByName(bad).write.parquet(f"{d}/events.parquet")
    n_events = e.count()

    got = {
        r["table_name"]: r
        for r in QUERIES["q_quality_pk_scorecard"](spark, d).collect()
    }
    assert got["orders"]["pk_ok"] == 0
    assert got["orders"]["n_rows"] == n_orders + 1
    assert got["orders"]["n_dup_rows"] == 1
    assert got["events"]["pk_ok"] == 0
    assert got["events"]["n_null_keys"] == 1
    assert got["events"]["n_dup_rows"] == 0
    assert got["customer"]["pk_ok"] == 1 and got["region"]["pk_ok"] == 1
