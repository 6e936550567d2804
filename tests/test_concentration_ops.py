"""Hand-computed pins for the concentration/association batch (H172-H177):
Gini rank-sum identity, HHI monopoly/duopoly anchors, Spearman-vs-Pearson on
an engineered monotone-nonlinear series, lift-decile anchors, leave-one-out
encoding with singleton fallback, and Nelson-Aalen hazard arithmetic."""

import datetime
import math
import os
import tempfile

import pytest

from plenario_mapper_spark.plans.registry import QUERIES


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


TS = datetime.datetime(2024, 3, 1)


def test_gini_known_distribution(spark):
    # one segment, revenues 1,2,3 dollars: G = (2*(1+4+9) - 4*6)/(3*6) = 2/9
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark,
            d,
            "customer",
            [(i, "n", 0, 0.0, "SEG") for i in (1, 2, 3)],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
            " c_mktsegment string",
        )
        _write(
            spark,
            d,
            "orders",
            [(i, i, "O", float(i), TS, "p") for i in (1, 2, 3)],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        [r] = QUERIES["q_customer_gini"](spark, d).collect()
    assert r["n_customers"] == 3
    assert r["total_revenue"] == 6.0
    assert r["gini"] == pytest.approx(math.floor(2 / 9 * 1e6 + 0.5) / 1e6)


def test_hhi_monopoly_and_duopoly(spark):
    # nation 0: one supplier -> HHI 10000, effective_n 1
    # nation 1: two equal suppliers -> HHI 5000, effective_n 2
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark,
            d,
            "nation",
            [(0, "MONO", 0), (1, "DUO", 0)],
            "n_nationkey int, n_name string, n_regionkey int",
        )
        _write(
            spark,
            d,
            "supplier",
            [(1, "s1", 0, 0.0), (2, "s2", 1, 0.0), (3, "s3", 1, 0.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        )
        _write(
            spark,
            d,
            "lineitem",
            [(k, 1, sk, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS)
             for k, sk in [(1, 1), (2, 2), (3, 3)]],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string,"
            " l_shipdate timestamp",
        )
        got = {r["nation"]: r for r in QUERIES["q_supplier_hhi"](spark, d).collect()}
    assert got["MONO"]["hhi"] == 10000.0 and got["MONO"]["effective_n"] == 1.0
    assert got["DUO"]["hhi"] == 5000.0 and got["DUO"]["effective_n"] == 2.0


def test_spearman_monotone_nonlinear(spark):
    # daily (click, purchase) = (1,1),(2,4),(3,9): perfectly monotone ->
    # spearman exactly 1; convex -> pearson strictly below 1
    rows, eid = [], 0
    for day, (nx, ny) in enumerate([(1, 1), (2, 4), (3, 9)]):
        base = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)
        for i in range(nx):
            rows.append((eid, base + datetime.timedelta(minutes=i), 1, "click", 1.0, "{}")); eid += 1
        for i in range(ny):
            rows.append((eid, base + datetime.timedelta(minutes=30 + i), 1, "purchase", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark, d, "events", rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        [r] = QUERIES["q_events_spearman_corr"](spark, d).collect()
    assert r["n_days"] == 3
    assert r["spearman"] == 1.0
    assert 0.9 < r["pearson"] < 1.0


def test_lift_deciles_anchors(spark):
    # 10 docs, distinct lengths 100..10; the 5 longest are 'en' (prevalence
    # 0.5): decile-1 lift = 2.0, gains reach 1.0 at decile 5, final lift 1.0
    docs = [
        (i, "t", "en" if i < 5 else "xx", "s", 100 - 10 * i) for i in range(10)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark, d, "documents", docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        got = {r["decile"]: r for r in QUERIES["q_eval_lift_deciles"](spark, d).collect()}
    assert got[1]["cum_lift"] == 2.0
    assert got[5]["cum_gain"] == 1.0
    assert got[10]["cum_lift"] == 1.0
    assert all(got[k]["n"] == 1 for k in range(1, 11))


def test_target_encode_loo_self_exclusion_and_fallback(spark):
    # source A: y = [1,1,0] -> enc(y=1) = 1/2, enc(y=0) = 1; checksum 2e6
    # source B: singleton y=0 -> global prior 2/4 = 0.5
    docs = [
        (0, "t", "en", "A", 1),
        (1, "t", "en", "A", 1),
        (2, "t", "xx", "A", 1),
        (3, "t", "xx", "B", 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark, d, "documents", docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        got = {r["source"]: r for r in QUERIES["q_doc_target_encode_loo"](spark, d).collect()}
    a, b = got["A"], got["B"]
    assert (a["enc_min"], a["enc_max"], a["enc_checksum"]) == (0.5, 1.0, 2_000_000)
    assert (b["enc_min"], b["enc_max"], b["enc_checksum"]) == (0.5, 0.5, 500_000)
    assert b["pos_rate"] == 0.0


def test_nelson_aalen_hand_spells(spark):
    # c1: Jan only (dies at len 1); c2: Jan+Feb (censored, len 2);
    # c3: Feb only (censored, len 1). Risk set at len 1 = 3, at len 2 = 1.
    # H(1) = 1/3; H(2) = 1/3 (no deaths at len 2); S_FH = exp(-1/3).
    jan, feb = datetime.datetime(2024, 1, 15), datetime.datetime(2024, 2, 15)
    orders = [
        (1, 1, "O", 1.0, jan, "p"),
        (2, 2, "O", 1.0, jan, "p"),
        (3, 2, "O", 1.0, feb, "p"),
        (4, 3, "O", 1.0, feb, "p"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(
            spark, d, "orders", orders,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        got = {r["spell_months"]: r for r in QUERIES["q_survival_nelson_aalen"](spark, d).collect()}
    third = math.floor(1 / 3 * 1e6 + 0.5) / 1e6
    assert got[1]["n_at_risk"] == 3 and got[1]["n_churned"] == 1
    assert got[1]["hazard_step"] == third and got[1]["cum_hazard"] == third
    assert got[2]["n_at_risk"] == 1 and got[2]["hazard_step"] == 0.0
    assert got[2]["cum_hazard"] == third
    assert got[2]["fh_survival"] == math.floor(math.exp(-1 / 3) * 1e6 + 0.5) / 1e6
