"""Closed-form pins for the econometrics batch (H185-H188): a 3-day series
with one discordant pair for Kendall, a two-nation trade matrix with exact
RCA rationals, a two-point log-log demand line, and a Theil split with zero
within-inequality and hand-computed between terms."""

import datetime
import math
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
TS = datetime.datetime(2024, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_kendall_tau_one_discordant_pair(spark):
    # daily (x,y): (1,1),(2,3),(3,2) -> C=2, D=1, no ties -> tau = 1/3
    rows, eid = [], 0
    for day, (nx, ny) in enumerate([(1, 1), (2, 3), (3, 2)]):
        t = TS + datetime.timedelta(days=day)
        for i in range(nx):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "click", 1.0, "{}")); eid += 1
        for i in range(ny):
            rows.append((eid, t + datetime.timedelta(minutes=30 + i), 1, "purchase", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_kendall_tau"](spark, d).collect()
    assert (r["n_days"], r["n_concordant"], r["n_discordant"]) == (3, 2, 1)
    assert r["tau_b"] == math.floor(1 / 3 * 1e6 + 0.5) / 1e6


def test_rca_two_nation_trade_matrix(spark):
    # nation A: cat X rev 10; nation B: cat X rev 10 + cat Y rev 10
    # RCA(A,X) = 10*30/(10*20) = 1.5; RCA(B,X) = 0.75; RCA(B,Y) = 1.5
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "nation", [(0, "A", 0), (1, "B", 0)],
               "n_nationkey int, n_name string, n_regionkey int")
        _write(spark, d, "supplier", [(1, "s", 0, 0.0), (2, "s", 1, 0.0)],
               "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
        _write(spark, d, "part",
               [(1, "p", "b", "X THING", 1, 0.0), (2, "p", "b", "Y THING", 1, 0.0)],
               "p_partkey long, p_name string, p_brand string, p_type string,"
               " p_size int, p_retailprice double")
        _write(spark, d, "lineitem",
               [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS),
                (2, 1, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS),
                (3, 2, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS)],
               LI_SCHEMA)
        got = {(r["nation"], r["category"]): r["rca"]
               for r in QUERIES["q_supplier_rca"](spark, d).collect()}
    assert got == {("A", "X"): 1.5, ("B", "X"): 0.75, ("B", "Y"): 1.5}


def test_price_elasticity_two_point_line(spark):
    # part 1: price 1, qty 8; part 2: price 2, qty 2 -> slope -2 on the
    # log-log line (grid-exact to ~1e-6), r2 exactly 1 for two points
    rows = [(1, 1, 1, 1, 8.0, 8.0, 0.0, 0.0, "N", "O", TS),
            (2, 2, 1, 1, 2.0, 4.0, 0.0, 0.0, "N", "O", TS)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        [r] = QUERIES["q_part_price_elasticity"](spark, d).collect()
    assert r["n_parts"] == 2
    assert abs(r["elasticity"] + 2.0) < 1e-5
    assert r["r2"] == 1.0


def test_theil_between_only(spark):
    # nation A: two customers of 1.0 each; nation B: two of 3.0 each ->
    # within-inequality zero everywhere; between terms .25*ln(.5), .75*ln(1.5)
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "nation", [(0, "A", 0), (1, "B", 0)],
               "n_nationkey int, n_name string, n_regionkey int")
        _write(spark, d, "customer",
               [(1, "c", 0, 0.0, "S"), (2, "c", 0, 0.0, "S"),
                (3, "c", 1, 0.0, "S"), (4, "c", 1, 0.0, "S")],
               "c_custkey long, c_name string, c_nationkey int,"
               " c_acctbal double, c_mktsegment string")
        _write(spark, d, "orders",
               [(1, 1, "O", 1.0, TS, "p"), (2, 2, "O", 1.0, TS, "p"),
                (3, 3, "O", 3.0, TS, "p"), (4, 4, "O", 3.0, TS, "p")],
               "o_orderkey long, o_custkey long, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp, o_orderpriority string")
        got = {r["nation"]: r for r in QUERIES["q_customer_theil"](spark, d).collect()}
    assert got["A"]["theil_within"] == 0.0 and got["B"]["theil_within"] == 0.0
    assert got["A"]["revenue_share"] == 0.25
    assert got["A"]["between_term"] == math.floor(0.25 * math.log(0.5) * 1e6 + 0.5) / 1e6
    assert got["B"]["between_term"] == math.floor(0.75 * math.log(1.5) * 1e6 + 0.5) / 1e6
