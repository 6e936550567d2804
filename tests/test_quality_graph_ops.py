"""Hand-computed pins for modularity / silhouette / freshness / backlog
(H189-H192): a K2,2-plus-isolated-pair graph whose sync-LP modularity is
exactly -0.34, a two-far-clusters silhouette with closed-form grid values,
a dead-source freshness contrast, and an aging schedule with planted ages."""

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


def test_modularity_k22_plus_pair(spark):
    # K2,2 (suppliers 1,2 x parts 1,2) + isolated edge (supplier 3, part 3).
    # Sync LP separates bipartite sides / oscillates the pair, so NO edge is
    # within-community: Q = -(16+16+1+1)/(4*25) = -0.34 exactly.
    rows = [(ok, pk, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", TS)
            for ok, (sk, pk) in enumerate(
                [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3)], start=1)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        [r] = QUERIES["q_graph_modularity"](spark, d).collect()
    assert (r["m_edges"], r["n_communities"], r["m_within"]) == (5, 4, 0)
    assert r["modularity"] == -0.34


def test_silhouette_two_far_clusters(spark):
    # sampled ids (multiples of 50): label 0 at (0,0),(0,1); label 1 at
    # (10,0),(10,1). a=1; b=(10e6+floor(sqrt(101)*1e6+.5))/2e6; s=(b-a)/b.
    emb = [(0, [0.0, 0.0], 0), (50, [0.0, 1.0], 0),
           (100, [10.0, 0.0], 1), (150, [10.0, 1.0], 1),
           (7, [99.0, 99.0], 0)]  # non-multiple-of-50 id: must be ignored
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "embeddings", emb,
               "vec_id long, embedding array<float>, label int")
        got = {r["label"]: r for r in QUERIES["q_embed_silhouette"](spark, d).collect()}
    b = (10_000_000 + math.floor(math.sqrt(101) * 1e6 + 0.5)) / 2e6
    s6 = math.floor((b - 1.0) / b * 1e6 + 0.5)
    want = math.floor(s6 / 1e6 * 1e6 + 0.5) / 1e6
    for lbl in (0, 1):
        assert got[lbl]["n_scored"] == 2
        assert got[lbl]["mean_silhouette"] == want


def test_freshness_dead_source(spark):
    # type A: one event/day for days 0..9; type B: day 0 only ->
    # B is 9 days stale with last-week ratio 0; A rides at exactly 1.0
    rows, eid = [], 0
    for day in range(10):
        rows.append((eid, TS + datetime.timedelta(days=day), 1, "A", 1.0, "{}")); eid += 1
    rows.append((eid, TS, 2, "B", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        got = {r["event_type"]: r for r in QUERIES["q_quality_freshness"](spark, d).collect()}
    a, b = got["A"], got["B"]
    assert (a["days_stale"], a["span_days"], a["daily_rate"]) == (0, 10, 1.0)
    assert a["last_week_vs_rate"] == 1.0  # 7 of 10 events in the last 7 days
    assert (b["days_stale"], b["span_days"], b["last_week_vs_rate"]) == (9, 1, 0.0)


def test_backlog_aging_buckets(spark):
    # clock = the (finished, excluded) newest order; open orders aged
    # 10 / 40 / 100 days land in 0-30 / 31-60 / 90+
    newest = TS + datetime.timedelta(days=100)
    orders = [
        (1, 1, "F", 99.0, newest, "1-URGENT"),
        (2, 1, "O", 10.0, newest - datetime.timedelta(days=10), "1-URGENT"),
        (3, 1, "O", 20.0, newest - datetime.timedelta(days=40), "1-URGENT"),
        (4, 1, "P", 30.0, newest - datetime.timedelta(days=100), "2-HIGH"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "orders", orders,
               "o_orderkey long, o_custkey long, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp, o_orderpriority string")
        got = {(r["priority"], r["age_bucket"]): r
               for r in QUERIES["q_orders_backlog_aging"](spark, d).collect()}
    assert got[("1-URGENT", "0-30")]["n_orders"] == 1
    assert got[("1-URGENT", "0-30")]["value"] == 10.0
    assert got[("1-URGENT", "31-60")]["n_orders"] == 1
    assert got[("2-HIGH", "90+")]["value"] == 30.0
    assert len(got) == 3  # the finished order never appears
