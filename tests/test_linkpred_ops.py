"""Engineered pins for link prediction / NDCG / ABC migration (H182-H184):
a 2-edge path whose single candidate pair has closed-form scores, a 3-doc
ranking with hand-computed grid DCG, and a revenue flip that drives an
A->C / C->A migration."""

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


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def _li(ok, pk, price, ts):
    return (ok, pk, 1, 1, 1.0, price, 0.0, 0.0, "N", "O", ts)


TS = datetime.datetime(2024, 1, 1)


def test_link_prediction_path_graph(spark):
    # baskets {1,2} and {2,3}: edges (1,2),(2,3); the only candidate is
    # (1,3) through z=2 (deg 2): cn=1, jaccard=1/(1+1-1)=1,
    # adamic_adar=1/ln(2) on the 1e6 grid
    rows = [_li(1, 1, 1.0, TS), _li(1, 2, 1.0, TS),
            _li(2, 2, 1.0, TS), _li(2, 3, 1.0, TS)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        got = QUERIES["q_graph_link_prediction"](spark, d).collect()
    assert len(got) == 1
    [r] = got
    assert (r["part_a"], r["part_b"], r["common_neighbors"]) == (1, 3, 1)
    assert r["jaccard"] == 1.0
    assert r["adamic_adar"] == math.floor(1e6 / math.log(2) + 0.5) / 1e6


def test_ndcg_hand_ranking(spark):
    # system order (by length): rel 1, 0, 1 -> DCG6 = 1e6 + 500000;
    # ideal order: rel 1, 1, 0 -> IDCG6 = 1e6 + floor(1e6/log2(3)+.5)
    docs = [(0, "t", "en", "s", 30), (1, "t", "xx", "s", 20), (2, "t", "en", "s", 10)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "documents", docs,
               "doc_id long, text string, lang string, source string, n_chars long")
        [r] = QUERIES["q_eval_ndcg"](spark, d).collect()
    dcg6 = 1_000_000 + 500_000
    idcg6 = 1_000_000 + math.floor(1e6 / math.log2(3) + 0.5)
    assert r["n_relevant"] == 2
    assert r["dcg_at_10"] == dcg6 / 1e6
    assert r["ndcg_at_10"] == math.floor(dcg6 / idcg6 * 1e6 + 0.5) / 1e6


def test_abc_migration_revenue_flip(spark):
    # half 1 revenues p1=80, p2=15, p3=5 (A/B/C); half 2 reversed ->
    # p3 A, p2 B, p1 C: matrix {A->C, B->B, C->A} each 1
    early = datetime.datetime(2024, 1, 1)
    late = datetime.datetime(2024, 1, 11)
    rows = [_li(1, 1, 80.0, early), _li(2, 2, 15.0, early), _li(3, 3, 5.0, early),
            _li(4, 1, 5.0, late), _li(5, 2, 15.0, late), _li(6, 3, 80.0, late)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "lineitem", rows, LI_SCHEMA)
        got = {(r["class_from"], r["class_to"]): r["n_parts"]
               for r in QUERIES["q_part_abc_migration"](spark, d).collect()}
    assert got == {("A", "C"): 1, ("B", "B"): 1, ("C", "A"): 1}
