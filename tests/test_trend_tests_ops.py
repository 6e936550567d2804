"""Closed-form pins for the statistical-testing batch (H200-H203): a
strictly increasing Mann-Kendall series, a two-group Brown-Forsythe spread
contrast replicated arithmetic-for-arithmetic, a perfect-association
Cramer's V (the absent-cell correction's pin), and a planted semantic
benchmark duplicate."""

import datetime
import hashlib
import math
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
TS = datetime.datetime(2024, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )


def test_mann_kendall_strict_increase(spark):
    # daily counts 1,2,3,4: S = 6, no ties, Var = 4*3*13/18, z = 5/sqrt(Var)
    rows, eid = [], 0
    for day in range(4):
        t = TS + datetime.timedelta(days=day)
        for i in range(day + 1):
            rows.append((eid, t + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "events", rows, EV_SCHEMA)
        [r] = QUERIES["q_events_mann_kendall"](spark, d).collect()
    var = 4 * 3 * 13 / 18
    assert (r["n_days"], r["s_statistic"]) == (4, 6)
    assert r["var_s"] == math.floor(var * 1e6 + 0.5) / 1e6
    assert r["z_score"] == math.floor(5 / math.sqrt(var) * 1e6 + 0.5) / 1e6


def test_brown_forsythe_two_group_spread(spark):
    # g1 = {10,10,10} (zero spread), g2 = {0,50,100}: replicate the exact
    # grid arithmetic (micro values, whole-dollar^2 snap) for the F pin
    orders = [(i + 1, 1, "O", float(v), TS, g)
              for i, (g, v) in enumerate(
                  [("G1", 10), ("G1", 10), ("G1", 10),
                   ("G2", 0), ("G2", 50), ("G2", 100)])]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "orders", orders,
               "o_orderkey long, o_custkey long, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp, o_orderpriority string")
        [r] = QUERIES["q_eval_brown_forsythe"](spark, d).collect()
    # z-values (micro): g1 -> 0,0,0; g2 (median 50e6) -> 50e6, 0, 50e6
    N, T = 6, 100_000_000
    btw = 0
    for ng, sg in ((3, 0), (3, 100_000_000)):
        btw += math.floor((sg * N - ng * T) ** 2 / (ng * N * N) / 1e12 + 0.5)
    wth = math.floor((2 * 50_000_000**2 - 100_000_000**2 / 3) / 1e12 + 0.5)
    want = math.floor((N - 2) / 1 * btw / wth * 1e6 + 0.5) / 1e6
    assert (r["n_groups"], r["n_total"]) == (2, 6)
    assert r["f_stat"] == want


def test_cramers_v_perfect_association(spark):
    # 2x2 diagonal table: the absent cells contribute their expectations,
    # so chi2 = N = 4 and V = 1 exactly
    docs = [(0, "t", "en", "A", 1), (1, "t", "en", "A", 1),
            (2, "t", "xx", "B", 1), (3, "t", "xx", "B", 1)]
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "documents", docs,
               "doc_id long, text string, lang string, source string, n_chars long")
        [r] = QUERIES["q_doc_cramers_v"](spark, d).collect()
    assert (r["n_sources"], r["n_langs"], r["n_docs"]) == (2, 2, 4)
    assert r["chi2"] == 4.0
    assert r["cramers_v"] == 1.0


def _sdc_gate(vid: int) -> bool:
    h = hashlib.md5(f"sdc|{vid}".encode()).hexdigest()[:8]
    return int(h, 16) % 32 == 0


def test_semantic_decontaminate_planted_duplicate(spark):
    # find one gated (benchmark) id and two ungated ids; plant an exact
    # duplicate of the benchmark vector (cos=1 -> flagged at every rung)
    # and an orthogonal one (cos=0 -> never flagged)
    bench_id = next(i for i in range(1000) if _sdc_gate(i))
    others = [i for i in range(1000) if not _sdc_gate(i)][:2]
    emb = [(bench_id, [1.0, 0.0], 0),
           (others[0], [1.0, 0.0], 0),   # duplicate of benchmark
           (others[1], [0.0, 1.0], 0)]   # orthogonal
    with tempfile.TemporaryDirectory() as d:
        _write(spark, d, "embeddings", emb,
               "vec_id long, embedding array<float>, label int")
        got = {r["threshold_micro"]: r
               for r in QUERIES["q_doc_semantic_decontaminate"](spark, d).collect()}
    assert set(got) == {800000, 900000, 950000, 990000}
    for thr, r in got.items():
        assert (r["n_corpus"], r["n_bench"]) == (2, 1)
        assert r["n_flagged"] == 1
        assert r["flag_rate"] == 0.5
