"""Independent-reference pins for the r10 allocation/layout family
(H159-H163): isotonic calibration (minimax == sequential PAVA), ABC
classification boundary rules, UCB1 scores, rendezvous minimal disruption,
segmented OLS trend on exact linear data."""

import datetime
import hashlib
import math
import os
import tempfile

import pytest

from plenario_mapper_spark.plans.registry import QUERIES

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
D0 = datetime.datetime(2024, 1, 1)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_isotonic_minimax_equals_sequential_pava(spark):
    rows = sorted(
        QUERIES["q_eval_isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    assert rows, "expected 10 bins"
    # monotone certification holds and is consistent with the emitted rates
    assert all(r["monotone_ok"] == 1 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["rate_iso"] <= b["rate_iso"] + 1e-12
    # independent sequential PAVA over the same (n, pos) bins
    bins = [(r["n"], r["n_pos"]) for r in rows]
    blocks = []
    for n, pos in bins:
        blocks.append([n, pos, 1])  # n, pos, covered-bin count
        while len(blocks) >= 2 and blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]:
            n2, p2, c2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            blocks[-1][2] += c2
    want = []
    for n, pos, c in blocks:
        want.extend([pos / n] * c)
    got = [r["rate_iso"] for r in rows]
    assert got == pytest.approx(want, abs=1e-6)


def test_abc_first_part_is_always_a(spark):
    """One part with 85% of revenue: the exclusive-cumulative rule still
    classes it A (cum_excl = 0 < 80%); the rest split by the thresholds."""
    rows = []
    # part 1: revenue 8500; parts 2..16: revenue 100 each (total 10000)
    rows.append((1, 1, 1, 1, 1.0, 8500.0, 0.0, 0.0, "N", "O", D0))
    for pk in range(2, 17):
        rows.append((pk, pk, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", D0))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            r["abc_class"]: r
            for r in QUERIES["q_part_abc_class"](spark, d).collect()
        }
    # part 1 (85%) is A. Parts 2..: cum_excl starts at 8500/10000 = 85%
    # >= 80%, so none are A; B while 20*cum < 19*tot i.e. cum < 9500:
    # parts at cum_excl 8500..9400 -> 10 parts B; the rest (5) C.
    assert got["A"]["n_parts"] == 1
    assert got["A"]["revenue_share"] == pytest.approx(0.85, abs=1e-6)
    assert got["B"]["n_parts"] == 10
    assert got["C"]["n_parts"] == 5


def test_ucb1_matches_python_reference(spark):
    rows, eid = [], 0
    pulls = {"click": 20, "view": 5, "purchase": 2}
    vals = {"click": 50.0, "view": 100.0, "purchase": 300.0}
    for arm, n in pulls.items():
        for _ in range(n):
            ts = D0 + datetime.timedelta(minutes=eid)
            rows.append((eid, ts, 1, arm, vals[arm], "{}")); eid += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r["arm"]: r for r in QUERIES["q_eval_ucb1_arms"](spark, d).collect()}
    big_n = sum(pulls.values())
    scores = {}
    for arm, n in pulls.items():
        mean_r = vals[arm] / 350.0
        scores[arm] = mean_r + math.sqrt(2 * math.log(big_n) / n)
        assert got[arm]["n_pulls"] == n
        assert got[arm]["mean_reward"] == pytest.approx(mean_r, abs=1e-6)
        assert got[arm]["ucb_score"] == pytest.approx(scores[arm], abs=1e-6)
    best = max(sorted(scores), key=lambda a: scores[a])
    assert got[best]["chosen"] == 1
    assert sum(r["chosen"] for r in got.values()) == 1


def test_rendezvous_matches_md5_and_minimal_disruption(spark):
    df = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["shard"]: r
            for r in QUERIES["q_doc_rendezvous_shards"](spark, d).collect()
        }

    def assign(doc, shards):
        def score(s):
            return int(
                hashlib.md5(f"hrw|{s}|{doc}".encode()).hexdigest()[:15], 16
            )
        return max(shards, key=lambda s: (score(s), -s))

    import collections

    before = collections.Counter(assign(i, range(8)) for i in range(100))
    after = collections.Counter(assign(i, range(7)) for i in range(100))
    moved = [i for i in range(100) if assign(i, range(8)) != assign(i, range(7))]
    # the theorem: exactly the shard-7 docs move
    assert all(assign(i, range(8)) == 7 for i in moved)
    for s in range(8):
        assert got[s]["n_before"] == before.get(s, 0)
        assert got[s]["n_after"] == (after.get(s, 0) if s < 7 else 0)
        assert got[s]["minimal_disruption"] == 1
    assert sum(got[s]["moved_in"] for s in range(8)) == before.get(7, 0)


def test_segmented_trend_exact_linear_slopes(spark):
    """Days 0-4 carry counts 10+2d (slope 2); days 5-9 carry 65-3x
    (slope -3). OLS on exactly linear data recovers the slopes exactly."""
    rows, eid = [], 0
    for d in range(10):
        y = 10 + 2 * d if d <= 4 else 65 - 3 * d
        for _ in range(y):
            ts = D0 + datetime.timedelta(days=d, seconds=eid % 3600)
            rows.append((eid, ts, 1, "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        [row] = QUERIES["q_events_segmented_trend"](spark, d).collect()
    assert row["n_days_pre"] == 5 and row["n_days_post"] == 5
    assert row["slope_pre"] == pytest.approx(2.0, abs=1e-6)
    assert row["slope_post"] == pytest.approx(-3.0, abs=1e-6)
    assert row["slope_delta"] == pytest.approx(-5.0, abs=1e-6)
