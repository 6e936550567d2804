"""Rank-sum AUC (q_eval_auc_ranksum's formulation).

Pins the midrank U-statistic against an independent Python reference on a
labeled set WITH ties, plus the degenerate separability cases.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _spark_auc(spark, rows):
    d = spark.createDataFrame(rows, "score long, pos int")
    g = d.groupBy("score").agg(
        F.count("*").cast("long").alias("n"), F.sum("pos").cast("long").alias("p")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long")
    )
    t = r.agg(
        F.sum("p").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("p")).cast("long").alias("n_neg"),
        F.sum(
            F.col("p").cast("double")
            * (
                F.col("cum_before").cast("double")
                + (F.col("n").cast("double") + F.lit(1.0)) / F.lit(2.0)
            )
        ).alias("u"),
    ).collect()[0]
    return (
        t["u"] - t["n_pos"] * (t["n_pos"] + 1) / 2
    ) / (t["n_pos"] * t["n_neg"])


def _ref_auc(rows):
    """Probability a random positive outranks a random negative, ties = 1/2."""
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference_with_ties(spark):
    rows = [
        (10, 1), (10, 0), (12, 1), (8, 0), (12, 0), (15, 1),
        (9, 0), (15, 1), (15, 0), (7, 0), (11, 1), (10, 1),
    ]
    assert _spark_auc(spark, rows) == _ref_auc(rows)  # exact (dyadic midranks)


def test_auc_degenerate_cases(spark):
    perfect = [(i + 100, 1) for i in range(5)] + [(i, 0) for i in range(5)]
    inverted = [(i, 1) for i in range(5)] + [(i + 100, 0) for i in range(5)]
    all_tied = [(42, 1)] * 4 + [(42, 0)] * 6
    assert _spark_auc(spark, perfect) == 1.0
    assert _spark_auc(spark, inverted) == 0.0
    assert _spark_auc(spark, all_tied) == 0.5


def test_welch_ttest_matches_reference(spark):
    """q_eval_welch_ttest's DECIMAL-moment formulation against a plain
    Python Welch computation on known samples."""
    import math

    a = [10.0, 12.5, 11.0, 13.0, 9.5, 12.0]
    b = [8.0, 9.0, 7.5, 8.5]
    rows = [("purchase", v) for v in a] + [("view", v) for v in b]
    d = spark.createDataFrame(rows, "event_type string, value double")
    dv = F.col("value").cast("decimal(18,6)")
    is_a, is_b = F.col("event_type") == "purchase", F.col("event_type") == "view"
    m = d.agg(
        F.count(F.when(is_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(is_b, 1)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, dv)).cast("double").alias("s1a"),
        F.sum(F.when(is_a, dv * dv)).cast("double").alias("s2a"),
        F.sum(F.when(is_b, dv)).cast("double").alias("s1b"),
        F.sum(F.when(is_b, dv * dv)).cast("double").alias("s2b"),
    ).collect()[0]

    def stats(vals):
        n = len(vals)
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / (n - 1)
        return n, mean, var

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    sea, seb = va / na, vb / nb
    t_ref = (ma - mb) / math.sqrt(sea + seb)
    df_ref = (sea + seb) ** 2 / (sea**2 / (na - 1) + seb**2 / (nb - 1))

    mean_a = m["s1a"] / m["n_a"]
    var_a = (m["s2a"] - m["s1a"] ** 2 / m["n_a"]) / (m["n_a"] - 1)
    mean_b = m["s1b"] / m["n_b"]
    var_b = (m["s2b"] - m["s1b"] ** 2 / m["n_b"]) / (m["n_b"] - 1)
    got_t = (mean_a - mean_b) / math.sqrt(var_a / m["n_a"] + var_b / m["n_b"])
    got_df = (var_a / m["n_a"] + var_b / m["n_b"]) ** 2 / (
        (var_a / m["n_a"]) ** 2 / (m["n_a"] - 1)
        + (var_b / m["n_b"]) ** 2 / (m["n_b"] - 1)
    )
    assert abs(got_t - t_ref) < 1e-9
    assert abs(got_df - df_ref) < 1e-9


def test_calibration_bins_match_python_reference(spark):
    """q_eval_calibration_bins vs an independently-coded reference over the
    same parquet: bin populations, confidences, observed rates, and ECE."""
    import hashlib

    import pyarrow.parquet as pq

    from plenario_mapper_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pylist()
    bins = {}
    for r in t:
        y = 1 if r["label"] % 2 == 1 else 0
        h = int(hashlib.md5(f"cal|{r['vec_id']}".encode()).hexdigest()[:8], 16)
        p_m = (h % 1000 * 2 + y * 1000) // 3
        b = bins.setdefault(p_m // 100, [0, 0, 0])
        b[0] += 1
        b[1] += p_m
        b[2] += y
    n_all = sum(b[0] for b in bins.values())
    ece = sum(
        b[0] / n_all * abs(b[2] / b[0] - b[1] / (b[0] * 1000.0))
        for b in bins.values()
    )
    got = {r["bin"]: r for r in QUERIES["q_eval_calibration_bins"](spark, sf).collect()}
    assert set(got) == set(bins)
    for k, (n, sum_pm, n_pos) in bins.items():
        r = got[k]
        assert r["n"] == n and r["n_pos"] == n_pos
        assert abs(r["mean_confidence"] - sum_pm / (n * 1000.0)) < 1e-6
        assert abs(r["observed_rate"] - n_pos / n) < 1e-6
        assert abs(r["ece_total"] - ece) < 1e-6
    # the synthetic model is miscalibrated by construction — the metric
    # must SAY so (a flat-zero ECE here would mean the gap column is broken)
    assert ece > 0.01


def test_rrf_fusion_hand_checked(spark):
    """RRF = sum of 1/(60+rank) over the lists containing the doc; a doc
    near the top of BOTH rankers must outrank either single-list leader."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    # doc 1: tf=5 (rank_tf 1) and longest (rank_len 1) -> fused leader.
    # doc 2: tf=9? no - keep tf leader doc 2 single-list: tf rank 1 but absent
    # from the length top via tiny n_chars? n_chars ranks ALL docs, so give it
    # a low length rank instead; fusion still favors the both-lists doc 1.
    rows = [
        (1, "window " * 5 + "x", "en", "a", 9000),
        (2, "window " * 9, "en", "b", 10),
        (3, "nothing here", "en", "c", 8000),
        (4, "window once", "en", "d", 7000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {r["doc_id"]: r for r in QUERIES["q_search_rrf_fusion"](spark, d).collect()}

    # tf ranks: doc2 (tf 9) r1, doc1 (tf 5) r2, doc4 (tf 1) r3; doc3 absent
    # len ranks: doc1 r1, doc3 r2, doc4 r3, doc2 r4
    assert got[2]["rank_tf"] == 1 and got[1]["rank_tf"] == 2
    assert got[1]["rank_len"] == 1 and got[3]["rank_tf"] is None
    ref = {
        1: 1 / 62 + 1 / 61,
        2: 1 / 61 + 1 / 64,
        3: 1 / 62,
        4: 1 / 63 + 1 / 63,
    }
    for k, v in ref.items():
        assert abs(got[k]["rrf_score"] - v) < 1e-6
    # both-lists doc 1 beats the single-list tf leader doc 2
    assert got[1]["rrf_score"] > got[2]["rrf_score"]


def test_wilson_ci_matches_python_reference(spark):
    """Wilson bounds vs an independently-coded reference, including the
    zero-conversion edge where the Wald interval would degenerate."""
    import datetime, math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # variant 0 (even users 0..19): users 0,2,4 purchase -> k=3, n=10
    # variant 1 (odd users 1..19): nobody purchases -> k=0, n=10
    for uid in range(20):
        rows.append((eid, d0, uid, "view", 0.0, "{}")); eid += 1
        if uid % 2 == 0 and uid < 6:
            rows.append((eid, d0, uid, "purchase", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r["variant"]: r for r in QUERIES["q_eval_wilson_ci"](spark, d).collect()}

    def wilson(k, n, z=1.96):
        p = k / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        return (center - half) / denom, (center + half) / denom

    assert got[0]["n"] == 10 and got[0]["conversions"] == 3
    lo, hi = wilson(3, 10)
    assert abs(got[0]["wilson_lo"] - lo) < 1e-6
    assert abs(got[0]["wilson_hi"] - hi) < 1e-6
    # zero-conversion variant: lower bound exactly 0, upper meaningfully > 0
    lo1, hi1 = wilson(0, 10)
    assert got[1]["rate"] == 0.0
    assert abs(got[1]["wilson_lo"] - lo1) < 1e-6 and got[1]["wilson_lo"] == 0.0
    assert abs(got[1]["wilson_hi"] - hi1) < 1e-6 and got[1]["wilson_hi"] > 0.2


def test_odds_ratio_matches_python_reference(spark):
    """Known 2x2 table vs an independently-coded OR/RR/Woolf-CI; empty-cell
    case yields NULLs."""
    import datetime, math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)

    def build(treat_conv, treat_no, ctrl_conv, ctrl_no):
        rows, eid, uid = [], 0, 0
        def user(variant, conv):
            nonlocal eid, uid
            while uid % 2 != variant:
                uid += 1
            rows.append((eid, d0, uid, "view", 0.0, "{}")); eid += 1
            if conv:
                rows.append((eid, d0, uid, "purchase", 0.0, "{}")); eid += 1
            uid += 1
        for _ in range(treat_conv):
            user(1, True)
        for _ in range(treat_no):
            user(1, False)
        for _ in range(ctrl_conv):
            user(0, True)
        for _ in range(ctrl_no):
            user(0, False)
        return rows

    def run(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
            return QUERIES["q_eval_odds_ratio"](spark, d).collect()[0]

    r = run(build(12, 8, 6, 14))
    a, b, c, d = 12, 8, 6, 14
    assert (r["treat_conv"], r["treat_no"], r["ctrl_conv"], r["ctrl_no"]) == (a, b, c, d)
    orr = a * d / (b * c)
    assert abs(r["odds_ratio"] - orr) < 1e-6
    assert abs(r["relative_risk"] - (a / (a + b)) / (c / (c + d))) < 1e-6
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(r["or_ci_lo"] - math.exp(math.log(orr) - 1.96 * se)) < 1e-6
    assert abs(r["or_ci_hi"] - math.exp(math.log(orr) + 1.96 * se)) < 1e-6
    assert r["or_ci_lo"] < orr < r["or_ci_hi"]

    r0 = run(build(5, 5, 0, 10))  # empty ctrl_conv cell
    assert r0["odds_ratio"] is None and r0["or_ci_lo"] is None
    assert r0["relative_risk"] is None


def test_covariate_balance_detects_broken_randomization(spark):
    """Balanced arms give |SMD| ~ 0; a planted imbalance on one covariate
    gives a large SMD matching the hand formula on exact moments."""
    import datetime, math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 20 users/arm; n_events alternates 3/5 within each arm (balanced),
    # but treatment users carry value 10.0/event vs control 1.0 (imbalanced)
    for uid in range(40):
        variant = uid % 2
        k = 3 if (uid // 2) % 2 == 0 else 5
        for _ in range(k):
            rows.append(
                (eid, d0, uid, "view", 10.0 if variant else 1.0, "{}")
            ); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            r["covariate"]: r
            for r in QUERIES["q_eval_covariate_balance"](spark, d).collect()
        }
    assert got["n_events"]["smd"] == 0.0 and got["n_events"]["balanced"] == 1
    # n_types is constant (all 'view') in both arms -> zero variance -> NULL
    assert got["n_types"]["smd"] is None and got["n_types"]["balanced"] is None
    vc = got["value_cents"]
    # hand SMD: arm means 4000 vs 400 cents, per-arm values {3000,5000}/{300,500}
    vals1 = [3000, 5000] * 10
    vals0 = [300, 500] * 10
    def mv(v):
        m = sum(v) / len(v)
        return m, sum((x - m) ** 2 for x in v) / (len(v) - 1)
    m1, v1 = mv(vals1)
    m0, v0 = mv(vals0)
    ref = (m1 - m0) / math.sqrt((v1 + v0) / 2)
    assert abs(vc["smd"] - ref) < 1e-6
    assert vc["balanced"] == 0


def test_median_ci_order_statistics(spark):
    """n=100 values 1..100 cents*? -> median rank 50, CI ranks
    floor((100-19.6)/2)=40 and ceil(1+(100+19.6)/2)=61; bounds bracket."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        (i, 1, "O", i / 100.0, datetime.datetime(2024, 1, 1), "x")
        for i in range(1, 101)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        r = QUERIES["q_eval_median_ci"](spark, d).collect()[0]
    assert r["n_rows"] == 100
    assert r["median_cents"] == 50  # rank floor(101/2)=50 -> value 50
    assert r["ci_lo_cents"] == 40
    assert r["ci_hi_cents"] == 61
    assert r["ci_lo_cents"] < r["median_cents"] < r["ci_hi_cents"]


def test_cohens_kappa_reference(spark):
    """Kappa vs a hand-computed reference on a controlled corpus; perfect
    agreement gives kappa 1."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    def run(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            return QUERIES["q_eval_langid_kappa"](spark, d).collect()[0]

    en = "the cat and the dog of it is that for"
    de = "der hund und die katze ist von mit den ein"
    # perfect agreement: labels match the stopword vote
    r = run([(1, en, "en", "s", 1), (2, de, "de", "s", 1),
             (3, en, "en", "s", 1), (4, de, "de", "s", 1)])
    assert r["accuracy"] == 1.0 and r["cohens_kappa"] == 1.0
    assert r["p_chance"] == 0.5  # balanced 2x2 marginals

    # half the labels deliberately wrong: accuracy 0.5 == chance -> kappa 0
    r = run([(1, en, "en", "s", 1), (2, de, "de", "s", 1),
             (3, en, "de", "s", 1), (4, de, "en", "s", 1)])
    assert r["accuracy"] == 0.5
    assert r["cohens_kappa"] == 0.0
