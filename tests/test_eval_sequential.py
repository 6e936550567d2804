"""Independent-reference pins for the r10 sequential/stratified eval family
(H151-H156): Wilcoxon signed-rank, IPW ATE, CMH pooled odds, SPRT walk,
group k-fold integrity, delete-one-bucket jackknife.

Each test rebuilds the statistic in plain Python from first principles (the
oracle gate already proves Spark == DuckDB; these prove both engines encode
the RIGHT formula, the test_eval_metrics discipline)."""

import datetime
import hashlib
import math
import os
import tempfile

import pytest

from plenario_mapper_spark.plans.registry import QUERIES

D0 = datetime.datetime(2024, 1, 1)
D1 = datetime.datetime(2024, 1, 9)  # far side of the midpoint split

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _run(spark, rows, qname):
    df = spark.createDataFrame(rows, SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        return QUERIES[qname](spark, d).collect()


def _purchase_pair_rows(per_user_pre_post):
    """events rows giving each user one pre purchase of `pre` and one post
    purchase of `post` (plus boundary anchor events so the min/max split
    midpoint is stable regardless of the purchase values)."""
    rows, eid = [], 0
    rows.append((eid, D0, 9990, "view", 0.0, "{}")); eid += 1
    rows.append((eid, D1, 9990, "view", 0.0, "{}")); eid += 1
    for uid, (pre, post) in per_user_pre_post.items():
        rows.append((eid, D0, uid, "purchase", pre, "{}")); eid += 1
        rows.append((eid, D1, uid, "purchase", post, "{}")); eid += 1
    return rows


def test_wilcoxon_matches_python_reference(spark):
    """Ties included (two users share |d|); zero difference dropped."""
    pairs = {
        1: (10.0, 13.0),   # d = +3
        2: (10.0, 7.0),    # d = -3 (tie in |d| with user 1)
        3: (5.0, 10.0),    # d = +5
        4: (8.0, 8.0),     # d = 0 -> dropped
        5: (20.0, 21.0),   # d = +1
        6: (9.0, 17.0),    # d = +8
    }
    [row] = _run(spark, _purchase_pair_rows(pairs), "q_eval_wilcoxon_signed_rank")

    # independent reference: average-rank Wilcoxon with tie correction
    ds = [int(round((b - a) * 1e6)) for a, b in pairs.values()]
    ds = [d for d in ds if d != 0]
    n = len(ds)
    srt = sorted(abs(d) for d in ds)
    ranks = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        ranks[srt[i]] = (i + 1 + j) / 2  # average of positions i+1..j
        i = j
    w_plus = sum(ranks[abs(d)] for d in ds if d > 0)
    tie = 0
    for v in set(srt):
        t = srt.count(v)
        tie += t**3 - t
    var = (2 * n * (n + 1) * (2 * n + 1) - tie) / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)

    assert row["n_pairs"] == n == 5
    assert row["w_plus"] == pytest.approx(w_plus)
    assert row["z_stat"] == pytest.approx(z, abs=1e-6)
    assert row["significant"] == (1 if abs(z) > 1.96 else 0)


def test_sprt_integer_walk_boundaries(spark):
    """Variant 0: 5 straight successes -> accept_h1 exactly at n=5.
    Variant 1: 5 straight failures -> accept_h0 exactly at n=5; later
    observations cannot un-decide (first crossing wins)."""
    rows, eid = [], 0
    for k in range(5):
        ts = D0 + datetime.timedelta(hours=k)
        rows.append((eid, ts, 0, "purchase", 200.0, "{}")); eid += 1  # >=150
        rows.append((eid, ts, 1, "purchase", 10.0, "{}")); eid += 1   # <150
    # post-decision noise: a failure for v0, a success for v1
    rows.append((eid, D1, 0, "purchase", 10.0, "{}")); eid += 1
    rows.append((eid, D1, 1, "purchase", 200.0, "{}")); eid += 1
    got = {r["variant"]: r for r in _run(spark, rows, "q_eval_sprt_decision")}
    assert got[0]["decision"] == "accept_h1" and got[0]["n_at_decision"] == 5
    assert got[1]["decision"] == "accept_h0" and got[1]["n_at_decision"] == 5
    assert got[0]["n_obs"] == 6 and got[0]["walk_final"] == 4
    assert got[1]["n_obs"] == 6 and got[1]["walk_final"] == -4


def test_sprt_continue_when_no_crossing(spark):
    rows = [
        (0, D0, 0, "purchase", 200.0, "{}"),
        (1, D0 + datetime.timedelta(hours=1), 0, "purchase", 10.0, "{}"),
    ]
    [row] = _run(spark, rows, "q_eval_sprt_decision")
    assert row["decision"] == "continue" and row["n_at_decision"] is None


def _u32(salt, key):
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:8], 16)


def test_group_kfold_matches_md5_and_is_intact(spark):
    rows, eid = [], 0
    for uid in range(30):
        for k in range(3):  # 3 events per user, all must share the fold
            ts = D0 + datetime.timedelta(hours=eid)
            rows.append((eid, ts, uid, "view", float(uid), "{}")); eid += 1
    got = _run(spark, rows, "q_sample_group_kfold")
    assert all(r["groups_intact"] == 1 for r in got)
    # per-fold user counts match an independent md5 assignment
    import collections

    want = collections.Counter(_u32("gkf0", uid) % 5 for uid in range(30))
    got_users = {r["fold"]: r["n_users"] for r in got}
    assert got_users == dict(want)
    assert sum(r["n_events"] for r in got) == 90


def test_jackknife_matches_python_reference(spark):
    rows, eid = [], 0
    vals = {}
    for uid in range(12):
        v = 10.0 + 3.0 * uid
        vals[uid] = v
        rows.append((eid, D0, uid, "purchase", v, "{}")); eid += 1
    [row] = _run(spark, rows, "q_eval_jackknife_ratio_ci")

    # independent reference with the same md5 buckets
    import collections

    buckets = collections.defaultdict(list)
    for uid, v in vals.items():
        buckets[_u32("jk0", uid) % 20].append(int(round(v * 1e6)))
    per = {b: (len(xs), sum(xs)) for b, xs in buckets.items()}
    n_tot = sum(n for n, _ in per.values())
    s_tot = sum(s for _, s in per.values())
    ok = {b: (n, s) for b, (n, s) in per.items() if n_tot > n}
    g = len(ok)
    theta = s_tot / n_tot
    ps = [
        g * theta - (g - 1) * ((s_tot - s) / (n_tot - n))
        for _, (n, s) in sorted(ok.items())
    ]
    pbar = sum(ps) / g
    sq = sum((p - pbar) ** 2 for p in ps)
    se = math.sqrt(sq / (g * (g - 1)))

    assert row["g_buckets"] == g
    assert row["theta"] == pytest.approx(theta / 1e6, abs=1e-6)
    assert row["theta_jack"] == pytest.approx(pbar / 1e6, abs=1e-6)
    assert row["se_jack"] == pytest.approx(se / 1e6, abs=1e-6)
    assert row["ci_lo"] == pytest.approx((pbar - 1.96 * se) / 1e6, abs=1e-6)
    assert row["ci_hi"] == pytest.approx((pbar + 1.96 * se) / 1e6, abs=1e-6)


def test_cmh_matches_python_reference(spark):
    """Users engineered so strata hold known 2x2 tables; reference CMH OR
    and chi-square coded independently."""
    rows, eid = [], 0
    # user u: stratum = u % 5, exposure = (u // 5) % 2, outcome = >=2 purchases
    # 40 users; outcome set when (u * 7) % 3 == 0 (arbitrary deterministic mix)
    outcomes = {}
    for uid in range(40):
        n_purch = 2 if (uid * 7) % 3 == 0 else 1
        outcomes[uid] = 1 if n_purch >= 2 else 0
        for k in range(n_purch):
            ts = D0 + datetime.timedelta(hours=eid)
            rows.append((eid, ts, uid, "purchase", 5.0, "{}")); eid += 1
    [row] = _run(spark, rows, "q_eval_cmh_odds")

    import collections

    tab = collections.defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for uid, y in outcomes.items():
        s, t = uid % 5, (uid // 5) % 2
        idx = 0 if (t, y) == (1, 1) else 1 if (t, y) == (1, 0) else 2 if (t, y) == (0, 1) else 3
        tab[s][idx] += 1
    s_ad = s_bc = s_dev = s_v = 0.0
    n_strata = n_users = 0
    for s in sorted(tab):
        a, b, c, d = tab[s]
        n = a + b + c + d
        if n < 2:
            continue
        n_strata += 1
        n_users += n
        s_ad += a * d / n
        s_bc += b * c / n
        s_dev += a - (a + b) * (a + c) / n
        s_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    assert row["n_strata"] == n_strata and row["n_users"] == n_users
    assert row["cmh_or"] == pytest.approx(s_ad / s_bc, abs=1e-6)
    assert row["cmh_chi2"] == pytest.approx(s_dev * s_dev / s_v, abs=1e-6)


def test_ipw_matches_python_reference(spark):
    """Cells with a missing arm are dropped and counted; the estimate
    matches a plain-Python Hajek/IPW with cell-exact propensities."""
    rows, eid = [], 0
    # pre-period activity drives the cell; post-period purchases the outcome
    pre_counts = {uid: (uid % 4) + 1 for uid in range(16)}  # cells spread
    post_vals = {uid: 50.0 + uid for uid in range(16)}
    for uid in range(16):
        for k in range(pre_counts[uid]):
            ts = D0 + datetime.timedelta(minutes=eid)
            rows.append((eid, ts, uid, "view", 1.0, "{}")); eid += 1
        rows.append((eid, D1, uid, "purchase", post_vals[uid], "{}")); eid += 1
    got = _run(spark, rows, "q_eval_ipw_ate")
    [row] = got

    import collections

    cells = collections.defaultdict(list)
    for uid in range(16):
        cell = min(4, len(bin(pre_counts[uid])) - 2)  # bit_length
        t = uid % 2
        y = int(round(post_vals[uid] * 1e6))
        cells[cell].append((t, y))
    est, dropped = {}, 0
    for c, rows_ in cells.items():
        n = len(rows_)
        n1 = sum(t for t, _ in rows_)
        if n1 == 0 or n - n1 == 0:
            dropped += 1
            continue
        sy1 = sum(y for t, y in rows_ if t == 1)
        sy0 = sum(y for t, y in rows_ if t == 0)
        est[c] = (n, n1, sy1, sy0)
    big_n = sum(n for n, _, _, _ in est.values())
    num1 = sum(n * sy1 / n1 for n, n1, sy1, _ in est.values())
    num0 = sum(n * sy0 / (n - n1) for n, n1, _, sy0 in est.values())
    ate = (num1 - num0) / big_n / 1e6
    props = [n1 / n for n, n1, _, _ in est.values()]

    assert row["n_users"] == 16
    assert row["n_cells_est"] == len(est)
    assert row["n_cells_dropped"] == dropped
    assert row["prop_min"] == pytest.approx(min(props), abs=1e-6)
    assert row["prop_max"] == pytest.approx(max(props), abs=1e-6)
    assert row["ate_ipw"] == pytest.approx(ate, abs=1e-6)
