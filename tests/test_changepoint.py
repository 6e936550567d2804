"""CUSUM change-point statistic (q_events_cusum_changepoint's closed form).

Pins: the windowed prefix-sum closed form equals the textbook recursion
c_t = max(0, c_{t-1} + dev_t), and the statistic actually detects an injected
sustained shift (accumulates after the change, stays near zero before).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Window, functions as F


def _cusum_df(spark, counts):
    rows = [
        ("s", datetime.date(2024, 1, 1) + datetime.timedelta(days=i), int(c))
        for i, c in enumerate(counts)
    ]
    d = spark.createDataFrame(rows, "event_type string, day date, n long")
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    s = d.withColumn(
        "dev",
        F.col("n").cast("double")
        - F.avg(F.col("n").cast("double")).over(wp) * F.lit(1.05),
    )
    r = s.withColumn("srun", F.sum("dev").over(wo))
    return r.select(
        "day",
        F.round(
            F.col("srun") - F.least(F.lit(0.0), F.min("srun").over(wo)), 6
        ).alias("cusum"),
    ).orderBy("day")


def _recursion(counts):
    mean = sum(counts) / len(counts)
    c, out = 0.0, []
    for x in counts:
        c = max(0.0, c + (x - mean * 1.05))
        out.append(round(c, 6))
    return out


def test_closed_form_equals_recursion(spark):
    counts = [100, 98, 103, 97, 101, 99, 140, 138, 145, 142, 139, 144]
    got = [r["cusum"] for r in _cusum_df(spark, counts).collect()]
    assert got == _recursion(counts)


def test_detects_injected_shift_and_flat_before(spark):
    counts = [100] * 10 + [130] * 10  # sustained +30% shift at day 10
    got = [r["cusum"] for r in _cusum_df(spark, counts).collect()]
    # before the shift the stat stays pinned at/near zero...
    assert all(c == 0.0 for c in got[:10])
    # ...after it, it accumulates monotonically
    post = got[10:]
    assert all(b > a for a, b in zip(post, post[1:]))
    assert post[-1] > 50


def test_ewma_closed_form_equals_recursion(spark):
    """q_events_ewma_smooth's prefix-scaled closed form (alpha=0.5, the
    dyadic alpha: every intermediate exact) == the textbook recursion."""
    counts = [100, 98, 103, 97, 140, 138, 145, 90, 200, 50]
    rows = [
        ("s", datetime.date(2024, 2, 1) + datetime.timedelta(days=i), int(c))
        for i, c in enumerate(counts)
    ]
    d = spark.createDataFrame(rows, "event_type string, day date, n long")
    wo = Window.partitionBy("event_type").orderBy("day")
    r = d.withColumn("i", F.row_number().over(wo).cast("long"))
    s = r.withColumn(
        "w",
        F.when(F.col("i") == 1, F.col("n").cast("double") / F.lit(0.5)).otherwise(
            F.lit(0.5) * F.col("n").cast("double") / F.pow(F.lit(0.5), F.col("i"))
        ),
    )
    got = [
        row["ewma"]
        for row in s.select(
            "day",
            (F.pow(F.lit(0.5), F.col("i")) * F.sum("w").over(wo)).alias("ewma"),
        )
        .orderBy("day")
        .collect()
    ]
    want, acc = [], None
    for x in counts:
        acc = float(x) if acc is None else 0.5 * x + 0.5 * acc
        want.append(acc)
    assert got == want  # EXACT equality — dyadic arithmetic, no tolerance


def test_pow_half_is_exact_power_of_two(spark):
    """The EWMA parity argument rests on pow(0.5, i) being the exact power of
    two in both engines; pin it across the operating range."""
    import duckdb

    got = (
        spark.range(1, 51)
        .select(F.pow(F.lit(0.5), F.col("id")).alias("p"))
        .collect()
    )
    assert [r["p"] for r in got] == [2.0**-i for i in range(1, 51)]
    duck = duckdb.connect().execute(
        "SELECT list(pow(CAST(0.5 AS DOUBLE), i) ORDER BY i) "
        "FROM generate_series(1, 50) t(i)"
    ).fetchone()[0]
    assert duck == [2.0**-i for i in range(1, 51)]


def test_acf_daily_matches_reference_and_finds_period(spark):
    """q_events_acf_daily's scaled-integer estimator == the textbook
    r_k = sum((x_t-m)(x_{t+k}-m)) / sum((x_t-m)^2) on a planted period-7
    series, which the lag-7 coefficient must single out."""
    import datetime

    from plenario_mapper_spark.plans.registry import QUERIES
    import plenario_mapper_spark.plans.pipeline_ops as P

    # 63 days, strong weekly rhythm + deterministic jitter
    xs = [100 + 40 * (1 if t % 7 in (0, 1) else -1) + (t * 13 % 5) for t in range(63)]
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t, x in enumerate(xs):
        for _ in range(x):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "click", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        for t in ("events",):
            df.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
        got = {r["lag"]: r for r in QUERIES["q_events_acf_daily"](spark, d).collect()}

    m = sum(xs) / len(xs)
    den = sum((x - m) ** 2 for x in xs)
    for k in range(1, 8):
        ref = sum((xs[t] - m) * (xs[t + k] - m) for t in range(len(xs) - k)) / den
        assert abs(got[k]["acf"] - ref) < 1e-6, (k, got[k]["acf"], ref)
        assert got[k]["n_pairs"] == 63 - k
    assert got[7]["acf"] > 0.8
    assert got[7]["acf"] > max(got[k]["acf"] for k in (1, 2, 3, 4, 5))


def test_ohlc_bars_hand_checked(spark):
    """Open/close follow the (ts, event_id) order including the same-ts
    tie; high/low/volume/sum over a hand-built two-bar day."""
    import datetime

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        # bar (2024-03-01, click): open=5 (earliest), close=2 (same-ts tie:
        # higher event_id wins last), high=9, low=1
        (1, d0, 7, "click", 5.0, "{}"),
        (0, d0 + datetime.timedelta(hours=1), 7, "click", 9.0, "{}"),
        (2, d0 + datetime.timedelta(hours=2), 7, "click", 1.0, "{}"),
        (3, d0 + datetime.timedelta(hours=3), 7, "click", 4.0, "{}"),
        (4, d0 + datetime.timedelta(hours=3), 7, "click", 2.0, "{}"),
        # bar (2024-03-01, view): single event -> open=high=low=close
        (5, d0, 8, "view", 3.5, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (str(r["day"]), r["event_type"]): r
            for r in QUERIES["q_events_ohlc_bars"](spark, d).collect()
        }
    click = got[("2024-03-01", "click")]
    assert (click["open"], click["high"], click["low"], click["close"]) == (
        5.0, 9.0, 1.0, 2.0,
    )
    assert click["n_events"] == 5 and click["sum_value"] == 21.0
    view = got[("2024-03-01", "view")]
    assert (view["open"], view["high"], view["low"], view["close"]) == (
        3.5, 3.5, 3.5, 3.5,
    )


def test_markov_transitions_hand_checked(spark):
    """Journeys a->b->a (user 1) and b->b (user 2): per-row conditionals
    sum to 1, journey boundaries emit no transition."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 5, 1)
    rows = [
        (1, d0, 1, "a", 0.0, "{}"),
        (2, d0 + datetime.timedelta(minutes=1), 1, "b", 0.0, "{}"),
        (3, d0 + datetime.timedelta(minutes=2), 1, "a", 0.0, "{}"),
        (4, d0, 2, "b", 0.0, "{}"),
        (5, d0 + datetime.timedelta(minutes=1), 2, "b", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["from_type"], r["to_type"]): r
            for r in QUERIES["q_events_markov_transitions"](spark, d).collect()
        }
    # transitions: a->b (u1), b->a (u1), b->b (u2); u1's last 'a' and u2's
    # last 'b' emit nothing
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "b")}
    assert got[("a", "b")]["n"] == 1 and got[("a", "b")]["p"] == 1.0
    assert got[("b", "a")]["p"] == 0.5 and got[("b", "b")]["p"] == 0.5
    assert got[("b", "b")]["self_loop"] == 1 and got[("b", "a")]["self_loop"] == 0
    assert got[("b", "a")]["from_total"] == 2


def test_fano_factor_classifies_arrival_processes(spark):
    """Constant series -> Fano 0; planted bursty series matches the
    textbook variance/mean computed independently."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    steady = [10] * 12
    bursty = [1, 1, 1, 40, 1, 1, 1, 1, 35, 1, 1, 1]
    for t, (a, b) in enumerate(zip(steady, bursty)):
        for _ in range(a):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "steady", 0.0, "{}")); eid += 1
        for _ in range(b):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "bursty", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            r["event_type"]: r
            for r in QUERIES["q_events_fano_burstiness"](spark, d).collect()
        }
    assert got["steady"]["fano"] == 0.0 and got["steady"]["mean_daily"] == 10.0
    n = len(bursty)
    m = sum(bursty) / n
    var = sum((x - m) ** 2 for x in bursty) / (n - 1)
    assert abs(got["bursty"]["fano"] - var / m) < 1e-6
    assert got["bursty"]["fano"] > 10  # unmistakably bursty


def test_dow_profile_strength_extremes(spark):
    """A pure weekday function of counts gives strength ~1; means match the
    planted shape and the dow convention is ISO Monday=0."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)  # a Monday
    shape = [10, 20, 30, 40, 50, 5, 2]  # Mon..Sun
    rows, eid = [], 0
    for t in range(28):  # four full weeks
        for _ in range(shape[t % 7]):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "e", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r["dow"]: r for r in QUERIES["q_events_dow_profile"](spark, d).collect()}
    assert sorted(got) == list(range(7))
    for dow, m in enumerate(shape):
        assert got[dow]["mean_count"] == float(m)
        assert got[dow]["n_days"] == 4
    # counts are an exact function of weekday -> all variance explained
    assert got[0]["seasonality_strength"] == 1.0


def test_forecast_error_seasonal_series_prefers_lag7(spark):
    """On a strict period-7 series the seasonal-naive error is 0 -> MASE 0;
    a drifting series scores lag-1 better (MASE > 1); first 7 days unscored."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    weekly = [5, 9, 13, 7, 11, 3, 2]
    for t in range(21):
        for _ in range(weekly[t % 7]):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "seasonal", 0.0, "{}")); eid += 1
        for _ in range(10 + t):  # steady drift: lag-1 err 1/day, lag-7 err 7/day
            rows.append((eid, base + datetime.timedelta(days=t), 1, "trend", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r["event_type"]: r for r in QUERIES["q_events_forecast_error"](spark, d).collect()}
    s, t = got["seasonal"], got["trend"]
    assert s["n_scored"] == 14 and t["n_scored"] == 14
    assert s["mae_seasonal"] == 0.0 and s["mase_seasonal_vs_naive"] == 0.0
    assert t["mae_naive"] == 1.0 and t["mae_seasonal"] == 7.0
    assert t["mase_seasonal_vs_naive"] == 7.0


def test_holt_trend_tracks_linear_series(spark):
    """On x_t = 10 + 5t Holt converges toward trend 5 and the one-step
    forecast approaches the true next value; a flat series keeps trend 0;
    recursion matches an independent Python reference exactly."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for t in range(20):
        for _ in range(10 + 5 * t):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "lin", 0.0, "{}")); eid += 1
        for _ in range(7):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "flat", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["event_type"], r["day_index"]): r
            for r in QUERIES["q_events_holt_trend"](spark, d).collect()
        }
    base_d = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    # independent reference
    l = b = None
    for t in range(20):
        x = float(10 + 5 * t)
        if l is None:
            l, b = x, 0.0
        else:
            ln = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (ln - l) + 0.5 * b
            l = ln
    last = got[("lin", base_d + 19)]
    assert abs(last["level"] - l) < 1e-6 and abs(last["trend"] - b) < 1e-6
    assert abs(last["trend"] - 5.0) < 0.2          # slope recovered
    assert abs(last["forecast_next"] - (10 + 5 * 20)) < 1.0
    flat = got[("flat", base_d + 19)]
    assert flat["level"] == 7.0 and flat["trend"] == 0.0
    assert str(flat["trend"]) == "0.0"  # -0.0 canonicalized


def test_peak_days_gap_and_plateau_rules(spark):
    """Strict extrema only: plateaus are neither; a calendar gap
    disqualifies both neighbors; boundaries are never extrema."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    # days 0..4 counts: 1, 5, 2, 2, 3 -> day1 peak, day2/3 plateau (neither)
    # then a GAP, then days 6..8: 9, 1, 9 -> day7 valley but day6/8 boundaries
    counts = {0: 1, 1: 5, 2: 2, 3: 2, 4: 3, 6: 9, 7: 1, 8: 9}
    rows, eid = [], 0
    for t, c in counts.items():
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(days=t), 1, "e", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        base_d = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
        got = {
            r["day_index"] - base_d: (r["is_peak"], r["is_valley"])
            for r in QUERIES["q_events_peak_days"](spark, d).collect()
        }
    assert got[1] == (1, 0)
    assert got[2] == (0, 0) and got[3] == (0, 0)  # plateau
    assert got[4] == (0, 0)  # right neighbor is a gap
    assert got[7] == (0, 1)
    assert got[0] == (0, 0) and got[8] == (0, 0)  # boundaries


def test_hourly_profile_recovers_planted_shape(spark):
    """A pure hour-of-day function over 3 days gives strength 1 and exact
    per-hour means; absent hours produce no cell (not a zero)."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    shape = {9: 10, 12: 30, 18: 5}
    rows, eid = [], 0
    for day in range(3):
        for h, c in shape.items():
            for _ in range(c):
                rows.append(
                    (eid, base + datetime.timedelta(days=day, hours=h), 1, "e", 0.0, "{}")
                ); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r["hour"]: r for r in QUERIES["q_events_hourly_profile"](spark, d).collect()}
    assert set(got) == set(shape)
    for h, c in shape.items():
        assert got[h]["mean_count"] == float(c) and got[h]["n_cells"] == 3
    assert got[9]["hour_strength"] == 1.0


def test_entropy_rate_extremes(spark):
    """A deterministic a->b->a chain has entropy rate 0 with positive
    state entropy; equal-marginal states must NOT collapse."""
    import datetime, math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: strict alternation a b a b ... (20 events)
    for i in range(20):
        rows.append(
            (eid, d0 + datetime.timedelta(minutes=i), 1, "a" if i % 2 == 0 else "b", 0.0, "{}")
        ); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        r = QUERIES["q_events_entropy_rate"](spark, d).collect()[0]
    assert r["entropy_rate"] == 0.0
    # marginals: a has 10 transitions out, b has 9 -> near-uniform H(pi)
    pa, pb = 10 / 19, 9 / 19
    ref = -(pa * math.log(pa) + pb * math.log(pb))
    assert abs(r["state_entropy"] - ref) < 1e-6
    assert r["predictability_ratio"] == 0.0
