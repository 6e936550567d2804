"""Salted skew helpers: row-identical to their unsalted equivalents."""

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import skew as SK

SF_DIR = "/root/testdata/sf0.001"


def test_salted_inner_join_matches_plain(spark):
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    r = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = l.join(r, ["l_orderkey"]).groupBy("l_orderkey").count()
    salted = SK.salted_join(l, r, ["l_orderkey"], salt=8).groupBy(
        "l_orderkey"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    l = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    r = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    got = sorted(
        (row["k"], row["v"], row["w"])
        for row in SK.salted_join(l, r, ["k"], how="left", salt=4).collect()
    )
    assert got == [(1, "a", "x"), (1, "b", "x"), (2, "c", "y"), (3, "d", None)]


def test_salted_collect_list_same_multiset(spark):
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k int, v int"
    )
    got = {
        r["k"]: sorted(r["values"])
        for r in SK.salted_collect_list(df, ["k"], "v", salt=8).collect()
    }
    want = {
        r["k"]: sorted(r["vals"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vals")).collect()
    }
    assert got == want


def test_deterministic_split_partitions_domain_and_is_append_stable(spark):
    """Every row lands in exactly one split; fractions land near targets; and
    assignment is a pure function of the key — re-running on any subset
    (append simulation) never migrates a row."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.operators.sampling import deterministic_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = deterministic_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="x")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 1500 < counts["train"] < 1700  # ~1600 expected, binomial noise
    # append stability: the first half alone gets identical assignments
    first = deterministic_split(
        df.filter(F.col("k") < 1000), "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="x"
    )
    full = {r["k"]: r["split"] for r in out.filter(F.col("k") < 1000).collect()}
    sub = {r["k"]: r["split"] for r in first.collect()}
    assert full == sub


def test_split_thresholds_validates_fractions(spark):
    import pytest as _pytest

    from plenario_mapper_spark.operators.sampling import split_thresholds

    with _pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_deterministic_split_null_key_is_deterministic_sentinel(spark):
    """NULL keys hash the explicit '<null>' sentinel (engine-mirrorable),
    matching md5('x|<null>') — not concat_ws's silent null-drop."""
    import hashlib

    from pyspark.sql import functions as F

    from plenario_mapper_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(None,), (1,)], "k long")
    out = {("null" if r["k"] is None else r["k"]): r["split"]
           for r in deterministic_split(df, "k", {"a": 0.5, "b": 0.5}, salt="x").collect()}
    h = int(hashlib.md5(b"x|<null>").hexdigest()[:8], 16)
    expected = "a" if h < (1 << 31) else "b"
    assert out["null"] == expected


def test_split_bands_partition_domain_property(spark):
    """Property (hypothesis): for random split specs, the cumulative bands
    exactly tile the 32-bit domain — no gap, no overlap, monotone bounds —
    so every hash value maps to exactly one split."""
    from hypothesis import given, settings, strategies as st

    from plenario_mapper_spark.operators.sampling import split_thresholds

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
            min_size=1,
            max_size=6,
        )
    )
    def check(raw):
        total = sum(raw)
        fracs = {f"s{i}": v / total for i, v in enumerate(raw)}
        # normalize rounding drift so the contract precondition holds
        fracs[f"s{len(raw)-1}"] += 1.0 - sum(fracs.values())
        bounds = split_thresholds(fracs)
        uppers = [b for _, b in bounds]
        assert uppers == sorted(uppers)
        assert uppers[-1] == 1 << 32
        assert all(0 <= b <= 1 << 32 for b in uppers)
        assert len({n for n, _ in bounds}) == len(bounds)

    check()


def test_deterministic_sample_fraction_edges(spark):
    """fraction=0 keeps nothing, fraction=1 keeps everything — the integer
    gate has no floating-point boundary to leak a row at either extreme."""
    from plenario_mapper_spark.operators.sampling import deterministic_sample

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    assert deterministic_sample(df, "k", 0.0).count() == 0
    assert deterministic_sample(df, "k", 1.0).count() == 500


def test_gap_fill_per_series_span_and_forward_fill(spark):
    """Gap-fill semantics on a hand-built two-series frame: the grid is each
    series' OWN [min, max] span (series b does not inherit series a's range),
    synthesized buckets carry n_events=0 / is_gap=true, and the filled value
    is the last OBSERVED hourly sum, carried across consecutive gaps."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.plans import QUERIES

    e = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 00:40:00", 2.0),
            # hours 01 and 02 missing for series a
            ("a", "2024-01-01 03:05:00", 7.0),
            ("b", "2024-01-01 02:00:00", 5.0),
        ],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # drive the registered plan against a temp parquet dir shaped like a sf dir
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        e.write.parquet(os.path.join(d, "events.parquet"))
        rows = {
            (r["event_type"], str(r["bucket"])): r
            for r in QUERIES["q_events_gap_fill"](spark, d).collect()
        }
    # series a: 4 buckets (00..03), two synthesized
    a_keys = sorted(k for k in rows if k[0] == "a")
    assert len(a_keys) == 4
    g1 = rows[("a", "2024-01-01 01:00:00")]
    g2 = rows[("a", "2024-01-01 02:00:00")]
    assert g1["is_gap"] and g2["is_gap"]
    assert g1["n_events"] == 0 and g2["n_events"] == 0
    assert g1["filled_value"] == 3.0 and g2["filled_value"] == 3.0
    assert rows[("a", "2024-01-01 03:00:00")]["filled_value"] == 7.0
    # series b: exactly its own single bucket — no inherited span
    assert sorted(k for k in rows if k[0] == "b") == [("b", "2024-01-01 02:00:00")]
    assert not rows[("b", "2024-01-01 02:00:00")]["is_gap"]


def test_hll_rollup_merge_is_lossless_and_bounded(spark):
    """The sketch rollup's contract: (a) union-merging per-day sketches gives
    the SAME estimate as sketching the whole stream directly (Datasketches
    HLL merge is lossless at equal lgConfigK) — serving coarse windows from
    the persisted daily rollup sacrifices nothing; (b) the estimate is
    within HLL's error bound of the exact distinct count."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from plenario_mapper_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    e = spark.read.parquet(os.path.join(sf, "events.parquet"))
    from plenario_mapper_spark.plans.relational import _events

    en = _events(spark, sf)
    rollup = {
        r["event_type"]: r["est"]
        for r in en.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    # the registry query certifies the band in its driver-checkable output
    assert {
        r["est_in_band"] for r in QUERIES["q_agg_hll_rollup"](spark, sf).collect()
    } == {1}
    direct = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert rollup == direct  # lossless merge, bit-identical estimates
    for et, est in rollup.items():
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])


def test_weighted_resample_updown_semantics(spark):
    """floor(w) copies always; the fractional copy by hash gate; w=0 drops;
    determinism under repartitioning; expectation tracks w."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.operators.sampling import weighted_resample

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 500, 0.0)
        .when(F.col("id") < 1000, 0.5)
        .when(F.col("id") < 1500, 1.0)
        .otherwise(2.5)
        .alias("w"),
    )
    out = weighted_resample(df, "k", "w", salt="t")
    counts = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    # w=0: dropped entirely
    assert all(k >= 500 for k in counts)
    # w=1: exactly one copy each
    assert all(counts[k] == 1 for k in range(1000, 1500))
    # w=2.5: two or three copies, mean near 2.5
    c25 = [counts[k] for k in range(1500, 2000)]
    assert set(c25) <= {2, 3}
    assert 2.3 < sum(c25) / len(c25) < 2.7
    # w=0.5: 0 or 1, keep-rate near half
    kept_half = sum(1 for k in range(500, 1000) if k in counts)
    assert 200 < kept_half < 300
    # copy_idx makes repeats distinct
    assert out.select("k", "copy_idx").distinct().count() == out.count()
    # pure function of (salt, key): same multiset after a repartition
    out2 = weighted_resample(df.repartition(13), "k", "w", salt="t")
    a = sorted(map(tuple, out.select("k", "copy_idx").collect()))
    b = sorted(map(tuple, out2.select("k", "copy_idx").collect()))
    assert a == b


def _audit_row(spark, rows):
    d = spark.createDataFrame(rows, "k string")
    return SK.key_skew_audit(d, "k", top_k=2).collect()[0]


def test_key_skew_audit_uniform_histogram(spark):
    """Uniform counts: gini exactly 0, hhi exactly 1/n_keys."""
    r = _audit_row(spark, [(k,) for k in "aabbccdd"])
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (8, 4, 2)
    assert r["gini"] == 0.0 and str(r["gini"]) == "0.0"  # -0.0 canonicalized
    assert r["hhi"] == 0.25
    assert r["max_over_avg"] == 1.0
    assert r["top1_share"] == 0.25
    assert r["topk_share"] == 0.5


def test_key_skew_audit_matches_python_reference(spark):
    """Skewed histogram vs an independently-coded reference."""
    rows = [("hot",)] * 60 + [("warm",)] * 25 + [("c",)] * 10 + [("d",)] * 4 + [("e",)]
    r = _audit_row(spark, rows)
    counts = sorted([60, 25, 10, 4, 1])
    n_tot, n_keys = sum(counts), len(counts)
    hhi = sum(c * c for c in counts) / (n_tot * n_tot)
    gini = 2.0 * sum(i * c for i, c in enumerate(counts, 1)) / (
        n_keys * n_tot
    ) - (n_keys + 1) / n_keys
    assert r["n_rows"] == n_tot and r["n_keys"] == n_keys
    assert r["max_count"] == 60
    assert abs(r["hhi"] - hhi) < 1e-6
    assert abs(r["gini"] - gini) < 1e-6
    assert r["top1_share"] == 0.6
    assert r["topk_share"] == 0.85  # top_k=2 -> 60 + 25


def test_key_skew_audit_gini_tie_order_invariant(spark):
    """Equal counts occupy a rank block; any within-block order yields the
    same sum(i*c) — append order must not change the audit."""
    a = _audit_row(spark, [(k,) for k in "abcabcab"])
    b = _audit_row(spark, [(k,) for k in "bacbacba"])
    assert tuple(a) == tuple(b)
