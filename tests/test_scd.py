"""SCD2 dimension maintenance: version chains, no-op updates, point-in-time
read parity."""

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import scd as SCD


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _snap(dim):
    return sorted(
        (
            r["sensor"], r["unit"],
            str(r["effective_from"]), str(r["effective_to"]), r["is_current"],
        )
        for r in dim.collect()
    )


def test_init_collapses_consecutive_duplicates(spark):
    ups = _df(spark, [
        ("s1", "C", "2024-01-01 00:00:00"),
        ("s1", "C", "2024-01-02 00:00:00"),   # no change -> no version
        ("s1", "F", "2024-01-03 00:00:00"),
        ("s2", "K", "2024-01-01 00:00:00"),
    ], "sensor string, unit string, ts string")
    dim = SCD.scd2_init(ups, "sensor", ["unit"], "ts")
    assert _snap(dim) == [
        ("s1", "C", "2024-01-01 00:00:00", "2024-01-03 00:00:00", False),
        ("s1", "F", "2024-01-03 00:00:00", "None", True),
        ("s2", "K", "2024-01-01 00:00:00", "None", True),
    ]


def test_merge_change_noop_newkey_and_chain(spark):
    base = SCD.scd2_init(_df(spark, [
        ("s1", "C", "2024-01-01 00:00:00"),
        ("s2", "K", "2024-01-01 00:00:00"),
        ("s3", "C", "2024-01-01 00:00:00"),
    ], "sensor string, unit string, ts string"), "sensor", ["unit"], "ts")
    batch = _df(spark, [
        ("s1", "F", "2024-02-01 00:00:00"),   # change -> close + open
        ("s2", "K", "2024-02-01 00:00:00"),   # no-op
        ("s4", "Pa", "2024-02-01 00:00:00"),  # new key
        ("s3", "F", "2024-02-01 00:00:00"),   # chain: two changes in one batch
        ("s3", "K", "2024-02-02 00:00:00"),
    ], "sensor string, unit string, ts string")
    out = SCD.scd2_merge(base, batch, "sensor", ["unit"], "ts")
    assert _snap(out) == [
        ("s1", "C", "2024-01-01 00:00:00", "2024-02-01 00:00:00", False),
        ("s1", "F", "2024-02-01 00:00:00", "None", True),
        ("s2", "K", "2024-01-01 00:00:00", "None", True),
        ("s3", "C", "2024-01-01 00:00:00", "2024-02-01 00:00:00", False),
        ("s3", "F", "2024-02-01 00:00:00", "2024-02-02 00:00:00", False),
        ("s3", "K", "2024-02-02 00:00:00", "None", True),
        ("s4", "Pa", "2024-02-01 00:00:00", "None", True),
    ]
    # exactly one current row per key, half-open intervals abut exactly
    cur = out.filter(F.col("is_current")).groupBy("sensor").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_merge_rejects_out_of_order_update(spark):
    base = SCD.scd2_init(_df(spark, [
        ("s1", "F", "2024-02-01 00:00:00"),
    ], "sensor string, unit string, ts string"), "sensor", ["unit"], "ts")
    stale = _df(spark, [
        ("s1", "C", "2024-01-15 00:00:00"),   # before current effective_from
    ], "sensor string, unit string, ts string")
    out = SCD.scd2_merge(base, stale, "sensor", ["unit"], "ts")
    assert _snap(out) == [("s1", "F", "2024-02-01 00:00:00", "None", True)]


def test_point_in_time_join_reads_the_right_version(spark):
    """The read-side contract: facts joined on key within the half-open
    validity window see exactly the version live at event time."""
    dim = SCD.scd2_init(_df(spark, [
        ("s1", "C", "2024-01-01 00:00:00"),
        ("s1", "F", "2024-01-10 00:00:00"),
    ], "sensor string, unit string, ts string"), "sensor", ["unit"], "ts")
    facts = _df(spark, [
        ("s1", "2024-01-05 00:00:00"),
        ("s1", "2024-01-10 00:00:00"),   # boundary: new version is inclusive-from
        ("s1", "2024-01-20 00:00:00"),
    ], "sensor string, ts string")
    got = sorted(
        (str(r["ts"]), r["unit"])
        for r in facts.join(
            dim,
            (facts.sensor == dim.sensor)
            & (facts.ts >= dim.effective_from)
            & (facts.ts < F.coalesce(dim.effective_to, F.lit("9999-01-01").cast("timestamp"))),
        ).collect()
    )
    assert got == [
        ("2024-01-05 00:00:00", "C"),
        ("2024-01-10 00:00:00", "F"),
        ("2024-01-20 00:00:00", "F"),
    ]


def test_merge_equals_init_property(spark):
    """merge(init(first), second) == init(all) for randomized update streams
    split at every possible cutoff — the invariant the q_scd2_versions driver
    row certifies at sf0.01, pinned here on a stream with ties, no-ops, and
    multi-key chains. One batched Spark comparison per cutoff."""
    import random

    rng = random.Random(13)
    keys = ["s1", "s2", "s3"]
    units = ["C", "F", "K"]
    rows = []
    for day in range(1, 13):
        for k in keys:
            if rng.random() < 0.7:
                rows.append((k, rng.choice(units), f"2024-01-{day:02d} 00:00:00"))
    # a same-timestamp tie for one key (attr-ordered deterministically)
    rows += [("s1", "C", "2024-01-05 12:00:00"), ("s1", "F", "2024-01-05 12:00:00")]
    ups = _df(spark, rows, "sensor string, unit string, ts string")
    want = _snap(SCD.scd2_init(ups, "sensor", ["unit"], "ts"))
    for cutoff in ("2024-01-03", "2024-01-05 12:00:00", "2024-01-09"):
        cut = F.lit(cutoff).cast("timestamp")
        dim = SCD.scd2_init(ups.filter(F.col("ts") < cut), "sensor", ["unit"], "ts")
        merged = SCD.scd2_merge(
            dim, ups.filter(F.col("ts") >= cut), "sensor", ["unit"], "ts"
        )
        assert _snap(merged) == want, cutoff
