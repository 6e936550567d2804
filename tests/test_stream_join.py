"""Stream-stream event-time join (streaming/stream_join): the native
watermarked two-stream inner join certified against its bounded batch twin,
plus the state-pruning contract (both watermarks + the time-range condition
must be declared or Spark cannot bound the buffers)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.plans.relational import normalize_event_ts
from plenario_mapper_spark.streaming.stream_join import (
    attributed_pairs_batch,
    attributed_pairs_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return normalize_event_ts(raw).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _stage(df, tmp_path, name, n_files=3):
    """Flat parquet files replayed as micro-batches IN EVENT-TIME ORDER —
    the arrival pattern watermarks model. A random split would deliver
    hours-old rows after the watermark advanced past them, and the join
    would (correctly, per late-data semantics) drop them."""
    from pyspark.sql import Window

    in_dir = str(tmp_path / name)
    os.makedirs(in_dir)
    chunked = df.withColumn(
        "_chunk", F.ntile(n_files).over(Window.orderBy("ts"))
    )
    for i in range(1, n_files + 1):
        staged = str(tmp_path / f"{name}_stage{i}")
        chunked.filter(F.col("_chunk") == i).drop("_chunk").coalesce(1).write.parquet(
            staged
        )
        part = next(p for p in os.listdir(staged) if p.endswith(".parquet"))
        shutil.copy(os.path.join(staged, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def test_stream_join_matches_batch_twin(spark, events, tmp_path):
    want = {
        (r["click_id"], r["purchase_id"])
        for r in attributed_pairs_batch(events, 60).collect()
    }
    assert want, "no click->purchase pairs within the horizon — test is vacuous"

    schema = events.schema
    click_dir = _stage(events.filter("event_type = 'click'"), tmp_path, "clicks")
    buy_dir = _stage(events.filter("event_type = 'purchase'"), tmp_path, "buys")
    cs = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(click_dir)
    )
    ps = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(buy_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        attributed_pairs_stream(cs, ps, 60)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want


def test_stream_join_declares_watermarks_and_outer_requires_them(
    spark, events, tmp_path
):
    """The state-bound declarations are load-bearing: (a) the operator's
    plan must carry BOTH EventTimeWatermark nodes (an inner join without
    them is silently UNBOUNDED-state — Spark allows it, so only this pin
    catches a refactor dropping one); (b) Spark itself enforces the
    contract on outer joins — a left-outer without watermarks is rejected,
    pinning that the range condition + watermark pair is what makes outer
    results decidable at all."""
    schema = events.schema
    click_dir = _stage(events.filter("event_type = 'click'"), tmp_path, "c2")
    buy_dir = _stage(events.filter("event_type = 'purchase'"), tmp_path, "b2")
    cs = spark.readStream.schema(schema).parquet(click_dir)
    ps = spark.readStream.schema(schema).parquet(buy_dir)

    joined = attributed_pairs_stream(cs, ps, 60)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan

    from plenario_mapper_spark.streaming.stream_join import _sides

    clicks, _, cond = _sides(cs, 60)
    _, purchases, _ = _sides(ps, 60)
    bare = clicks.join(purchases, cond, "left_outer")  # no watermarks
    with pytest.raises(Exception, match="[Ww]atermark"):
        q = (
            bare.writeStream.format("parquet")
            .option("path", str(tmp_path / "out2"))
            .option("checkpointLocation", str(tmp_path / "chk2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
