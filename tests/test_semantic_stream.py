"""Stream-time semantic dedup (streaming/semantic_stream.SemanticDedupStream):
the greedy keep-first fold driven by a real Structured Streaming file source,
certified against the one-shot greedy twin, plus the replayed-micro-batch
idempotency the at-least-once foreachBatch contract requires, plus the state
cost shape (dropped docs never stored; untouched clusters never read)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import similarity as SIM
from plenario_mapper_spark.streaming.semantic_stream import SemanticDedupStream

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = 0.4  # the corpus' populated band (max pairwise cos ~0.51)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _verdict_map(df):
    return {r["vec_id"]: (r["assigned_cid"], r["is_kept"]) for r in df.collect()}


def _stage_batches(corpus, tmp_path, bounds):
    """One flat parquet file per batch so the file source delivers them as
    ordered micro-batches (ids monotone across batches — the contract under
    which stream == one-shot greedy)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, (lo, hi) in enumerate(bounds):
        stage = str(tmp_path / f"stage{i}")
        corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def test_semantic_stream_matches_oneshot_greedy_and_replays(
    spark, embeddings, tmp_path
):
    corpus = embeddings.filter(F.col("vec_id") < 150).select("vec_id", "embedding")
    cent = SIM.label_centroids(embeddings)  # the q_embed_semantic_dedup geometry
    in_dir = _stage_batches(corpus, tmp_path, [(0, 50), (50, 100), (100, 150)])

    stream = SemanticDedupStream(
        spark, str(tmp_path / "state"), centroids=cent, threshold=THRESHOLD
    )
    src = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream.start(src, str(tmp_path / "chk"))
    q.awaitTermination()

    got = _verdict_map(
        stream.decisions().select(
            F.col("id").alias("vec_id"), "assigned_cid", "is_kept"
        )
    )
    want = _verdict_map(SIM.semantic_dedup_greedy(corpus, cent, THRESHOLD))
    assert got == want and len(got) == 150
    assert any(not kept for _, kept in got.values()), (
        "no drops at this threshold — the test exercises nothing"
    )

    # state cost shape: ONLY kept docs are stored as representatives
    kept_ids = {r["id"] for r in stream.kept().collect()}
    assert kept_ids == {i for i, (_, k) in got.items() if k}

    # at-least-once replay: re-deliver the LAST micro-batch with its original
    # batch_id — verdicts and kept state must be content-identical after
    last = corpus.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    stream.process_batch(last, 2)
    assert _verdict_map(
        stream.decisions().select(
            F.col("id").alias("vec_id"), "assigned_cid", "is_kept"
        )
    ) == want
    assert {r["id"] for r in stream.kept().collect()} == kept_ids
    n_rows = stream.decisions().count()
    assert n_rows == 150  # no duplicate verdict rows after replay


def test_semantic_stream_restart_reattaches_and_guards_centroids(
    spark, embeddings, tmp_path
):
    corpus = embeddings.filter(F.col("vec_id") < 60).select("vec_id", "embedding")
    cent = SIM.label_centroids(embeddings)
    state = str(tmp_path / "state")
    s1 = SemanticDedupStream(spark, state, centroids=cent, threshold=THRESHOLD)
    s1.process_batch(corpus.filter(F.col("vec_id") < 30), 0)

    # restart WITHOUT centroids: reattaches to the persisted table and the
    # second half folds in exactly as if the stream never stopped
    s2 = SemanticDedupStream(spark, state, threshold=THRESHOLD)
    s2.process_batch(corpus.filter(F.col("vec_id") >= 30), 1)
    got = _verdict_map(
        s2.decisions().select(F.col("id").alias("vec_id"), "assigned_cid", "is_kept")
    )
    want = _verdict_map(SIM.semantic_dedup_greedy(corpus, cent, THRESHOLD))
    assert got == want

    # a DIFFERENT centroid set is refused — cluster geometry is immutable
    other = cent.withColumn("cid", F.col("cid") + 100)
    with pytest.raises(ValueError, match="immutable"):
        SemanticDedupStream(spark, state, centroids=other, threshold=THRESHOLD)

    # first init without centroids is refused too
    with pytest.raises(ValueError, match="first init"):
        SemanticDedupStream(spark, str(tmp_path / "fresh"), threshold=THRESHOLD)


def test_greedy_rekeeps_chain_tail_unlike_droprule(spark):
    """The documented greedy-vs-droprule divergence, pinned: for a chain
    a~b~c with a~c below threshold, greedy re-keeps c (its only kept
    neighbor a is far), while semantic_dedup's any-smaller-id rule drops c
    (b is a smaller-id neighbor regardless of b's own fate)."""
    import math

    # unit vectors in the plane: angles chosen so cos(a,b)=cos(b,c)~0.87
    # (>= 0.8) and cos(a,c)~0.5 (< 0.8); one shared centroid
    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)] + [0.0] * 62

    items = spark.createDataFrame(
        [(1, vec(0.0)), (2, vec(30.0)), (3, vec(60.0))],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(0, vec(30.0))], "cid long, centroid array<double>"
    )
    greedy = _verdict_map(SIM.semantic_dedup_greedy(items, cent, 0.8))
    droprule = _verdict_map(SIM.semantic_dedup(items, cent, 0.8))
    assert greedy[1][1] and not greedy[2][1] and greedy[3][1]
    assert droprule[1][1] and not droprule[2][1] and not droprule[3][1]


def test_kept_state_prunes_untouched_cluster_buckets(spark, embeddings, tmp_path):
    """The probe's file-level pruning contract: a batch that touches one
    cluster bucket must not read other buckets' state files. Pinned on the
    partition layout (kept/batch_id=N/cb=X) plus the isin filter reaching
    the scan as a partition filter."""
    corpus = embeddings.filter(F.col("vec_id") < 40).select("vec_id", "embedding")
    cent = SIM.label_centroids(embeddings)
    state = str(tmp_path / "state")
    s = SemanticDedupStream(spark, state, centroids=cent, threshold=THRESHOLD)
    s.process_batch(corpus, 0)
    # layout: batch dir holds one cb=X dir per touched bucket
    b0 = os.path.join(state, "kept", "batch_id=0")
    cbs = sorted(d for d in os.listdir(b0) if d.startswith("cb="))
    assert len(cbs) >= 1
    # the kept() reader exposes cb so process_batch's isin([...]) filter is
    # a partition-column comparison -> PartitionFilters at the scan (file
    # pruning), never a post-scan row filter. inputFiles() can't see pruning
    # (it lists the whole relation), so pin the executed plan instead.
    from tests.conftest import final_plan

    k = s.kept().filter(F.col("cb") == int(cbs[0].split("=")[1]))
    k.count()
    plan = final_plan(k)
    scan = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "cb" in scan.split("PartitionFilters", 1)[1]
