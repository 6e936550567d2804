"""Stream-time BM25 index maintenance (streaming/bm25_stream.Bm25IndexStream):
serving from the accumulated postings/stats state must EQUAL the one-shot
operators/search.bm25_topk over the full corpus (integer stats sum
order-independently across batches, so equality is exact, not approximate),
plus replay idempotency and the term-bucket file-pruning contract."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators.search import bm25_topk
from plenario_mapper_spark.streaming.bm25_stream import Bm25IndexStream

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TERMS = ["merge", "scan", "vector"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def _stage(corpus, tmp_path, bounds):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, (lo, hi) in enumerate(bounds):
        stage = str(tmp_path / f"stage{i}")
        corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))
    return in_dir


def _ranked(df):
    return [(r["doc_id"], r["rank"], r["score"]) for r in df.collect()]


def test_bm25_stream_serves_identical_to_oneshot_and_replays(spark, docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") < 300)
    in_dir = _stage(corpus, tmp_path, [(0, 100), (100, 200), (200, 300)])
    stream = Bm25IndexStream(spark, str(tmp_path / "state"))
    src = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream.start(src, str(tmp_path / "chk"))
    q.awaitTermination()

    got = _ranked(stream.topk(TERMS, k=10))
    want = _ranked(bm25_topk(corpus, TERMS, k=10))
    assert got == want and len(got) == 10

    # at-least-once replay: re-deliver the LAST batch under its original id —
    # postings and stats partitions overwrite to identical content
    last = corpus.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
    stream.process_batch(last, 2)
    assert _ranked(stream.topk(TERMS, k=10)) == want
    # no duplicated stats partials after replay: corpus doc count is exact
    n = (
        stream.stats()
        .filter("kind = 'corpus'")
        .agg(F.sum("n_docs").alias("n"))
        .collect()[0]["n"]
    )
    assert n == corpus.count()


def test_bm25_stream_prunes_to_term_buckets(spark, docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") < 120)
    stream = Bm25IndexStream(spark, str(tmp_path / "state"))
    stream.process_batch(corpus, 0)
    served = stream.topk(["merge"], k=5)
    served.count()
    import re

    from tests.conftest import final_plan

    plan = final_plan(served)
    # identify the postings scan by its read schema — plan strings truncate
    # long Location paths, so the state-dir name is not reliably present
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "tf:bigint" in ln and "tok:string" in ln
    ]
    assert scans, plan
    # the postings scan must carry a tb PARTITION filter (file-level pruning
    # to the query term's bucket — the vocabulary never scans whole)
    for ln in scans:
        m = re.search(r"PartitionFilters: \[[^\]]*\]", ln)
        assert m and "tb" in m.group(0), ln[:300]
