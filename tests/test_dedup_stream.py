"""Stream-time near-dup maintenance (streaming/dedup_stream.NearDupStream):
the incremental probe + component fold driven by a REAL Structured Streaming
file source, certified against the one-shot full-sweep truth, plus the
replayed-micro-batch idempotency the at-least-once foreachBatch contract
requires."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import dedup as DD
from plenario_mapper_spark.streaming.dedup_stream import NearDupStream

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _comp_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_neardup_stream_matches_oneshot_and_replays_idempotently(
    spark, docs, tmp_path
):
    corpus = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
    # three batch files, staged sequentially so the file source delivers them
    # as three micro-batches in order
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    bounds = [(0, 60), (60, 130), (130, 200)]
    for i, (lo, hi) in enumerate(bounds):
        # the file source lists plain FILES, not parquet output dirs: stage
        # each batch's single part-file under a flat name
        stage = str(tmp_path / f"stage{i}")
        corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.copy(os.path.join(stage, part), os.path.join(in_dir, f"b{i}.parquet"))

    stream = NearDupStream(
        spark, str(tmp_path / "state"), threshold=0.5
    )
    src = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream.start(src, str(tmp_path / "chk"))
    q.awaitTermination()

    got = _comp_map(stream.components())
    oneshot = DD.connected_components(
        DD.minhash_near_dup_pairs(corpus, "doc_id", "text", 0.5).select(
            "id_a", "id_b"
        ),
        "id_a",
        "id_b",
    )
    want = _comp_map(oneshot)
    assert got == want and len(got) > 0

    # pair evidence log equals the full sweep's pair set (incremental probe
    # emits each cross/new pair exactly once across the three batches)
    got_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in stream.pairs().collect()
    }
    want_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.minhash_near_dup_pairs(corpus, "doc_id", "text", 0.5).collect()
    }
    assert got_pairs == want_pairs

    # at-least-once replay: re-deliver the LAST micro-batch with its original
    # batch_id — partition overwrite + idempotent component fold must leave
    # every piece of state byte-identical in content
    last = corpus.filter((F.col("doc_id") >= 130) & (F.col("doc_id") < 200))
    stream.process_batch(last, 2)
    assert _comp_map(stream.components()) == want
    assert {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in stream.pairs().collect()
    } == want_pairs
    n_corpus = spark.read.parquet(str(tmp_path / "state" / "corpus")).count()
    assert n_corpus == corpus.count()  # no duplicate corpus rows after replay


def test_component_state_updates_with_old_version_still_readable(
    spark, docs, tmp_path
):
    """VERDICT r7 item 3: the component fold must never materialize state on
    the driver, and a new batch's state write must succeed while the previous
    version's directory is still open for read — versioned directories make
    the write target disjoint from the read source. A DataFrame captured
    against the OLD version before the update must still evaluate to the old
    assignment afterwards (the predecessor version is retained)."""
    corpus = docs.filter(F.col("doc_id") < 120).select("doc_id", "text")
    stream = NearDupStream(spark, str(tmp_path / "state"), threshold=0.5)

    first = corpus.filter(F.col("doc_id") < 60)
    stream.process_batch(first, 0)
    old_df = stream.components()  # lazy plan pinned to version=0
    old_map = _comp_map(old_df)

    second = corpus.filter(F.col("doc_id") >= 60)
    stream.process_batch(second, 1)

    # the old plan still evaluates (its directory survived the update) ...
    assert _comp_map(old_df) == old_map
    # ... and the new pointer serves the folded state, equal to the one-shot
    oneshot = DD.connected_components(
        DD.minhash_near_dup_pairs(corpus, "doc_id", "text", 0.5).select(
            "id_a", "id_b"
        ),
        "id_a",
        "id_b",
    )
    assert _comp_map(stream.components()) == _comp_map(oneshot)
    # version layout: exactly the latest two retained, pointer on the newest
    root = tmp_path / "state" / "components"
    versions = sorted(d for d in os.listdir(root) if d.startswith("version="))
    assert versions == ["version=0", "version=1"]
    assert (root / "_LATEST").read_text().strip() == "1"

    # a third batch prunes version=0
    stream.process_batch(first.limit(5), 2)
    versions = sorted(d for d in os.listdir(root) if d.startswith("version="))
    assert versions == ["version=1", "version=2"]


def _patch_collect_recorder(monkeypatch, calls):
    """Intercept DataFrame.collect on every concrete class (pyspark 4's
    classic implementation SHADOWS the abstract parent's method), recording
    (columns, row_count) per call."""
    classes = []
    from pyspark.sql import DataFrame as _DF

    classes.append(_DF)
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _Classic

        classes.append(_Classic)
    except ImportError:
        pass
    for cls in (c for c in classes if "collect" in c.__dict__):
        orig = cls.__dict__["collect"]

        def recording(self, *a, _orig=orig, **k):
            out = _orig(self, *a, **k)
            calls.append((tuple(self.columns), len(out)))
            return out

        monkeypatch.setattr(cls, "collect", recording)


def test_component_fold_never_collects_to_driver(spark, docs, tmp_path, monkeypatch):
    """Guard the scale contract directly: the only driver-side collect()
    process_batch may run is the size-bounded band-index LOCATOR (one bigint
    per touched ingest batch — bounded by the number of micro-batches ever
    run, never by corpus or component size). Component state, pairs, and
    texts must never materialize on the driver."""
    calls = []
    _patch_collect_recorder(monkeypatch, calls)
    stream = NearDupStream(spark, str(tmp_path / "state"), threshold=0.5)
    corpus = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    stream.process_batch(corpus.filter(F.col("doc_id") < 40), 0)
    stream.process_batch(corpus.filter(F.col("doc_id") >= 40), 1)
    monkeypatch.undo()
    assert calls, "collect interception must actually fire (locator runs per batch)"
    for cols, n_rows in calls:
        assert cols == ("batch_id",), f"unexpected driver collect of {cols}"
        assert n_rows <= 2  # bounded by batches ingested so far
    assert len(_comp_map(stream.components())) > 0


def test_probe_never_resignatures_old_documents(spark, docs, tmp_path):
    """VERDICT r8 item 2 (the O(|corpus|)-per-batch scale finding): the probe
    must equi-join the PERSISTED band index, never recompute old documents'
    signatures from the corpus log, and must fetch old TEXT only for
    candidate ids. Behavioral proof: after batch 0, rewrite the corpus log so
    every NON-candidate old document's text becomes an exact copy of a
    batch-1 document. A re-signaturing implementation would hash the planted
    copies, collide them with batch 1, and emit extra jaccard=1.0 pairs; an
    index-probing implementation's candidates and verify reads are untouched
    (the planted docs are not in the band index's collision set), so the pair
    log must equal the pristine run's."""
    corpus = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
    b0 = corpus.filter(F.col("doc_id") < 130)
    b1 = corpus.filter(F.col("doc_id") >= 130)

    # pristine two-batch run: the ground truth pair log
    pristine = NearDupStream(spark, str(tmp_path / "pristine"), threshold=0.5)
    pristine.process_batch(b0, 0)
    pristine.process_batch(b1, 1)
    want_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in pristine.pairs().collect()
    }
    cross = [k for k in want_pairs if k[0] < 130 <= k[1]]
    assert cross, "test needs cross-batch near-dup pairs to discriminate"

    # second state: batch 0, then plant batch-1 text copies on non-candidates
    stream = NearDupStream(spark, str(tmp_path / "state"), threshold=0.5)
    stream.process_batch(b0, 0)
    new_bands = DD.minhash_band_rows(b1, "doc_id", "text")
    cand = DD.lsh_candidate_pairs(
        new_bands, stream.band_index().select("id", "bk").unionByName(new_bands)
    )
    cand_ids = {
        r["id"]
        for r in cand.select(
            F.explode(F.array("id_a", "id_b")).alias("id")
        ).distinct().collect()
    }
    planted_text = b1.limit(1).collect()[0]["text"]
    corrupted = b0.withColumn(
        "text",
        F.when(F.col("doc_id").isin([int(i) for i in cand_ids]), F.col("text"))
        .otherwise(F.lit(planted_text)),
    )
    corrupted.write.mode("overwrite").parquet(
        str(tmp_path / "state" / "corpus" / "batch_id=0")
    )
    stream.process_batch(b1, 1)
    got_pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in spark.read.parquet(
            str(tmp_path / "state" / "pairs" / "batch_id=1")
        ).collect()
    }
    want_b1 = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in spark.read.parquet(
            str(tmp_path / "pristine" / "pairs" / "batch_id=1")
        ).collect()
    }
    assert got_pairs == want_b1


def test_band_index_layout_and_corrupt_pointer_recovery(spark, docs, tmp_path):
    """The band index must exist per batch partition with one row per
    (doc, band); a corrupt-but-present _LATEST pointer (torn pre-fsync write,
    bit-rot) must recover from the newest complete version directory, never
    silently restart from empty state (ADVICE r8)."""
    corpus = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    stream = NearDupStream(spark, str(tmp_path / "state"), threshold=0.5)
    stream.process_batch(corpus.filter(F.col("doc_id") < 40), 0)
    stream.process_batch(corpus.filter(F.col("doc_id") >= 40), 1)
    bands_root = tmp_path / "state" / "bands"
    assert sorted(os.listdir(bands_root)) == ["batch_id=0", "batch_id=1"]
    # default geometry: 16 bands per doc, one (id, bk) row each
    n = spark.read.parquet(str(bands_root)).count()
    assert n == corpus.count() * 16
    want = _comp_map(stream.components())
    assert want
    # corrupt the pointer: recovery must serve the newest complete version
    ptr = tmp_path / "state" / "components" / "_LATEST"
    ptr.write_text("")  # torn/empty
    assert _comp_map(stream.components()) == want
    ptr.write_text("not-a-number")
    assert _comp_map(stream.components()) == want


def test_reingested_id_verifies_against_latest_text_exactly_once(spark, tmp_path):
    """Cross-batch new-wins: an id re-ingested in a LATER batch leaves stale
    rows in earlier append-only partitions; the verify must read exactly one
    text row per candidate id — the latest batch's — never both versions
    (duplicate sh_tab rows would emit conflicting duplicate pairs)."""
    stream = NearDupStream(spark, str(tmp_path / "state"), threshold=0.5)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    base = "the quick brown fox jumps over the lazy dog again and again"
    # batch 0: doc 1 with text A (collides with nothing yet)
    stream.process_batch(mk([(1, "completely unrelated filler text only")]), 0)
    # batch 1: doc 1 REWRITTEN to the base text (supersedes batch 0's row)
    stream.process_batch(mk([(1, base)]), 1)
    # batch 2: doc 2 near-identical to doc 1's LATEST text
    stream.process_batch(mk([(2, base + " tail")]), 2)
    pairs = spark.read.parquet(str(tmp_path / "state" / "pairs")).collect()
    keyed = {}
    for r in pairs:
        keyed.setdefault((r["id_a"], r["id_b"]), []).append(r["jaccard"])
    assert (1, 2) in keyed, pairs
    # exactly ONE evidence row for the pair, computed from the LATEST text
    assert len(keyed[(1, 2)]) == 1, keyed
    import plenario_mapper_spark.operators.dedup as DD2

    want = DD2.minhash_near_dup_pairs(
        mk([(1, base), (2, base + " tail")]), "doc_id", "text", 0.5
    ).collect()
    assert keyed[(1, 2)][0] == want[0]["jaccard"]
