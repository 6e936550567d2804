"""BM25 retrieval (operators/search.bm25_topk) and winnowing fingerprints
(operators/dedup.winnow_fingerprints): the paper-level contracts, pinned on
hand-built corpora where the expected values are computable by hand."""

import math

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import dedup as DD
from plenario_mapper_spark.operators.search import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_hand_computation(spark):
    """Three docs, one term — tf, df, dl, avgdl all small enough to fold by
    hand with the exact formula the operator documents."""
    docs = _docs(
        spark,
        [
            (1, "cat cat cat dog"),          # tf=3, dl=4
            (2, "cat fish"),                 # tf=1, dl=2
            (3, "dog fish bird emu"),        # tf=0 -> absent
        ],
    )
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in
           bm25_topk(docs, ["cat"], k=10).collect()}
    assert set(got) == {1, 2}
    n, df, avgdl, k1, b = 3, 2, 10 / 3, 1.2, 0.75
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1][0] == 1 and got[2][0] == 2
    assert got[1][1] == pytest.approx(s(3, 4), abs=1e-6)
    assert got[2][1] == pytest.approx(s(1, 2), abs=1e-6)


def test_bm25_rare_term_outscores_common_at_equal_tf(spark):
    """idf must do its job: one occurrence of a rare term beats one of a
    term present in every doc, at equal document length."""
    docs = _docs(
        spark,
        [
            (1, "common rare pad1 pad2"),
            (2, "common pad3 pad4 pad5"),
            (3, "common pad6 pad7 pad8"),
        ],
    )
    scores = {r["doc_id"]: r["score"] for r in
              bm25_topk(docs, ["common", "rare"], k=10).collect()}
    # doc 1 holds both terms; docs 2-3 only the common one
    assert scores[1] > scores[2] == scores[3]


def test_bm25_term_fold_is_order_deterministic(spark):
    """The per-doc sum over term scores folds in TERM order, so the result
    is identical across partitionings (a groupBy SUM of doubles is not)."""
    docs = _docs(
        spark,
        [(i, f"alpha beta gamma delta pad{i % 7} pad{i % 3}") for i in range(200)],
    )
    a = bm25_topk(docs, ["alpha", "beta", "gamma", "delta"], k=200)
    b = bm25_topk(docs.repartition(13), ["alpha", "beta", "gamma", "delta"], k=200)
    ra = {(r["doc_id"], r["score"]) for r in a.collect()}
    rb = {(r["doc_id"], r["score"]) for r in b.collect()}
    assert ra == rb


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing theorem (k=5, w=8): two docs sharing a substring of
    length >= k+w-1 = 12 must share at least one selected fingerprint hash.
    Build the shared run long enough (40 chars) that the guarantee holds
    well inside window boundaries, embedded in otherwise disjoint text."""
    shared = "thequickbrownfoxjumpsoverthelazydogtwice"
    docs = _docs(
        spark,
        [
            (1, "aaaaaaaaaaaaaaaaaaa" + shared + "bbbbbbbbbbbbbbbbbbb"),
            (2, "ccccccccccccccccccc" + shared + "ddddddddddddddddddd"),
        ],
    )
    g = docs.select(
        F.col("doc_id"),
        F.explode(F.sequence(F.lit(1), F.length("text") - 4)).alias("pos"),
        F.col("text"),
    ).select(
        "doc_id", "pos", F.substring("text", F.col("pos").cast("int"), 5).alias("gram")
    )
    # recompute selected fingerprints via the operator and verify overlap ON
    # THE HASH VALUE (keys pack positions, which differ between the docs)
    from pyspark.sql import Window

    h40 = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    keyed = g.select("doc_id", "pos", (h40 * F.lit(65536) + F.col("pos")).alias("key"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-7, 0)
    sel = (
        keyed.select("doc_id", "pos", F.min("key").over(win).alias("mkey"))
        .filter(F.col("pos") >= 8)
        .select("doc_id", (F.col("mkey") / 65536).cast("long").alias("h"))
        .distinct()
    )
    h1 = {r["h"] for r in sel.filter("doc_id = 1").collect()}
    h2 = {r["h"] for r in sel.filter("doc_id = 2").collect()}
    assert h1 & h2, "shared 40-char substring yielded no shared fingerprint"
    # and the operator's inventory row agrees with the manual selection
    inv = {r["doc_id"]: r for r in DD.winnow_fingerprints(docs).collect()}
    counts = {r["doc_id"]: r for r in (
        sel.groupBy("doc_id").agg(F.count("*").alias("nf")).collect()
    )}
    # NOTE: manual distinct is on h (hash only); the operator counts distinct
    # (hash,pos) keys — equal when no hash repeats at different positions
    for d in (1, 2):
        assert inv[d]["n_fingerprints"] >= counts[d]["nf"]


def test_winnowing_density_near_theory(spark):
    """Expected selected density over random text is 2/(w+1) ~ 0.222 for
    w=8; md5-hashed k-grams of generated prose should land near it."""
    import random

    random.seed(3)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    docs = _docs(
        spark,
        [(i, "".join(random.choice(alpha) for _ in range(400))) for i in range(30)],
    )
    rows = DD.winnow_fingerprints(docs, k=5, w=8).collect()
    assert len(rows) == 30
    pooled = sum(r["n_fingerprints"] for r in rows) / sum(
        r["n_windows"] for r in rows
    )
    assert 0.15 < pooled < 0.30, pooled
    for r in rows:  # inventory identity: dense positions
        assert r["n_kgrams"] == r["n_windows"] + 7


def test_winnowing_short_and_oversize_docs(spark):
    """Docs with no complete window produce no row; a doc past the 2^16-1
    position packing raises rather than silently aliasing keys."""
    docs = _docs(spark, [(1, "tiny"), (2, "exactly12chr"), (3, "x" * 11)])
    rows = {r["doc_id"]: r for r in DD.winnow_fingerprints(docs, k=5, w=8).collect()}
    assert set(rows) == {2}  # len 12 = k+w-1 -> exactly one complete window
    assert rows[2]["n_windows"] == 1 and rows[2]["n_fingerprints"] == 1

    big = _docs(spark, [(1, "y" * 70000)])
    with pytest.raises(Exception, match="shard documents upstream"):
        DD.winnow_fingerprints(big, k=5, w=8).collect()
