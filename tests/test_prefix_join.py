"""Exact prefix-filter Jaccard join (dedup.prefix_filter_jaccard_pairs).

Pins: completeness (== brute force, a theorem of the rarest-first global
ordering — exercised on a DIVERSE vocabulary where prefixes actually prune),
threshold boundary inclusion, pruning effectiveness, and partitioning
invariance of the result set.
"""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import dedup as DD

THRESH = 0.5


def _corpus(n_docs=120, vocab=600, seed=11):
    """Random docs over a wide vocabulary plus planted near-duplicate pairs,
    so both the prune and the verify have real work."""
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        size = int(rng.integers(8, 25))
        toks = rng.choice(vocab, size=size, replace=False)
        docs.append((i, " ".join(f"w{t:04d}" for t in sorted(toks))))
    # planted near-dups: copy with small mutations
    for i in range(10):
        base = docs[i][1].split()
        drop = int(rng.integers(0, 3))
        mutated = base[drop:] + [f"w{int(rng.integers(vocab)):04d}"]
        docs.append((1000 + i, " ".join(mutated)))
    return docs


def _brute_pairs(docs, threshold):
    sets = {i: set(t.split()) for i, t in docs}
    out = {}
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out[(ia, ib)] = round(j, 6)
    return out


def test_matches_brute_force_exactly(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", THRESH
        ).collect()
    }
    want = _brute_pairs(docs, THRESH)
    assert got == want
    assert len(want) >= 10  # the planted near-dups are all found


def test_threshold_boundary_pair_included(spark):
    """Two 4-token sets sharing 3 tokens: J = 3/5 exactly; threshold 0.6 (=3/5
    exactly representable) must include the pair."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    rows = DD.prefix_filter_jaccard_pairs(df, "doc_id", "text", 0.6).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["jaccard"] == 0.6


def test_prefix_actually_prunes(spark):
    """On a diverse vocabulary the candidate pair set must be far smaller than
    all pairs — the point of the prefix filter. Verified indirectly: count
    pairs that share ANY token (the naive token-join candidate set) vs pairs
    sharing a PREFIX token."""
    docs = _corpus(n_docs=100, vocab=300, seed=7)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets_ = df.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    naive = (
        sets_.join(sets_.withColumnRenamed("id", "id_b"), "tok")
        .filter(F.col("id") < F.col("id_b"))
        .select("id", "id_b")
        .distinct()
        .count()
    )
    result = DD.prefix_filter_jaccard_pairs(df, "doc_id", "text", THRESH)
    survivors = result.count()
    # brute candidate space is ~all pairs on 300-word vocab; survivors tiny
    assert survivors < naive / 10


def test_partitioning_invariant(spark):
    docs = _corpus(n_docs=80, seed=3)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in DD.prefix_filter_jaccard_pairs(df, "doc_id", "text", THRESH).collect()
    )
    again = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in DD.prefix_filter_jaccard_pairs(
            df.repartition(17, "doc_id"), "doc_id", "text", THRESH
        ).collect()
    )
    assert base == again
