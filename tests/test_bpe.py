"""BPE tokenizer: the delimiter-replace merge pass must equal reference
Sennrich left-to-right merging, and the trainer must be deterministic."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.functions import bpe as B
from plenario_mapper_spark.operators import tokenizer as TK


def _ref_apply(sym, l, r):
    """Reference merge pass: left-to-right, non-overlapping."""
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _ref_train(word_counts, n):
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n):
        pc = Counter()
        for w, c in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, cnt))
        for w in seqs:
            seqs[w] = _ref_apply(seqs[w], l, r)
    return merges, seqs


@pytest.mark.parametrize(
    "word,merges,expect",
    [
        # overlap run: left-to-right pairs the FIRST two
        ("aaa", [("a", "a")], ["aa", "a"]),
        ("aaaa", [("a", "a")], ["aa", "aa"]),
        # grown symbols merge further
        ("aaaa", [("a", "a"), ("aa", "aa")], ["aaaa"]),
        # adjacent distinct pairs share the boundary correctly
        ("xyxy", [("x", "y")], ["xy", "xy"]),
        ("abab", [("a", "b"), ("ab", "ab")], ["abab"]),
        # merge order matters: (b,c) first starves (a,b)
        ("abc", [("b", "c"), ("a", "b")], ["a", "bc"]),
        # single char: nothing to merge
        ("q", [("a", "b")], ["q"]),
    ],
)
def test_apply_merges_matches_reference(spark, word, merges, expect):
    df = spark.createDataFrame([(word,)], "w string")
    got = df.select(
        B.symbols(B.apply_merges(B.char_seq(F.col("w")), merges)).alias("s")
    ).head()["s"]
    assert got == expect
    # and the reference agrees with itself
    ref = list(word)
    for l, r in merges:
        ref = _ref_apply(ref, l, r)
    assert ref == expect


def test_trainer_matches_reference_on_synthetic_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "low new wider wide wide"),
        ],
        "doc_id long, text string",
    )
    got = TK.bpe_train_merges(docs, 6)
    # reference over the same weighted word counts
    words = []
    for _, t in docs.select("doc_id", "text").collect():
        words += [w for w in t.lower().split() if len(w) >= 2]
    wc = Counter(words)
    want, _ = _ref_train(wc, 6)
    assert got == want


def test_word_token_map_counts_committed_vocab(spark):
    docs = spark.createDataFrame([(1, "hash hash join merger")], "doc_id long, text string")
    m = {
        r["w"]: r["n_tok"]
        for r in TK.bpe_word_token_map(docs, B.COMMITTED_MERGES).collect()
    }
    # reference counts under the committed table
    for w, n in m.items():
        s = list(w)
        for l, r in B.COMMITTED_MERGES:
            s = _ref_apply(s, l, r)
        assert n == len(s), (w, s)
    # committed merges include (h,ash)->hash: "hash" is ONE token
    assert m["hash"] == 1
    # "join" -> j o i n -> in -> jo -> join: one token as well
    assert m["join"] == 1


def test_train_query_registered_with_oracle():
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    for q in ("q_vocab_bpe_train", "q_doc_bpe_tokenize", "q_doc_pack_bpe_budget"):
        assert q in QUERIES and q in ORACLES


def test_batched_trainer_equals_sequential_and_reference(spark):
    """The top-K batched round trips (_greedy_merge_batch) must produce the
    EXACT merge table of strictly-sequential greedy rounds, including on
    tie-heavy and self-pair corpora where batching must refuse to batch."""
    corpora = [
        # natural-ish text (batching accepts 2-3 merges per round trip)
        [(1, "low lower lowest low low"), (2, "new newer newest new"),
         (3, "low new wider wide wide")],
        # heavy exact-count ties: lexicographic tie-breaks must survive
        [(1, "ab ab cd cd ef ef gh gh"), (2, "ab cd ef gh")],
        # self-pairs (aa) and overlapping runs: spawn-form blocking territory
        [(1, "aaaa aaa aa baab abab"), (2, "aab baa aaab")],
        # shared symbols across the top pairs: most candidates must be rejected
        [(1, "er re er re err ree erre"), (2, "rer ere er re")],
    ]
    for rows in corpora:
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        batched = TK.bpe_train_merges(docs, 8, batch_k=16)
        sequential = TK.bpe_train_merges(docs, 8, batch_k=1)
        assert batched == sequential, rows
        words = []
        for _, t in docs.collect():
            words += [w for w in t.lower().split() if len(w) >= 2]
        want, _ = _ref_train(Counter(words), 8)
        assert batched == want, rows
