"""BPE tokenizer TRAINING over a corpus (the §2.H companion to
functions/bpe.py's committed-vocab APPLY side).

Sennrich-style byte-pair encoding learns merges greedily: count adjacent
symbol pairs across the corpus, fuse the most frequent pair, repeat. The
scale-defining design choice is WHAT relation the loop iterates over: the
DISTINCT-WORD table weighted by corpus counts, never the corpus itself. A
100 TB corpus pays one corpus scan (the word groupBy), then every merge
round costs O(vocabulary) — pair explode over ~10M distinct words, one
vocab-keyed aggregation, one argmax. The corpus text never participates
again.

Per round the argmax pair is collected to the driver — ONE row per round,
bounded by n_merges (the same bounded-collect contract as the kmeans
centroid seeds); the word sequences themselves are never collected. Merge
application is the functions/bpe.py delimiter-replace expression, so each
round's sequence state is a nested JVM expression over the CACHED word-count
relation rather than a materialized intermediate: round k's single job
re-evaluates k literal replaces over vocab-sized cached rows, which is
cheaper than a persist/checkpoint churn per round at any scale where the
vocabulary fits an executor (it does: vocab rows are words, not documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from plenario_mapper_spark.functions import bpe as B
from plenario_mapper_spark.functions import text as TX


def _greedy_merge_batch(
    rows: list[tuple[str, str, int]], max_take: int, covered: bool
) -> list[tuple[str, str, int]]:
    """Longest PREFIX of the sorted (count desc, pair asc) candidate list that
    is provably equal to running that many strictly-sequential greedy rounds.

    Accept candidate j after accepted merges M when, with L/R the left/right
    symbol sets of M:
      1. {l_j, r_j} is disjoint from every symbol in M — then merging M leaves
         count(l_j, r_j) INVARIANT (a pair's count changes only when its right
         element is some merge's left symbol or its left element is some
         merge's right symbol), so the collected count is exact for its round;
      2. no collected candidate with count >= n_j is of SPAWN form for M
         (r_i in L or l_i in R): a merge (a,b) creates only pairs (x,ab) /
         (ab,y) bounded by count(x,a) / count(b,y), so when every such
         bounding pair counts < n_j, no new pair can reach candidate j's
         count class (a tie could steal the argmax on the lexicographic
         tie-break, so the bound must be strict);
      3. `covered` or rows[-1].n < n_j — every pair with count >= n_j must
         actually be IN the collected list for check 2 to be exhaustive.
    Candidates already accepted can never match check 2's spawn forms (their
    symbols are disjoint by check 1), and the list head legitimately blocks
    itself on a self-pair (a,a), whose merge may spawn (aa,aa) ties.
    The first rejection STOPS acceptance: a rejected pair's count may change,
    and a later round might lawfully pick it or a spawned pair first."""
    accepted = [rows[0]]
    used = {rows[0][0], rows[0][1]}
    lefts = {rows[0][0]}
    rights = {rows[0][1]}
    for j in range(1, len(rows)):
        if len(accepted) >= max_take:
            break
        lj, rj, nj = rows[j]
        if not covered and rows[-1][2] >= nj:
            break
        if lj in used or rj in used:
            break
        if any(
            i != j and n_i >= nj and (r_i in lefts or l_i in rights)
            for i, (l_i, r_i, n_i) in enumerate(rows)
        ):
            break
        accepted.append(rows[j])
        used.update((lj, rj))
        lefts.add(lj)
        rights.add(rj)
    return accepted


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_word_len: int = 2,
    batch_k: int = 16,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a document corpus. Returns
    [(left, right, pair_count), ...] in rank order. Deterministic: pair
    counts are exact integers weighted by word frequency; ties break
    lexicographic (left, right) — engine-reproducible, which is what lets
    q_vocab_bpe_train's oracle re-derive the identical table in SQL.

    Each aggregation round collects the top ``batch_k`` candidate pairs (one
    bounded driver round trip, same contract as before) and applies as many
    of them as `_greedy_merge_batch` PROVES equal to strictly-sequential
    greedy rounds — typically 2-3 merges per round trip on natural text, so
    the sequential driver-round-trip count (the one-time build's fixed cost;
    each round is a vocab-sized aggregation + scheduling + py4j latency)
    drops ~2x with a bit-identical merge table (pinned by test_bpe's
    batched-vs-sequential equality and the q_vocab_bpe_train oracle).
    ``batch_k=1`` degenerates to the plain one-merge-per-round loop."""
    wc = (
        docs.select(F.explode(TX.tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    try:
        merges: list[tuple[str, str, int]] = []
        seq = B.char_seq(F.col("w"))
        while len(merges) < n_merges:
            syms = B.symbols(seq)
            # guard the fully-merged (single-symbol) word: Spark's
            # sequence(1, 0) counts DOWN ([1, 0]) instead of returning
            # empty, which would index past the array
            idx = F.when(
                F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
            ).otherwise(F.array().cast("array<int>"))
            pairs = F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(syms, i).alias("l"),
                    F.element_at(syms, i + 1).alias("r"),
                ),
            )
            top = (
                wc.select(F.explode(pairs).alias("p"), "c")
                .groupBy("p.l", "p.r")
                .agg(F.sum("c").cast("long").alias("n"))
                .orderBy(F.desc("n"), "l", "r")
                .limit(batch_k)
                .collect()
            )
            if not top:
                break
            rows = [(t["l"], t["r"], int(t["n"])) for t in top]
            for l, r, n in _greedy_merge_batch(
                rows, n_merges - len(merges), covered=len(rows) < batch_k
            ):
                merges.append((l, r, n))
                seq = B.apply_merge(seq, l, r)
        return merges
    finally:
        wc.unpersist()


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """DataFrame form of the merge table: (rank, left_sym, right_sym,
    merged, n_pair) — the artifact a pipeline persists as its tokenizer."""
    from plenario_mapper_spark.functions.local_rel import local_rows

    merges = bpe_train_merges(docs, n_merges, text_col=text_col)
    return local_rows(
        spark,
        [(i + 1, l, r, l + r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left_sym string, right_sym string, merged string, n_pair long",
    )


def bpe_word_token_map(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(word, n_tok): exact BPE token count per DISTINCT word under a
    committed merge table. The apply-side scale shape: the merge fold runs
    once per vocabulary entry; per-document counts then come from a join of
    doc word counts against this (broadcastable, vocab-bounded) map — the
    corpus text never re-tokenizes per occurrence."""
    return (
        docs.select(F.explode(TX.tokens(F.col(text_col))).alias("w"))
        .distinct()
        .select(
            "w",
            B.token_count(B.apply_merges(B.char_seq(F.col("w")), merges))
            .cast("long")
            .alias("n_tok"),
        )
    )
