"""Skew-mitigation utilities for 100 TB-scale shuffles.

What Spark already gives you (and these helpers do NOT reimplement):
- algebraic aggregates (sum/count/min/max/avg) get map-side partial aggregation,
  so a hot group key does NOT skew the shuffle — partials are tiny;
- AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  session.get_spark) re-splits oversized SORT-MERGE join partitions at runtime.

What still skews in practice, and what these helpers are for:
- joins AQE can't fix: shuffle-HASH joins, stream-static joins inside
  foreachBatch, and any join where one relation is too big to broadcast but a
  few keys dominate (the classic power-law entity key);
- holistic aggregates with no partial form (collect_list/collect_set/exact
  percentile) where one group collects a significant share of all rows.

Both helpers trade one extra narrow pass (salt column) for bounding the largest
shuffle partition at ~1/salt of the hot key's volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from plenario_mapper_spark.functions import parity as PAR

_SALT = "_skew_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Equi-join resilient to hot keys on the LEFT (big/skewed) side.

    The left side gets a uniform random salt in [0, salt); the right side is
    replicated `salt` times (explode of a literal range). The shuffle then keys
    on (join keys, salt), splitting each hot key across `salt` reducers.
    Replication multiplies the right side's shuffle volume by `salt` — use when
    right is modest (too big to broadcast, small enough to replicate) and the
    left key histogram is power-law. Result is row-identical to the plain join
    (each left row meets exactly one replica of each matching right row).

    Supported how: inner / left — semantics where left-row multiplicity is
    preserved by the one-replica-match property. (right/full would need the
    unmatched-right bookkeeping inverted; not provided.)
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalt = left.withColumn(_SALT, (F.rand(seed) * salt).cast("int"))
    rsalt = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return lsalt.join(rsalt, on + [_SALT], how).drop(_SALT)


def salted_collect_list(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    salt: int = 16,
    seed: int = 7,
) -> DataFrame:
    """collect_list with bounded per-task state for hot group keys.

    Holistic aggregates have no partial form: every row of a hot key lands on
    one reducer, whose state is the whole group. Two-phase salting bounds task
    state at ~group/salt: phase 1 collects per (keys, salt) partial lists,
    phase 2 flattens the (at most `salt`) partial lists per key. Order within
    the final list is not defined — same contract as plain collect_list.
    Output column: `values`.
    """
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(_SALT, (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(F.collect_list(v).alias("_part"))
    return (
        partial.groupBy(*keys)
        .agg(F.flatten(F.collect_list("_part")).alias("values"))
    )


def key_skew_audit(df: DataFrame, key: str | Column, top_k: int = 10) -> DataFrame:
    """Key-distribution skew DIAGNOSIS — the measurement you run before
    choosing a join/partitioning strategy (the helpers above are the cure;
    this is the X-ray). One row of concentration statistics over the key
    histogram:

    - n_rows / n_keys / max_count — raw shape (max/avg is the naive
      "hottest reducer vs mean" ratio);
    - top1_share / topk_share — mass held by the hottest key(s): the
      broadcast-vs-salt decision reads exactly this;
    - hhi — Herfindahl–Hirschman index Σ(c_i/N)², the economist's
      concentration scalar (1/n_keys = uniform, →1 = one key owns it);
    - gini — Gini coefficient of the count distribution via the exact
      rank formula G = 2·Σ(i·c_(i))/(n·N) − (n+1)/n over ascending-sorted
      counts (tie order cannot change the sum: equal values contribute
      c·Σi over any permutation of their rank block).

    Scale shape: ONE map-side-combined groupBy reduces the corpus to the
    key DOMAIN; every statistic after that runs on histogram rows, never
    raw rows — the aggregate pass, a TakeOrdered top-k, and the Gini rank
    (one domain-sized sort, the only non-trivial stage; documented as the
    price of an exact Gini). Parity: every statistic is exact-integer
    arithmetic until one final double division, so cross-engine values are
    bit-identical before rounding; +0.0 canonicalizes the −0.0 a uniform
    histogram's gini rounds to.
    """
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(F.count("*").cast("long").alias("c"))
    counts = counts.persist()
    counts.count()

    base = counts.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_count"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_sumsq"),
    )
    top = (
        counts.orderBy(F.col("c").desc(), F.col("key").asc())
        .limit(top_k)
        .agg(F.sum("c").cast("long").alias("_topk"))
    )
    from pyspark.sql import Window

    ranked = counts.withColumn(
        "_i", F.row_number().over(Window.orderBy(F.col("c").asc(), F.col("key").asc()))
    )
    gini_sum = ranked.agg(F.sum(F.col("_i") * F.col("c")).cast("long").alias("_ic"))

    n = F.col("n_rows").cast("double")
    nk = F.col("n_keys").cast("double")
    return (
        base.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(gini_sum))
        .select(
            "n_rows",
            "n_keys",
            "max_count",
            PAR.round6(F.col("max_count").cast("double") / n * nk).alias(
                "max_over_avg"
            ),
            PAR.round6(F.col("max_count").cast("double") / n).alias("top1_share"),
            PAR.round6(F.col("_topk").cast("double") / n).alias("topk_share"),
            PAR.round6(F.col("_sumsq").cast("double") / (n * n)).alias("hhi"),
            (
                PAR.round6(F.lit(2.0) * F.col("_ic").cast("double") / (nk * n)
                    - (nk + F.lit(1.0)) / nk)
                + F.lit(0.0)
            ).alias("gini"),
        )
    )
