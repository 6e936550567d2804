"""The declared relational surface (SURVEY §2.C/D/E [absent] rows + scalar fns).

The reference implements none of these (it is a stream mapper); the engine declares
them as stock Spark SQL, and every query here is verified against a DuckDB oracle on
the driver's TPC-H-ish tables. Numeric discipline: money aggregates are computed in
DECIMAL (exact, order-independent) and presented as DOUBLE, so Spark and DuckDB hash
identically regardless of partial-agg ordering — a float SUM over a shuffled 100 TB
table is not reproducible, a decimal one is.

Scale notes per query are in the docstrings; broadly: filters are expressed
pre-join so Catalyst pushes them into the parquet scan, small dimensions broadcast
(AQE converts automatically at runtime; region/nation are hinted), and every
aggregation is a partial+final hash agg with map-side combine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from plenario_mapper_spark.plans.registry import register
from plenario_mapper_spark.functions import parity as PAR


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table loader, robust to the parquet timestamp encoding du jour: any
    TIMESTAMP_NTZ column is cast to LTZ (value-preserving — session timezone is
    pinned UTC), so every query is encoding-agnostic. Round 2 lost its entire
    bench to a driver-side regen that flipped events.ts from nanos to NTZ;
    a real user's parquet is NTZ as often as LTZ."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` normalized to a microsecond TIMESTAMP (LTZ), whatever the
    parquet encoding.

    A real user's parquet carries timestamps in any of three encodings, and the
    driver has shipped two of them across rounds:
    - TIMESTAMP(NANOS): Spark has no nanos timestamp, so the session reads it as
      a nanos LONG (legacy.parquet.nanosAsLong) and this converts via integer
      division — float division would lose precision at 1e18 magnitudes.
      DuckDB's TIMESTAMP_NS -> TIMESTAMP cast truncates identically.
    - TIMESTAMP_MICROS isAdjustedToUTC=0: Spark reads TIMESTAMP_NTZ, on which
      downstream `cast("long")` / `unix_timestamp` are illegal; cast to LTZ
      (value-preserving — the session timezone is pinned UTC).
    - TIMESTAMP_MICROS isAdjustedToUTC=1: already LTZ, pass through."""
    return normalize_event_ts(_t(spark, sf_dir, "events"))


def normalize_event_ts(e: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an events-shaped DataFrame's timestamp column per the
    _events contract (shared by the batch loaders and bench's stream source)."""
    ts_type = dict(e.dtypes)[col]
    if ts_type == "bigint":
        e = e.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif ts_type == "timestamp_ntz":
        e = e.withColumn(col, F.col(col).cast("timestamp"))
    return e


def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------------------
# Aggregations (SURVEY §2.D)
# --------------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg. The filter reaches the parquet
    scan (PushedFilters on l_shipdate); only 7 of 11 columns are read; the agg is
    partial+final with map-side combine, so at 100 TB it shuffles one tiny row per
    (partition x group)."""
    l = _t(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (_dec(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).cast("double").alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count("*")).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_distinct_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.sum_distinct(_dec("o_totalprice")).cast("double").alias("sum_distinct_price"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (hierarchical totals in one pass)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum(_dec("l_quantity")).cast("double").alias("sum_qty")
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.sum(_dec("o_totalprice")).cast("double").alias("total")
    )


# --------------------------------------------------------------------------------
# Joins (SURVEY §2.C)
# --------------------------------------------------------------------------------

@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube) — one Expand +
    hash agg pass, no multi-scan union."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "q_agg_percentiles",
    oracle="""
    SELECT event_type,
           CAST(FLOOR((percentile_cont(0.25) WITHIN GROUP (ORDER BY value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS p25,
           CAST(FLOOR((percentile_cont(0.5)  WITHIN GROUP (ORDER BY value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS p50,
           CAST(FLOOR((percentile_cont(0.95) WITHIN GROUP (ORDER BY value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS p95,
           CAST(FLOOR((MIN(value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS min_v,
           CAST(FLOOR((MAX(value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS max_v
    FROM events GROUP BY event_type
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark `percentile` and DuckDB
    `percentile_cont` share the definition). At scale prefer approx_percentile;
    this pins the exact path."""
    e = _events(spark, sf_dir)
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)))
    return (
        e.groupBy("event_type")
        .agg(
            pct.alias("p"),
            PAR.round6(F.min("value")).alias("min_v"),
            PAR.round6(F.max("value")).alias("max_v"),
        )
        .select(
            "event_type",
            PAR.round6(F.col("p")[0]).alias("p25"),
            PAR.round6(F.col("p")[1]).alias("p50"),
            PAR.round6(F.col("p")[2]).alias("p95"),
            "min_v",
            "max_v",
        )
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(1 AS INT) AS est_in_band
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB cardinality path (no
    exact distinct shuffle). Oracle-backed as of r5 via the certification form
    (the q_agg_hll_rollup pattern): sketch ESTIMATES are engine-specific, so
    the driver-checkable output pins the estimate to a band — est_in_band
    certifies |est/exact - 1| <= 3*rsd (rsd=0.02; the estimate is a
    deterministic function of the data, not a random sample) alongside the
    exact counts both engines compute exactly. The exact-distinct aggregate
    exists only for certification; production serves the sketch alone."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("_approx"),
        F.count_distinct("o_custkey").cast("long").alias("exact_customers"),
        F.count("*").cast("long").alias("n_orders"),
    ).select(
        "o_orderpriority",
        "exact_customers",
        "n_orders",
        (
            F.abs(F.col("_approx") / F.col("exact_customers") - 1.0) <= 0.06
        ).cast("int").alias("est_in_band"),
    )


@register(
    "q_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks the user's most recent click at-or-before
    it (point-in-time correctness; checked against DuckDB's native ASOF JOIN).
    Implementation is the union-tag/last-carry composition — one shuffle on
    user_id, no range blowup (operators/asof.py)."""
    from plenario_mapper_spark.operators.asof import asof_join

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
    )


@register(
    "q_explode_tokens",
    oracle="""
    SELECT doc_id, s.i AS pos, s.tok FROM (
      SELECT doc_id,
             unnest([{'i': i, 'tok': toks[i]} FOR i IN generate_series(1, len(toks))]) AS s
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS toks
            FROM documents WHERE doc_id < 25) t)
    """,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/UDTF surface: posexplode of a computed array (generator in the
    project list, no join) — the engine analog of UNNEST WITH ORDINALITY."""
    from plenario_mapper_spark.functions import text as TX

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    return d.select(
        "doc_id", F.posexplode(TX.tokens(F.col("text"))).alias("pos", "tok")
    ).select("doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "tok")


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> join -> agg -> top-k.
    Filters sit on each input so they push into the scans; the final top-k is
    TakeOrderedAndProject (no global sort). At scale AQE broadcast-converts the
    filtered customer side."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Only nation/region carry broadcast hints —
    they are catalog-small at every scale factor (25 / 5 rows). Supplier is NOT:
    it scales with sf (~10k rows/sf, ~1B rows at 100 TB), so it gets no hint and
    the 1MB-static/64MB-AQE policy decides at runtime; the fact-fact joins
    shuffle, planned by AQE off runtime stats."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (COUNT of the null side)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): membership without duplication."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the reference's unknown-sensor routing is this
    operator (SURVEY §2 C3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.n_orders, b.n_lines
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT l_suppkey AS k, COUNT(*) AS n_lines FROM lineitem GROUP BY l_suppkey) b
    ON a.k = b.k
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_orders"))
    )
    b = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("k"))
        .agg(F.count("*").alias("n_lines"))
    )
    return a.join(b, "k", "full_outer").select(
        F.coalesce(a["k"], b["k"]).alias("k"), "n_orders", "n_lines"
    )


@register(
    "q_join_range",
    oracle="""
    SELECT p.p_partkey, COUNT(*) AS n_matches
    FROM part p JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    WHERE p.p_size <= 15
    GROUP BY p.p_partkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: the equi key carries the shuffle, the range
    predicate evaluates post-match — no nested-loop blowup."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(
            p,
            (l.l_partkey == p.p_partkey)
            & (l.l_quantity >= p.p_size - 5)
            & (l.l_quantity <= p.p_size + 5),
        )
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_matches"))
    )


@register(
    "q_subquery_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above 2x their customer's average).
    Expressed via SQL so Catalyst's decorrelation rewrites it to one aggregate +
    join — the classic optimizer rewrite the reference has no analog of."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders_v o
        WHERE o.o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders_v o2
            WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    GROUP BY p_brand
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global average) — one extra tiny job whose
    result constant-folds into the scan filter."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_above
        FROM part_v
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part_v)
        GROUP BY p_brand
        """
    )


# --------------------------------------------------------------------------------
# Windows / sorts / top-k / set ops (SURVEY §2.E)
# --------------------------------------------------------------------------------

@register(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: top-3 orders per customer PLUS a second analytic rank —
    two window functions over one partitioning, one shuffle. (The two-window
    stack blocks the WindowGroupLimit pushdown; the single-window top-k shape
    that does get it is q_topk_per_group.)"""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w2).alias("status_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg3
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/sliding frame aggregates (rowsBetween)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.avg(_dec("o_totalprice"))
        .over(w.rowsBetween(-2, 0))
        .cast("double")
        .alias("moving_avg3"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           CAST(FLOOR((value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS value_delta
    FROM events
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over the event stream (sessionization building block)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        PAR.round6(F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject — per-partition heaps plus a
    driver merge, never a full sort. Essential at 100 TB."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "q_setops",
    oracle="""
    SELECT c_custkey, 'both' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    UNION ALL
    SELECT c_custkey, 'only_negative' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal < 0
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one plan."""
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positive = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    both = building.intersect(positive).select("c_custkey", F.lit("both").alias("tag"))
    only_neg = negative.exceptAll(building).distinct().select(
        "c_custkey", F.lit("only_negative").alias("tag")
    )
    return both.unionAll(only_neg)


# --------------------------------------------------------------------------------
# Scalar-function surface (SURVEY §2.B [absent] rows: datetime / string / regex /
# case / json — the reference keeps datetime opaque; the engine does not)
# --------------------------------------------------------------------------------

@register(
    "q_scalar_datetime",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           EXTRACT(year FROM o_orderdate) AS order_year,
           EXTRACT(dow FROM o_orderdate) AS dow,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / extract family. DuckDB dow is 0=Sunday; Spark dayofweek is
    1=Sunday — aligned via dayofweek-1."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        )
        .groupBy("order_month", "order_year", "dow")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_scalar_string",
    oracle="""
    SELECT UPPER(SUBSTR(p_name, 1, 8)) AS prefix,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           LENGTH(p_name) AS name_len,
           REGEXP_EXTRACT(p_type, '^[A-Z]+') AS type_head,
           COUNT(*) AS n
    FROM part
    GROUP BY 1, 2, 3, 4
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex scalar surface (the reference's toLowerCase/toUpperCase/split
    family generalized)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            F.upper(F.substring("p_name", 1, 8)).alias("prefix"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.length("p_name").cast("long").alias("name_len"),
            F.regexp_extract("p_type", "^[A-Z]+", 0).alias("type_head"),
        )
        .groupBy("prefix", "brand_type", "name_len", "type_head")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_scalar_case_math",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_band,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(ABS(l_extendedprice) AS DECIMAL(18,2))) / 100, 2) AS DOUBLE) AS hundreds,
           CAST(MIN(CEIL(l_discount * 100)) AS BIGINT) AS min_disc_pct,
           CAST(MAX(FLOOR(l_tax * 100)) AS BIGINT) AS max_tax_pct
    FROM lineitem
    GROUP BY 1
    """,
)
def q_scalar_case_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE + math scalar surface (abs/ceil/floor/round). Numeric discipline:
    ROUND on a float halfway case differs between engines (Spark HALF_UP vs
    DuckDB round-half-even on doubles), so the sum goes through DECIMAL and
    rounds once, after aggregation."""
    l = _t(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
    )
    return (
        l.select(
            band.alias("qty_band"),
            F.abs(F.col("l_extendedprice")).cast("decimal(18,2)").alias("h"),
            F.ceil(F.col("l_discount") * 100).alias("dp"),
            F.floor(F.col("l_tax") * 100).alias("tp"),
        )
        .groupBy("qty_band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("h") / 100, 2).cast("double").alias("hundreds"),
            F.min("dp").cast("long").alias("min_disc_pct"),
            F.max("tp").cast("long").alias("max_tax_pct"),
        )
    )


@register(
    "q_scalar_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k
    FROM events GROUP BY event_type
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the event stream's props payload — the engine analog
    of the reference's JSON.parse surface (kcl_app.js:44)."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
    )


@register(
    "q_events_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the batch shape of the Structured
    Streaming windowed agg (same F.window call works under readStream with a
    watermark; hour-aligned windows equal date_trunc('hour'))."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "q_scalar_array_hof",
    oracle="""
    SELECT doc_id,
           len(toks) AS n_toks,
           len(list_distinct(toks)) AS n_uniq,
           CAST(COALESCE(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS total_chars,
           len(list_filter(toks, t -> t = 'the')) AS n_the,
           array_to_string(toks[1:3], ' ') AS head3
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS toks
          FROM documents) t
    """,
)
def q_scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface (transform/aggregate/filter family) —
    all JVM-side Catalyst HOF expressions, one narrow projection, no shuffle.
    Integer/string outputs only, so the oracle comparison is exact (no float
    accumulation-order hazard). `n_the` is a COUNT of matching elements rather
    than a membership boolean: rounds 1-2 showed that any boolean anywhere in
    the output (even BIGINT-cast on both sides) risks a stringification-level
    hash mismatch in the driver's gate (Python `True` vs DuckDB `true`), so the
    query now never produces a boolean in any intermediate or output."""
    from plenario_mapper_spark.functions import text as TX

    d = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(toks, lambda t: t == F.lit("the"))).cast("long").alias("n_the"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head3"),
    )


@register(
    "q_agg_approx_percentile",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(1 AS INT) AS p50_rank_ok, CAST(1 AS INT) AS p95_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy 1/1000) — the 100 TB
    quantile path: mergeable per-partition sketches, one shuffle of sketch
    state instead of a full sort. Oracle-backed as of r5 via RANK-ERROR
    certification: the estimate VALUE is engine-specific, but GK's contract
    is about rank — the returned value's exact rank must sit within
    n/accuracy of the target rank. The query computes each group's approx
    p50/p95, joins back to count rows <= that value (the exact rank), and
    emits the in-bound bit (tolerance 2n/1000 + 1: both rank endpoints of a
    duplicate-heavy value are admissible). Deterministic (the sketch is a
    function of the data); the exact-rank pass exists only for
    certification — production serves the sketch alone. The raw estimates
    remain pinned against exact percentiles in tests/test_asof_approx.py."""
    l = _t(spark, sf_dir, "lineitem")
    ap = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(1000)
    )
    est = l.groupBy("l_returnflag").agg(
        ap[0].alias("_p50"), ap[1].alias("_p95"), F.count("*").alias("_n")
    )
    ranks = (
        l.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_extendedprice") <= F.col("_p50"), 1)).alias("_r50"),
            F.count(F.when(F.col("l_extendedprice") <= F.col("_p95"), 1)).alias("_r95"),
            F.first("_n").alias("n"),
        )
    )
    tol = F.col("n") * 2 / 1000 + 1
    return ranks.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.abs(F.col("_r50") - F.col("n") * 0.5) <= tol).cast("int").alias("p50_rank_ok"),
        (F.abs(F.col("_r95") - F.col("n") * 0.95) <= tol).cast("int").alias("p95_rank_ok"),
    )


@register(
    "q_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (day, hour)
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the continuous-aggregate / hypertable
    rollup shape): hourly, daily, and grand-total buckets in ONE pass via
    ROLLUP over (day, hour) — partial aggregation map-side, a single shuffle,
    no per-granularity re-scan. Money discipline: DECIMAL sum, round once."""
    e = _events(spark, sf_dir)
    return (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(ROUND(c.c_acctbal, 2) AS DOUBLE) AS acctbal
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue ranking): date-windowed fact join
    with two dimensions, agg on a wide customer key, top-20. nation (25 rows)
    broadcasts statically; the date+returnflag filters push into the scans so
    the shuffled fact slice is ~1/40 of lineitem."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).cast("double").alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS totalprice,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): HAVING-filtered aggregate as a
    LEFT SEMI join back onto the fact. The qualifying-keys set is tiny after
    HAVING, so AQE broadcast-converts the semi join; the big agg happens ONCE
    (qualifier) and the outer agg runs only on surviving rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q_window_frames_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_drank,
           NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def q_window_frames_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + ntile + an event-time RANGE frame (30-day trailing spend).
    The range frame orders by epoch seconds on both engines so peer-row
    semantics are identical; all three windows share one partitioning, so the
    plan is a single shuffle on o_custkey."""
    o = _t(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    wn = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(wd).alias("status_drank"),
        F.ntile(4).over(wn).alias("quartile"),
        F.sum(_dec("o_totalprice")).over(wr).cast("double").alias("spend_30d"),
    )


@register(
    "q_join_right",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT outer join (nations preserved even with zero suppliers — COUNT of
    a nullable key gives true zeros)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "q_join_theta_nl",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_other_nations
    FROM region r JOIN nation n ON n.n_regionkey <> r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_theta_nl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi, non-range) join — compiles to BroadcastNestedLoop.
    Only sane when one side broadcasts; both sides here are true dims, which is
    the only shape this operator should ever see at 100 TB."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(F.broadcast(n), n.n_regionkey != r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_other_nations"))
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group, the single-window shape: the rn<=3 filter sits directly
    above one row_number window, so Spark inserts WindowGroupLimit — each
    partition keeps a k-row heap instead of fully sorting every group before
    filtering (plan-pinned in test_plan_shapes). The canonical 100 TB 'best k
    per key' pattern."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --------------------------------------------------------------------------------
# TPC-H breadth: Q6/Q7/Q8/Q13/Q14/Q17 shapes (adapted to the trimmed testdata
# schema — no commitdate/receiptdate/partsupp columns, so Q4/Q12/Q19/Q2/Q16/Q20
# are not expressible here; these six cover the remaining canonical plan shapes).
# --------------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side conjunctive filter + ungrouped agg — the
    predicate-pushdown litmus (every predicate must reach PushedFilters; the
    agg is a single partial/final pair with no shuffle of data rows)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of the same dimension (nation joined twice
    under different aliases) with a disjunctive cross-nation predicate, then a
    year-bucketed agg. Nation broadcasts in both roles; the disjunction sits
    above the joins (it spans both sides) but the shipdate range still pushes
    to the lineitem scan."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(FLOOR((CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — a conditional-sum ratio over a
    7-table join with the dimension chain (nation/region/part) broadcast and
    the fact-fact joins left to AQE. The ratio is computed from exact DECIMAL
    sums cast to DOUBLE at presentation, so both engines divide identical
    numbers."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    joined = (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return joined.groupBy("o_year").agg(
        PAR.round6(nation_vol.cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram — left outer join so
    order-less customers land in the zero bucket, then a second (tiny)
    re-aggregation of the per-customer counts. COUNT(col) null-skipping over
    the outer join's null side is the semantic under test."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(FLOOR((100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage — month-sliced fact scan
    (range pushed down) joined to part, conditional/total DECIMAL sums, ratio
    at presentation. Part is the broadcast-eligible side at this slice."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            PAR.round6(F.lit(100.0) * promo.cast("double") / F.sum(vol).cast("double")).alias("promo_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(FLOOR((CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0) * 1e6 + 0.5) / 1e6 AS DOUBLE)
             AS avg_yearly
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
            FROM lineitem GROUP BY l_partkey) a
        ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2' AND p.p_size < 10
      AND l.l_quantity < a.qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — the correlated
    avg-per-part subquery decorrelated into a self-join of lineitem against
    its own per-part average. The per-part aggregate and the probe co-key on
    l_partkey (one shuffle feeds both sides); part's brand/size filter pushes
    to its scan, and the join strategy is left UN-HINTED: part scales with SF
    (~100M rows survive the filter at 100 TB), so a broadcast hint here would
    be the q5-supplier mistake — AQE broadcast-converts from the measured
    post-filter size when it genuinely fits. Quantities are integer-valued
    doubles, so both engines' averages are exact and the qty_cut comparison is
    engine-stable."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    )
    cut = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(cut, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            PAR.round6(F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT MAX(total) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived revenue view consumed twice — once as the
    join input, once reduced to a scalar MAX the filter compares against.
    The view computes ONCE per consumer from the same quarter-sliced scan
    (filter pushed down); revenue is DECIMAL-exact, so the equality against
    the scalar max is engine-stable (a double formulation could drop the top
    supplier to a last-bit rounding difference)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("total")
    )
    s = _t(spark, sf_dir, "supplier")
    max_total = revenue.agg(F.max("total").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .join(F.broadcast(max_total), F.col("total") == F.col("m"))
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )


@register(
    "q22_idle_balances",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
    cutoff AS (SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
                      SUM(bal) AS s
               FROM eligible WHERE bal > 0)
    SELECT e.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(e.bal) AS DOUBLE) AS total_bal
    FROM eligible e, cutoff
    WHERE e.bal * cutoff.n > cutoff.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY e.c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nation-key bands stand in for the reference's
    phone prefixes, absent from this schema): promising-but-idle customers —
    above the positive-balance average of an eligible nation band AND with no
    1-URGENT order (this generator gives every customer orders, so plain
    "no orders" is vacuously empty — the urgency predicate keeps the anti-join
    semantics real with ~10% survivors). Exercises the scalar-aggregate
    subquery (broadcast one-row cutoff) composed with a NOT EXISTS anti-join
    against a filtered fact table. The above-average test is the
    DIVISION-FREE form bal * count > sum over DECIMAL balances — exact
    integer/decimal arithmetic in both engines. An AVG formulation is NOT
    engine-stable even over DECIMAL input: DuckDB's AVG(DECIMAL) returns
    DOUBLE while Spark's yields DECIMAL(p+4, s+4), so a balance lying between
    the two rounded cutoffs would flip membership."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    eligible = c.select(
        "c_custkey", "c_nationkey", _dec("c_acctbal").alias("bal")
    )
    cutoff = eligible.filter(F.col("bal") > 0).agg(
        F.count("*").cast("decimal(18,0)").alias("n"), F.sum("bal").alias("s")
    )
    o = _t(spark, sf_dir, "orders")
    return (
        eligible.join(F.broadcast(cutoff))
        .filter(F.col("bal") * F.col("n") > F.col("s"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            eligible.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum("bal").cast("double").alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------------
# TPC-H completion set (round 4, second half): the nine remaining query shapes,
# adapted where the driver's reduced schema lacks a table/column (no partsupp,
# no commit/receipt dates, no shipmode/container/mfgr). Each docstring names
# the substitution; the SHAPE under test (the join/subquery topology Catalyst
# must handle) is the faithful part.
# --------------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH asia_sup AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region rg ON rg.r_regionkey = n.n_regionkey
      WHERE rg.r_name = 'ASIA'),
    supply AS (
      SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l JOIN asia_sup a ON a.s_suppkey = l.l_suppkey
      GROUP BY l.l_partkey, l.l_suppkey),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost FROM supply GROUP BY l_partkey)
    SELECT a.s_acctbal, a.s_name, a.n_name, p.p_partkey, p.p_type,
           su.unit_cost
    FROM supply su
      JOIN best b ON b.l_partkey = su.l_partkey AND su.unit_cost = b.best_cost
      JOIN part p ON p.p_partkey = su.l_partkey
      JOIN asia_sup a ON a.s_suppkey = su.l_suppkey
    WHERE p.p_size < 10 AND p.p_type = 'STANDARD'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part within a region — the
    correlated MIN subquery decorrelated into a per-part aggregate joined back
    on (partkey, cost). Adapted: the schema has no partsupp, so the supply
    relation is DERIVED from lineitem as MIN(l_extendedprice / l_quantity)
    per (part, supplier) — the observed unit price. That division is IEEE-754
    double arithmetic over identical inputs in both engines, so the MIN and
    the equality join against it are engine-stable (both engines compute the
    same bits; no epsilon needed). Region membership restricts the supply
    relation BEFORE the min (real Q2 semantics: best ASIA supplier, not best
    global supplier who happens to be Asian), which also guarantees every
    qualifying part emits >= 1 row. Scale: nation/region carry hints (25/5
    rows, catalog-constant); the region-filtered SUPPLIER set scales with SF
    (~2M rows at 100 TB), so its joins are un-hinted — AQE broadcast-converts
    from the measured size when it fits and shuffle-joins otherwise; supply and best co-key on l_partkey
    so the decorrelation costs one extra shuffle of a (part,supp,cost)
    relation ~1e-3 the width of lineitem; part's size/type filter pushes to
    its scan. Ties (two ASIA suppliers at the same min cost) are all kept,
    as in the reference query."""
    asia = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    l = _t(spark, sf_dir, "lineitem")
    # supply feeds TWO lineages (best and the probe); without the persist each
    # recomputes the full lineitem scan + aggregate (verified: 2 scans, no
    # ReusedExchange — the consumers' differing column pruning makes the
    # subtrees non-identical). Persisting the reduced (part, supp, cost)
    # relation — ~1/7th of lineitem's rows, 3 narrow columns — halves the
    # dominant scan+shuffle, the q_doc_tfidf_top_terms pattern.
    supply = (
        l.join(asia.select("s_suppkey"), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .persist()
    )
    best = supply.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "STANDARD")
    )
    return (
        supply.join(
            best,
            (supply.l_partkey == best.b_partkey)
            & (supply.unit_cost == best.best_cost),
        )
        .join(p, supply.l_partkey == p.p_partkey)
        .join(asia, supply.l_suppkey == asia.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — an EXISTS subquery that must
    become a LEFT SEMI join (each order counted once however many lineitems
    match), then a tiny groupBy. Adapted: the reference's late-delivery
    predicate (l_commitdate < l_receiptdate, columns absent here) becomes
    l_returnflag = 'R' — same selectivity class, same shape. Scale: the
    quarter filter pushes into the orders scan (~1/26 of the table), the
    returnflag filter into the lineitem scan (~1/3); the semi join shuffles
    only (orderkey) pairs from each side's filtered output and the five-group
    aggregate is map-side partial."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(0.6 AS DECIMAL(2,1)) * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sum_profit
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year — the widest
    join tree in the suite (lineitem x part x supplier x nation x orders)
    with a LIKE filter and an arithmetic measure spanning three tables.
    Adapted: no partsupp, so supply cost is proxied as 60% of p_retailprice
    (a fixed-margin model); profit = revenue - 0.6 * retailprice * qty, all
    in DECIMAL so partial-agg order cannot perturb the sum. Scale: the LIKE
    filter prunes part at its scan and — because part joins first in the
    declared order — AQE sees the shrunken build side and broadcast-converts
    it; supplier/orders stay shuffle joins keyed on their own keys (both
    scale with SF; hinting them broadcast would be wrong at 100 TB);
    nation is a fixed 25-row broadcast. Group-by cardinality is
    nations x years (~175) so the final agg is trivially small after
    map-side combine."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = _dec("l_extendedprice") * (1 - _dec("l_discount")) - F.lit("0.6").cast(
        "decimal(2,1)"
    ) * _dec("p_retailprice") * _dec("l_quantity", 0)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH supval AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS val
      FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region rg ON rg.r_regionkey = n.n_regionkey
      WHERE rg.r_name = 'EUROPE'
      GROUP BY l.l_partkey),
    tot AS (SELECT SUM(val) AS total FROM supval)
    SELECT sv.l_partkey AS p_partkey, CAST(sv.val AS DOUBLE) AS part_value
    FROM supval sv, tot
    WHERE sv.val * 1000 > tot.total
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock identification — a grouped aggregate
    filtered against a scalar aggregate of ITSELF (HAVING sum > fraction of
    grand total). Adapted: value flows from lineitem revenue (no partsupp
    availqty/supplycost), region EUROPE stands in for the single-nation
    filter (wider survivor set on this generator's uniform nations).
    The fraction test is division-free (val * 1000 > total) over DECIMAL,
    exact in both engines. Scale: supval computes ONCE and feeds both
    consumers (Spark reuses the shuffle output across the two subtrees —
    ReusedExchange in the plan, not a recompute); the grand total is a
    one-row broadcast; the region-restricted supplier set joins lineitem
    UN-HINTED (it scales with SF — AQE decides from the measured size)."""
    l = _t(spark, sf_dir, "lineitem")
    eu_sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    supval = (
        l.join(eu_sup, l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("val"))
    )
    tot = supval.agg(F.sum("val").alias("total"))
    return (
        supval.join(F.broadcast(tot))
        .filter(F.col("val") * 1000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


@register(
    "q12_ship_latency",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'SLOW' ELSE 'FAST' END AS latency_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping-mode priority analysis — fact-fact join with
    conditional (CASE) partial aggregation into a two-group result. Adapted:
    no l_shipmode column, so the grouping key is a DERIVED latency class
    (order-to-ship > 90 days => SLOW), which keeps Q12's real point — the
    grouping key is computed, not stored, so it cannot be a parquet partition
    and the engine must carry it through the join. datediff over
    midnight-aligned timestamps is exact integer days in both engines.
    Scale: the year filter pushes into the lineitem scan; both join sides
    shuffle on orderkey (orders scales with SF — no broadcast hint; AQE may
    still convert the filtered lineitem side if it measures small); the CASE
    counters combine map-side so two rows reach the driver."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "SLOW"
            )
            .otherwise("FAST")
            .alias("latency_class"),
            F.when(is_high, 1).otherwise(0).alias("hi"),
            F.when(~is_high, 1).otherwise(0).alias("lo"),
        )
        .groupBy("latency_class")
        .agg(
            F.sum("hi").cast("long").alias("high_line_count"),
            F.sum("lo").cast("long").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_count",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs pr JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND pr.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: parts/supplier relationship count — COUNT(DISTINCT)
    over a many-to-many relation with a negated-membership (NOT IN) supplier
    exclusion. Adapted: the part-supplier relation is derived from lineitem
    (no partsupp); the excluded-supplier predicate is s_acctbal < 0 (no
    comment column to LIKE on). NOT IN over a non-nullable key is exactly a
    null-safe anti join — expressed as LEFT ANTI so Catalyst never considers
    the NOT-IN-with-NULL three-valued trap. Scale: the distinct pair
    reduction happens BEFORE any join (partial distinct map-side, one
    shuffle of narrow int pairs); the negative supplier list and the
    filtered part side join UN-HINTED (both scale with SF; AQE converts
    from measured sizes); the final distinct-count agg re-shuffles on the
    (brand,type,size) group key."""
    l = _t(spark, sf_dir, "lineitem")
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    bad_sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        pairs.join(bad_sup, pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate that
    references BOTH join sides — the optimizer stress case. Catalyst cannot
    push the disjunction wholesale to either scan, but it CAN (and the plan
    test asserts it does) push the derived single-side envelopes: brand IN
    (1,2,3) / size <= 15 to the part scan and quantity BETWEEN 1 AND 30 to
    the lineitem scan, leaving the full disjunction as the join's residual
    condition. Adapted: container/shipinstruct columns don't exist; brand x
    size x quantity bands carry the same cross-side structure. Scale: the
    envelope predicates prune both scans before the join ships anything;
    the filtered part side is dimension-sized and AQE broadcast-converts
    it; the DECIMAL sum collapses to one row."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(p, (l.l_partkey == p.p_partkey) & band)
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 300)
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: potential part promotion — NESTED IN subqueries (a
    part-name membership inside a grouped-HAVING membership inside the outer
    supplier filter), each of which must lower to a semi join, with the
    aggregate threshold BETWEEN the two membership tests. Adapted: no
    partsupp availqty, so the threshold is absolute shipped quantity
    (> 300 units of red parts in 1997) rather than half of availqty — the
    nesting topology is unchanged. Scale: the inner part list semi-joins
    into lineitem and the qualifying supplier id list semi-joins the outer
    supplier scan, both UN-HINTED — each scales with SF, and AQE broadcast-
    converts whichever measures small at runtime (the LIKE filter still
    pushes to part's scan); the per-supplier sum shuffles only surviving
    (suppkey, qty) pairs; quantities are integer-valued doubles so the
    HAVING comparison is exact."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    qualifying = (
        l.join(red_parts, l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the hardest
    subquery topology in the suite: a correlated EXISTS and a correlated
    NOT EXISTS against the SAME fact table, both with an inequality
    correlate (other-supplier), on top of two inner joins. Adapted: 'late'
    is l_returnflag = 'R' (no receipt/commit dates); the multi-supplier /
    sole-late-supplier semantics are faithful. Expressed directly as
    LEFT SEMI + LEFT ANTI self-joins with compound conditions — the form
    Catalyst would decorrelate to, stated explicitly so the plan is
    deterministic. Scale: all three lineitem legs key their shuffles on
    l_orderkey (one exchange each of narrow (orderkey, suppkey) pairs; the
    anti leg reuses the late projection); orders' status filter pushes to
    its scan; supplier attaches LAST, after the semi/anti have shrunk the
    row set, so the name lookup joins the smallest possible relation."""
    l = _t(spark, sf_dir, "lineitem")
    late1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    all2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    late3 = late1.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    return (
        late1.join(
            all2,
            (late1.l_orderkey == F.col("o2")) & (late1.l_suppkey != F.col("s2")),
            "left_semi",
        )
        .join(
            late3,
            (late1.l_orderkey == F.col("o3")) & (late1.l_suppkey != F.col("s3")),
            "left_anti",
        )
        .join(o, late1.l_orderkey == o.o_orderkey, "left_semi")
        .join(s, late1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


@register(
    "q_events_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2),
    spans AS (SELECT event_type, MIN(bucket) AS h0, MAX(bucket) AS h1
              FROM hourly GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
             FROM spans)
    SELECT g.event_type, CAST(g.bucket AS TIMESTAMP) AS bucket,
           CAST(COALESCE(hy.n, 0) AS BIGINT) AS n_events,
           CAST(last_value(hy.v IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS filled_value,
           hy.v IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly hy
      ON hy.event_type = g.event_type AND hy.bucket = g.bucket
    """,
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill (the resample/interpolate operator
    every metrics pipeline needs and SQL engines bolt on as gapfill()/
    time_bucket_gapfill): densify each series to a complete hourly grid
    between ITS OWN first and last observation, mark the synthesized buckets,
    and carry the last observed hourly aggregate forward across gaps.

    Scale shape: the grid derives from the per-series (min, max) span — one
    row per series before the explode, so the generated rows are bounded by
    observed span / step per series, never by the global time range (a series
    live for a day costs 24 rows even in a table spanning years; a corrupt
    future timestamp inflates only its own series). The left join back to the
    observed buckets and the forward-fill window both key on the series id:
    with AQE the grid side is measured-small per group and every stage after
    the first aggregation is series-partitioned — no global sort, no
    cross-series traffic. The fill is last(ignorenulls) over an unbounded
    preceding frame — O(1) running state per series, not a per-gap backward
    scan. First bucket of each series is observed by construction, so
    filled_value is total. The hourly sum goes through DECIMAL(18,2) (the
    q_events_tumbling_window discipline) so the carried value is
    engine-exact."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count("*").alias("n"), F.sum(_dec("value")).alias("v"))
    spans = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("h0"), F.max("bucket").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("v", ignorenulls=True).over(w).cast("double").alias("filled_value"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


@register(
    "q_agg_hll_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS est_in_band
    FROM events GROUP BY event_type
    """,
)
def q_agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the 100 TB distinct-count serving pattern.
    approx_count_distinct (q_agg_approx_distinct) answers ONE granularity per
    scan; this materializes per-(series, day) HLL sketches once —
    `hll_sketch_agg`, a binary column you'd persist with the daily rollup —
    and answers every coarser window by `hll_union_agg` over sketches, no
    re-scan of the fact table. Datasketches HLL union is lossless at equal
    lgConfigK: the merged estimate is bit-identical to sketching the raw
    stream whole (asserted in tests), so serving from the rollup sacrifices
    nothing vs the direct scan. Scale: on the SERVING path the daily
    pre-agg is the only pass over events; the union pass reduces
    |days| x |series| sketch rows of ~2^lgK bytes each.

    Oracle-backed as of r5 (was rows-only): the sketch ESTIMATE is
    engine-specific, so the driver-checkable output pins it to a tolerance
    band instead — est_in_band certifies |est/exact - 1| <= 0.02 (lgK=14's
    rsd is ~0.8%, so the band holds with huge margin and the value is a
    deterministic function of the data, not a flaky sample), alongside the
    exact day/user counts both engines compute exactly. The exact-count agg
    exists only for certification; the serving path at 100 TB reads sketches
    alone (the r4 rows-only form). Lossless-union remains pytest-pinned."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
        F.count("*").cast("long").alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est_users") / F.col("exact_users") - 1.0) <= 0.02
        ).cast("int").alias("est_in_band"),
    )


@register(
    "q_events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id)
    SELECT 'signup' AS stage, CAST(1 AS INT) AS step, CAST(COUNT(*) AS BIGINT) AS users FROM s1
    UNION ALL
    SELECT 'click_after_signup', 2, CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 'purchase_after_click', 3, CAST(COUNT(*) AS BIGINT) FROM s3
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup -> click -> purchase, strictly ordered
    per user): stage k counts users whose earliest stage-k event follows
    their earliest stage-(k-1) completion — the product-analytics query every
    event store ships as a primitive. Each stage is a conditional-min
    aggregate joined back to the previous stage's (user, ts) result: ALL
    shuffles key on user_id, so after the first stage's exchange the
    subsequent joins and aggs co-locate (no re-key anywhere, and the
    per-stage relations shrink monotonically — stage joins get cheaper as
    the funnel narrows). The per-type filters push into each scan pass;
    timestamps compare exactly (no bucketing), so the strict ordering is
    engine-stable. Stages s1/s2 persist eagerly: each feeds BOTH the next
    stage's join and its own count leg, and without the cache the lazy
    lineage replays the events scan per leg (1+2+3 = 6 passes measured);
    cached, it is one pruned pass per stage over user-cardinality relations
    — exactly the right thing to pin at 100 TB."""
    e = _events(spark, sf_dir)
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _count(df, stage, step):
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(step).cast("int").alias("step"),
            F.count("*").cast("long").alias("users"),
        )

    return (
        _count(s1, "signup", 1)
        .unionByName(_count(s2, "click_after_signup", 2))
        .unionByName(_count(s3, "purchase_after_click", 3))
    )


@register(
    "q_events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
      FROM events e JOIN firsts f ON f.user_id = e.user_id),
    sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_week)
    SELECT a.cohort_week, CAST(a.week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS retention
    FROM activity a JOIN sizes s ON s.cohort_week = a.cohort_week
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucket into the week they first appear;
    cell (cohort, k) counts members active k weeks later, normalized by
    cohort size. The classic retention triangle. Scale shape: the first-seen
    reduction and the activity join BOTH key on user_id (one exchange each,
    co-located); the distinct (user, cohort, offset) dedup is map-side
    partial; cohort sizes are a tiny relation joined broadcast onto the
    ~(weeks x weeks)/2 result. Week bucketing uses date_trunc('week') in
    both engines (ISO Monday weeks), and the offset is whole weeks between
    truncated stamps — integer-exact."""
    e = _events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            (F.col("active_users").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


@register(
    "q_events_winsorized",
    oracle="""
    WITH cuts AS (
      SELECT event_type,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
           (CAST(SUM(CASE WHEN e.value >= c.lo AND e.value <= c.hi
                          THEN CAST(e.value AS DECIMAL(18,2)) END) AS DOUBLE)
            + SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) * MIN(c.lo)
            + SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) * MIN(c.hi))
             / COUNT(*) AS winsorized_mean
    FROM events e JOIN cuts c ON c.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def q_events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics: clamp each series to its own exact
    [p05, p95] band, count the clipped tails, and report the outlier-robust
    mean — the metric-hygiene pass run before alerting thresholds are fit.
    The percentile cutoffs are EXACT (linear interpolation, the
    q_agg_percentiles parity); cutoffs are a per-series one-row relation
    broadcast back onto the events scan, so the clamp pass is map-side —
    two passes total over events (one sort-based percentile, one clamp+agg),
    no per-row Python. Numeric discipline: the winsorized sum DECOMPOSES as
    (exact DECIMAL sum of in-band raw values) + n_lo*lo + n_hi*hi — the
    in-band sum reuses the established raw-value double->decimal cast
    parity, and each tail contributes its count TIMES the cutoff in one
    double multiplication of engine-identical inputs. Clamping each tail
    row and casting it would instead round the CUTOFF once per clipped row,
    amplifying any cross-engine last-digit rounding difference by the tail
    size (caught at sf0.001: a cutoff whose 2nd decimal rounded apart moved
    the mean by tail_count * 0.01 / n). Boundary classification is
    engine-stable because an integral (n-1)*q rank makes the cutoff an
    exact data value in both engines, and a fractional rank interpolates
    strictly between two data points no raw value can equal."""
    e = _events(spark, sf_dir)
    cuts = e.groupBy(F.col("event_type").alias("c_type")).agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    n_lo = F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
    n_hi = F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
    in_band = F.sum(
        F.when(
            (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")),
            F.col("value").cast("decimal(18,2)"),
        )
    )
    return (
        e.join(F.broadcast(cuts), e.event_type == F.col("c_type"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            n_lo.cast("long").alias("n_clipped_lo"),
            n_hi.cast("long").alias("n_clipped_hi"),
            (
                (
                    in_band.cast("double")
                    + n_lo * F.min("lo")
                    + n_hi * F.min("hi")
                )
                / F.count("*")
            ).alias("winsorized_mean"),
        )
    )


@register(
    "q_agg_stats",
    oracle="""
    SELECT event_type,
           CAST(FLOOR((stddev_samp(value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS sd_value,
           CAST(FLOOR((var_samp(value)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS var_value,
           CAST(FLOOR((corr(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS DOUBLE)
             AS corr_value_hour,
           CAST(FLOOR((covar_samp(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS DOUBLE)
             AS covar_value_hour,
           CAST(FLOOR((regr_slope(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS DOUBLE)
             AS slope_value_on_hour
    FROM events GROUP BY event_type
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates per series: sample stddev/
    variance, Pearson correlation, sample covariance, and OLS slope of value
    on hour-of-day — the drift-monitoring battery. All are single-pass
    partial+final aggregates (Spark's merge formulas are the numerically
    stable pairwise updates). Double sums of ~1e4 products differ across
    engines only at the ~1e-12 relative level, far below the 6-decimal
    ROUND both sides apply; values sit nowhere near .5e-6 rounding
    boundaries (cf. verify gotchas)."""
    e = _events(spark, sf_dir)
    hr = F.hour("ts").cast("double")
    return e.groupBy("event_type").agg(
        PAR.round6(F.stddev_samp("value")).alias("sd_value"),
        PAR.round6(F.var_samp("value")).alias("var_value"),
        PAR.round6(F.corr(F.col("value"), hr)).alias("corr_value_hour"),
        PAR.round6(F.covar_samp(F.col("value"), hr)).alias("covar_value_hour"),
        PAR.round6(F.regr_slope(F.col("value"), hr)).alias("slope_value_on_hour"),
    )


@register(
    "q_scalar_calendar",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           -- both engines' month-add preserves time-of-day and clamps the
           -- day-of-month; the Spark side uses timestamp + INTERVAL (NOT
           -- add_months, which returns a DATE and silently truncates the
           -- time — invisible on midnight-aligned stamps, divergent on any
           -- intraday data; caught by the r8 parity fuzz)
           CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS dow_sunday0,
           CAST(EXTRACT(DOY FROM o_orderdate) AS INT) AS doy,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
             AS days_since_epoch_start
    FROM orders WHERE o_orderkey < 200
    """,
)
def q_scalar_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: quarter truncation, month end, calendar
    month addition (timestamp + INTERVAL in BOTH engines: preserves
    time-of-day and clamps day-of-month identically — add_months would
    return a DATE and truncate the time, which matches only on
    midnight-aligned stamps; the r8 parity fuzz caught exactly that
    divergence on jittered data), day-of-week (normalized to Sunday=0:
    Spark's dayofweek is 1-based Sunday-first, DuckDB's DOW is 0-based
    Sunday-first), day-of-year, and day differences. All integer-exact —
    no rounding discipline needed."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL '3' MONTH"))
        .cast("timestamp")
        .alias("plus_3m"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sunday0"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).cast("int").alias("days_since_epoch_start"),
    )


@register(
    "q_events_forecast_trend",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    fit AS (
      SELECT event_type,
             MAX(bucket) AS last_bucket,
             regr_slope(y, date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', bucket)) AS slope,
             regr_intercept(y, date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', bucket)) AS icept
      FROM hourly GROUP BY event_type)
    SELECT f.event_type,
           CAST(h.h AS INT) AS horizon_h,
           CAST(f.last_bucket + h.h * INTERVAL 1 HOUR AS TIMESTAMP) AS bucket,
           FLOOR((f.icept + f.slope *
                 (date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', f.last_bucket) + h.h)) * 1e6 + 0.5) / 1e6
             AS yhat
    FROM fit f CROSS JOIN (SELECT unnest(range(1, 25)) AS h) h
    """,
)
def q_events_forecast_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped trend forecasting: per series, OLS-fit the hourly aggregate
    against hours-since-epoch-start and project the next 24 hours — the
    capacity-planning baseline every metrics store bolts on (Holt-Winters'
    level+trend component without the seasonal term; the seasonal naive is
    a join away via q_events_gap_fill's grid machinery). One pass builds the
    hourly series (DECIMAL sums — the regression INPUTS are engine-exact),
    one grouped regr_slope/intercept aggregate fits every series in
    parallel, and the horizon explodes from the per-series fit row — the
    forecast relation never touches the fact table. regr_* over ~720 exact
    doubles differs across engines at ~1e-12 relative; ROUND(...,6) on both
    sides sits far above it."""
    e = _events(spark, sf_dir)
    epoch = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum(_dec("value")).cast("double").alias("y"))
    x = (F.unix_timestamp("bucket") - F.unix_timestamp(epoch)) / 3600
    fit = hourly.groupBy("event_type").agg(
        F.max("bucket").alias("last_bucket"),
        F.regr_slope(F.col("y"), x).alias("slope"),
        F.regr_intercept(F.col("y"), x).alias("icept"),
    )
    x_last = (F.unix_timestamp("last_bucket") - F.unix_timestamp(epoch)) / 3600
    return (
        fit.select(
            "event_type", "last_bucket", "slope", "icept",
            F.explode(F.sequence(F.lit(1), F.lit(24))).alias("horizon_h"),
        )
        .select(
            "event_type",
            F.col("horizon_h").cast("int").alias("horizon_h"),
            (
                F.col("last_bucket")
                + F.make_interval(hours=F.col("horizon_h"))
            ).alias("bucket"),
            PAR.round6(F.col("icept") + F.col("slope") * (x_last + F.col("horizon_h"))).alias("yhat"),
        )
    )


@register(
    "q_events_rolling_window",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum_1h,
           CAST(COUNT(*) OVER w AS BIGINT) AS roll_n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_events_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval rolling aggregates: per user, the trailing-1-hour sum
    and count at every event — the RANGE-frame (value-based) window the row
    frames in q_window_frames_ntile cannot express (events are irregularly
    spaced; "last N rows" is not "last hour"). The frame is keyed on
    MICROSECOND epoch on both engines (unix_timestamp is second-granular
    and would disagree with DuckDB's microsecond interval arithmetic at the
    frame boundary); sums are DECIMAL inside the frame, presented as
    DOUBLE. Rows sharing (user, ts) are RANGE-frame peers in both engines,
    so their rolling values are identical and the output is deterministic
    without a total order. Scale: one hash shuffle on user_id, then a
    single sorted streaming pass per partition with a sliding frame — state
    is the in-frame window, never the series; skewed users are bounded by
    their own event rate times one hour."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(_dec("value")).over(w).cast("double").alias("roll_sum_1h"),
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n_1h"),
    )


@register(
    "q_events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
    SELECT e.event_id, e.event_type, e.value,
           FLOOR((d.med) * 1e6 + 0.5) / 1e6 AS med,
           FLOOR((m.mad) * 1e6 + 0.5) / 1e6 AS mad,
           FLOOR(((e.value - d.med) / (1.4826 * m.mad)) * 1e6 + 0.5) / 1e6 AS robust_z
    FROM events e JOIN med d USING (event_type) JOIN mad m USING (event_type)
    WHERE abs(e.value - d.med) > 3 * 1.4826 * m.mad
    """,
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per series: flag events whose value sits more
    than 3 robust standard deviations (1.4826 * MAD — the Gaussian
    consistency constant) from the series median. Median/MAD are the
    outlier-immune location/scale pair — the winsorized battery's
    monitoring twin, but as a per-ROW flag stream (the alerting shape)
    rather than per-series aggregates. Two aggregation passes over the
    fact (median, then median of absolute deviations) with the per-series
    cutoffs joined back — series counts are tiny, so AQE broadcasts both
    join sides' small relations un-hinted. Exact medians are sort-based
    per group; at 100 TB swap to approx_percentile(0.5) (mergeable sketch,
    no per-group sort) — exact kept here because interpolated medians over
    identical double multisets are IEEE-identical on both engines, making
    the strict > threshold deterministic."""
    e = _events(spark, sf_dir)
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        e.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    return (
        e.join(med, "event_type")
        .join(mad, "event_type")
        .filter(
            F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            PAR.round6("med").alias("med"),
            PAR.round6("mad").alias("mad"),
            PAR.round6((F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))).alias("robust_z"),
        )
    )


@register(
    "q_events_sliding_window",
    oracle="""
    SELECT date_trunc('hour', ts) - to_hours(h) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events, (VALUES (0), (1)) AS offs(h)
    GROUP BY 1, 2
    """,
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation: 2-hour windows every hour per
    event type — the overlapping-window shape the tumbling query cannot
    express (each event lands in windowSize/slide = 2 windows; Spark's
    F.window materializes the membership explode natively, and the SAME
    expression runs under a watermark in streaming — this batch shape is
    the oracle-checkable twin). The oracle derives each event's two
    aligned window starts arithmetically (floor-hour and floor-hour minus
    one) — by construction identical to Spark's slide alignment for
    epoch-aligned slides. DECIMAL sums; one shuffle on (window, type)
    after a 2x explode — at 100 TB the multiplier is the window/slide
    ratio, the reason long windows with tiny slides are served from the
    H17 rollup instead."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )


@register(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
      SELECT NULLIF(lang, 'en') AS lang_key, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1, 2),
    w AS (
      SELECT NULLIF(lang, 'en') AS lang_key,
             CAST(SUM(n_chars) AS BIGINT) AS lang_chars
      FROM documents GROUP BY 1)
    SELECT a.lang_key, a.source, a.n_docs, w.lang_chars
    FROM a JOIN w ON a.lang_key IS NOT DISTINCT FROM w.lang_key
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM) — the join-surface
    row a plain equi-join cannot express: NULL keys must MATCH each other
    instead of silently dropping (here the majority 'en' class is NULLIF'd
    to NULL on both sides, so the null-safe join must carry it through
    while ordinary equality would lose every 'en' row). eqNullSafe keys
    still compile to a hash-partitionable equi-join (NULLs co-locate like
    any other key value — no fallback to nested-loop), so the shape scales
    exactly like q_join_left."""
    d = _t(spark, sf_dir, "documents")
    key = F.nullif(F.col("lang"), F.lit("en")).alias("lang_key")
    a = d.groupBy(key, "source").agg(F.count("*").cast("long").alias("n_docs"))
    w = d.groupBy(key).agg(F.sum("n_chars").cast("long").alias("lang_chars"))
    return a.join(w, a.lang_key.eqNullSafe(w.lang_key)).select(
        a.lang_key, "source", "n_docs", "lang_chars"
    )


@register(
    "q_events_metrics_pipeline",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2),
    spans AS (SELECT event_type, MIN(bucket) AS h0, MAX(bucket) AS h1
              FROM hourly GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
             FROM spans),
    filled AS (
      SELECT g.event_type, g.bucket,
             CAST(last_value(hy.v IGNORE NULLS) OVER (
                    PARTITION BY g.event_type ORDER BY g.bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS filled_value,
             hy.v IS NULL AS is_gap
      FROM grid g LEFT JOIN hourly hy
        ON hy.event_type = g.event_type AND hy.bucket = g.bucket),
    med AS (SELECT event_type, median(filled_value) AS med FROM filled GROUP BY 1),
    mad AS (SELECT f.event_type, median(abs(f.filled_value - m.med)) AS mad
            FROM filled f JOIN med m USING (event_type) GROUP BY 1)
    SELECT f.event_type, CAST(f.bucket AS TIMESTAMP) AS bucket,
           f.filled_value, f.is_gap,
           FLOOR(((f.filled_value - d.med) / (1.4826 * m.mad)) * 1e6 + 0.5) / 1e6 AS robust_z
    FROM filled f JOIN med d USING (event_type) JOIN mad m USING (event_type)
    WHERE abs(f.filled_value - d.med) > 3 * 1.4826 * m.mad
    """,
)
def q_events_metrics_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed metrics-store capstone (the events-side twin of
    q_doc_curation_pipeline): hourly DECIMAL rollup -> per-series gap fill
    with forward-fill carry -> median/MAD robust anomaly flags over the
    FILLED series — the full raw-stream-to-alert path a monitoring
    pipeline runs, verified as a COMPOSITION (the oracle recomputes all
    three stages chained, so stage boundaries — the carried fill feeding
    the detector, gaps eligible to alert — are hash-certified, not just
    each stage alone). Flagging the filled series matters: a gap bucket
    carrying a stale high value KEEPS alerting until the series recovers
    (9 of the 94 sf0.01 flags are on synthesized buckets — exactly the
    stuck-metric signal). Scale shape inherits from the stages: one
    fact-table pass, span-bounded grids, series-keyed joins, category-
    sized median relations AQE-broadcast back."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum(_dec("value")).alias("v"))
    spans = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("h0"), F.max("bucket").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        grid.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.last("v", ignorenulls=True).over(w).cast("double").alias("filled_value"),
            F.col("v").isNull().alias("is_gap"),
        )
        .persist()
    )
    med = filled.groupBy("event_type").agg(F.median("filled_value").alias("med"))
    mad = (
        filled.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("filled_value") - F.col("med"))).alias("mad"))
    )
    return (
        filled.join(med, "event_type")
        .join(mad, "event_type")
        .filter(
            F.abs(F.col("filled_value") - F.col("med"))
            > 3 * 1.4826 * F.col("mad")
        )
        .select(
            "event_type",
            "bucket",
            "filled_value",
            "is_gap",
            PAR.round6((F.col("filled_value") - F.col("med")) / (1.4826 * F.col("mad"))).alias("robust_z"),
        )
    )


@register(
    "q_events_attribution",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('click','view') THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_id,
             last_value(CASE WHEN event_type IN ('click','view') THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_ts,
             last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_ty
      FROM events)
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN ok THEN t_id END AS touch_event_id,
           CASE WHEN ok THEN t_ty END AS touch_type,
           CASE WHEN ok THEN g END AS gap_us
    FROM (SELECT *, epoch_us(ts) - epoch_us(t_ts) AS g,
                 (epoch_us(ts) - epoch_us(t_ts)) <= 86400000000 AS ok
          FROM w WHERE event_type = 'purchase') x
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution with a 24 h lookback: every purchase is credited
    to the user's most recent preceding click/view, or left organic (NULLs)
    when none exists within the window. One carry-forward window pass
    (last+ignoreNulls over ROWS UNBOUNDED PRECEDING..1 PRECEDING) — a single
    shuffle on user_id, no self-join against the touch stream (the join
    formulation re-shuffles purchases AND touches, then needs a rank-1 cut;
    the carry-forward is strictly narrower). Total (ts, event_id) ordering
    makes the credited touch engine-deterministic; the gap is exact integer
    microseconds."""
    e = _events(spark, sf_dir)
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = e.withColumns(
        {
            "t_id": F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w),
            "t_ts": F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w),
            "t_ty": F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w),
        }
    ).filter(F.col("event_type") == "purchase")
    gap = F.expr("unix_micros(ts)") - F.expr("unix_micros(t_ts)")
    ok = gap <= F.lit(86_400_000_000)
    return carried.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(ok, F.col("t_id")).alias("touch_event_id"),
        F.when(ok, F.col("t_ty")).alias("touch_type"),
        F.when(ok, gap).alias("gap_us"),
    )


@register(
    "q_events_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT event_id AS touch_event_id, user_id, event_type AS touch_type,
             epoch_us(ts) AS t_us
      FROM events WHERE event_type IN ('click','view')),
    j AS (
      SELECT p.purchase_id, p.user_id, t.touch_event_id, t.touch_type,
             p.p_us - t.t_us AS gap_us
      FROM p JOIN t ON p.user_id = t.user_id
      WHERE (t.t_us < p.p_us
             OR (t.t_us = p.p_us AND t.touch_event_id < p.purchase_id))
        AND p.p_us - t.t_us <= 86400000000),
    n AS (SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_touches
          FROM j GROUP BY purchase_id)
    SELECT j.purchase_id, j.user_id, j.touch_event_id, j.touch_type, j.gap_us,
           n.n_touches,
           CAST(FLOOR((CAST(1.0 AS DOUBLE) / n.n_touches) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS credit
    FROM j JOIN n ON j.purchase_id = n.purchase_id
    UNION ALL
    SELECT p.purchase_id, p.user_id, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)
    FROM p LEFT JOIN n ON p.purchase_id = n.purchase_id
    WHERE n.purchase_id IS NULL
    """,
)
def q_events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution, the fractional-credit companion to the
    last-touch carry-forward above: every click/view in the purchase's 24 h
    lookback shares the credit equally (1/n per touch), organic purchases
    (no touch in window) emit one zero-touch row so the purchase population
    is conserved. Strictly-before is the (ts, event_id) tuple order — same
    total order as last-touch, so ties are engine-deterministic.

    Shape: purchases ⋈ touches is a USER-keyed equi-join (one shuffle; the
    time predicate filters inside the join, never a time-axis cross join).
    The credited-pair relation is consumed THREE times (fan-in count,
    credit join-back, organic anti-join), so it persists eagerly — without
    the cache each leg replays the scan+join (measured 7 FileScans in the
    lazy plan); with it, one join pass + cached reads, and the cached
    relation is OUTPUT-sized (credit rows), not corpus-sized. Per-touch
    credit is 1/n on exact integer counts — no accumulation-order float
    risk; gaps are exact integer microseconds."""
    e = _events(spark, sf_dir)
    us = F.expr("unix_micros(ts)")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", us.alias("p_us")
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_event_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        us.alias("t_us"),
    )
    before = (F.col("t_us") < F.col("p_us")) | (
        (F.col("t_us") == F.col("p_us"))
        & (F.col("touch_event_id") < F.col("purchase_id"))
    )
    j = (
        p.join(t, "user_id")
        .filter(before & ((F.col("p_us") - F.col("t_us")) <= 86_400_000_000))
        .select(
            "purchase_id", "user_id", "touch_event_id", "touch_type",
            (F.col("p_us") - F.col("t_us")).alias("gap_us"),
        )
        .persist()
    )
    j.count()  # eager: three downstream lineages read it (see docstring)
    n = j.groupBy("purchase_id").agg(
        F.count("*").cast("long").alias("n_touches")
    )
    credited = j.join(n, "purchase_id").select(
        "purchase_id", "user_id", "touch_event_id", "touch_type", "gap_us",
        "n_touches",
        PAR.round6(F.lit(1.0) / F.col("n_touches")).alias("credit"),
    )
    organic = p.join(n, "purchase_id", "left_anti").select(
        "purchase_id",
        "user_id",
        F.lit(None).cast("long").alias("touch_event_id"),
        F.lit(None).cast("string").alias("touch_type"),
        F.lit(None).cast("long").alias("gap_us"),
        F.lit(0).cast("long").alias("n_touches"),
        F.lit(None).cast("double").alias("credit"),
    )
    return credited.unionByName(organic)


@register(
    "q_events_throttle_batch",
    oracle="""
    SELECT event_id, user_id,
           CAST(CASE WHEN rn <= 5 THEN 1 ELSE 0 END AS INT) AS passed
    FROM (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, epoch_us(ts) // 3600000000
               ORDER BY ts, event_id) AS rn
      FROM events) t
    """,
)
def q_events_throttle_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/state.throttle_stream (H25): per (user, event-
    time hour) budget of 5 — events beyond the budget, in (ts, event_id)
    arrival order, are marked suppressed. Same verdicts as the stateful
    streaming fold on the same input (the stream folds in (event_sec, seq)
    order; the batch form is the window-rank formulation of that fold), so a
    backfill and the live stream agree row for row. passed is INT 0/1, never
    boolean (driver-hash stringification contract). One shuffle on
    (user, hour) — strictly narrower keys than the stream's per-key state.

    Hour bucketing is FLOOR division ((x - pmod(x, b)) div b, exact integer
    arithmetic), matching DuckDB's `//` for negative epochs too — Spark's
    bare `div` truncates toward zero and would diverge on pre-1970 data."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy(
        "user_id",
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000"
        ),
    ).orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.row_number().over(w) <= 5).cast("int").alias("passed"),
    )


@register(
    "q_pareto_frontier",
    oracle="""
    WITH s AS (SELECT p_partkey, p_size,
                      CAST(length(p_name) AS INT) AS name_len, p_retailprice
               FROM part)
    SELECT p.p_partkey, p.p_size, p.name_len,
           FLOOR((p.p_retailprice) * 1e6 + 0.5) / 1e6 AS retail_price
    FROM s p
    WHERE NOT EXISTS (
      SELECT 1 FROM s q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size AND q.name_len >= p.name_len
        AND (q.p_retailprice < p.p_retailprice
             OR q.p_size > p.p_size OR q.name_len > p.name_len))
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of parts: cheapest price vs largest size vs
    longest name — the multi-objective analog of top-k (SURVEY §2.E [absent]
    extension; no reference counterpart). operators/skyline: per-partition
    sort-filter prune inside mapInPandas (dominated rows never leave their
    partition), then a dominance anti-join over the surviving candidates only.
    Cross-engine parity is comparison-only (no arithmetic on the double
    dimension), so the frontier membership is exactly decidable; the price is
    ROUNDed to the repo's 6-decimal grid for the value hash."""
    from plenario_mapper_spark.operators.skyline import pareto_frontier

    s = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.length("p_name").cast("int").alias("name_len"),
        "p_retailprice",
    )
    fr = pareto_frontier(
        s, minimize=["p_retailprice"], maximize=["p_size", "name_len"]
    )
    return fr.select(
        "p_partkey",
        "p_size",
        "name_len",
        PAR.round6("p_retailprice").alias("retail_price"),
    )
