"""Physical-plan regression tests for scale-critical properties.

Correctness tests can't catch a plan that silently degrades (a fact table
slipping onto a broadcast build side, a pruned column creeping back into the
scan). These pin the plan shapes at sf0.1 — the scale where the estimates
actually diverge between dims and facts."""

import re

from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.1"


def _plan(df) -> str:
    from tests.conftest import final_plan

    return final_plan(df)


def _broadcast_subtrees(plan: str):
    """Yield the subtree text of each BroadcastExchange in a tree-formatted plan."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-*("))
        sub = [line]
        for nxt in lines[i + 1 :]:
            nxt_indent = len(nxt) - len(nxt.lstrip(" :+-*("))
            if nxt.strip() and nxt_indent <= indent:
                break
            sub.append(nxt)
        yield "\n".join(sub)


def test_q3_never_broadcasts_lineitem(spark):
    """The 1MB-estimate threshold must keep the filtered fact table off the
    static broadcast build side (it mis-estimated as 'small' at 64MB and
    broadcast 320k rows)."""
    plan = _plan(QUERIES["q3_shipping_priority"](spark, SF))
    for sub in _broadcast_subtrees(plan):
        assert "lineitem.parquet" not in sub, sub


def test_q5_supplier_broadcast_is_estimate_driven_not_hinted(spark):
    """Supplier scales with sf (~1B rows at 100 TB), so q5 must not pin it with
    a broadcast HINT — only catalog-constant nation/region carry hints. A hint
    broadcasts regardless of size thresholds, so disabling both thresholds
    separates the two: hinted nation/region still broadcast, estimate-driven
    supplier must fall back to a shuffle join."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = _plan(QUERIES["q5_local_supplier"](spark, SF))
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    subs = list(_broadcast_subtrees(plan))
    assert any("nation.parquet" in s for s in subs), plan
    for sub in subs:
        assert "supplier.parquet" not in sub, sub


def test_q1_scan_is_pruned_and_pushed(spark):
    """Q1 reads 7 of lineitem's 16 columns and pushes the shipdate filter into
    the parquet scan."""
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF))
    assert "l_comment" not in plan
    assert "l_partkey" not in plan
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan


def test_q1_aggregates_map_side_before_shuffle(spark):
    """Partial aggregation must run before the single exchange — at 100 TB the
    shuffle carries one row per (returnflag, linestatus) partial, not 6B rows."""
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF))
    assert "partial_" in plan
    assert plan.count("Exchange") <= 2, plan  # one agg exchange (+AQE read)


def test_mapper_route_single_broadcast_no_agg_shuffle(spark):
    """The mapper hot path: one broadcast (the KB-sized registry), no other
    exchange beyond the parallelism repartition of the single-split input."""
    plan = _plan(QUERIES["q_mapper_route_events"](spark, SF))
    assert plan.count("BroadcastExchange") == 1, plan
    # repartition shows as one round-robin exchange; no hash-partition shuffles
    assert plan.count("hashpartitioning") == 0, plan


def test_mapper_split_is_single_pass(spark):
    """The combined route+dead-letter query must scan events ONCE — the whole
    point of the conditional-explode formulation (two separate lineages would
    re-run scan+annotate per output)."""
    plan = _plan(QUERIES["q_mapper_split_events"](spark, SF))
    assert plan.count("events.parquet") == 1, plan


def test_unpivot_is_single_scan_no_shuffle(spark):
    """unpivot compiles to one Expand over one pruned scan — no Exchange, and
    NOT the oracle's three-scan UNION ALL shape."""
    plan = _plan(QUERIES["q_unpivot"](spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Expand" in plan
    assert "Exchange" not in plan, plan


def test_pivot_is_single_aggregate(spark):
    """Known pivot values compile to conditional aggregates: one scan, partial
    agg map-side, a single shuffle on the group key — no distinct-values job,
    no transpose."""
    plan = _plan(QUERIES["q_pivot"](spark, SF))
    assert plan.count("orders.parquet") == 1, plan
    assert "partial_" in plan
    assert plan.count("Exchange") <= 2, plan


def test_stratified_sample_is_narrow_filter(spark):
    """Hash-gate sampling is a pure filter: no Exchange anywhere, single scan —
    at 100 TB it runs at scan speed with zero state."""
    plan = _plan(QUERIES["q_sample_stratified"](spark, SF))
    assert plan.count("documents.parquet") == 1, plan
    assert "Exchange" not in plan, plan


def test_dedup_survivors_has_no_global_sort(spark):
    """The survivors projection is order-insensitive; a trailing orderBy would
    range-shuffle the whole surviving corpus at 100 TB. Pin: no global Sort /
    RangePartitioning in the final plan (the CC stage's own exchanges are
    hash-partitioned)."""
    plan = _plan(QUERIES["q_dedup_survivors"](spark, SF))
    assert "rangepartitioning" not in plan.lower(), plan
    assert not re.search(r"Sort \[doc_id", plan), plan


def test_topk_per_group_pushes_window_group_limit(spark):
    """The single-window rn <= 3 filter must compile to WindowGroupLimit below
    the sort: at 100 TB each partition keeps a 3-row heap instead of sorting
    every customer's orders before filtering."""
    plan = _plan(QUERIES["q_topk_per_group"](spark, SF))
    assert "WindowGroupLimit" in plan, plan


def test_decontaminate_benchmark_side_broadcasts(spark):
    """The benchmark gram set must BROADCAST (eval suites are KBs against a
    100 TB corpus) so the corpus gram stream is probed map-side; the only
    shuffles are the bench distinct and the per-doc count — never the raw
    corpus gram stream through a join shuffle."""
    plan = _plan(QUERIES["q_doc_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_assign_broadcasts_centroids_and_keeps_vectors_narrow(spark):
    """Centroid scoring must be a broadcast nested-loop/hash join of K rows —
    a shuffle of the vector side here would move every embedding at 100 TB."""
    plan = _plan(QUERIES["q_embed_kmeans_assign"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan  # broadcast NL is fine; full cartesian is not


def test_gopher_repetition_joins_copartitioned_on_doc_id(spark):
    """Word stats and trigram stats both aggregate keyed by doc_id, so each
    side must show two-phase aggregation (map-side partial before its
    exchange) — the property that keeps the gram streams combine-able."""
    plan = _plan(QUERIES["q_doc_gopher_repetition"](spark, SF))
    # both aggregations are two-phase (partial before the exchange)
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 4


def test_q6_all_predicates_reach_the_scan(spark):
    """Q6 is the pushdown litmus: shipdate range, discount band, and quantity
    cap must all appear in the parquet scan's PushedFilters — a Q6 that
    filters post-scan reads the whole fact table at 100 TB."""
    plan = _plan(QUERIES["q6_forecast_revenue"](spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in line, f"{col} not pushed: {line}"


def test_q8_dimension_chain_broadcasts(spark):
    """Q8's nation(x2)/region/part dimension chain must broadcast — the
    fact-fact joins are the only shuffles a 7-table star should pay."""
    plan = _plan(QUERIES["q8_market_share"](spark, SF))
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan


def test_q17_part_join_is_estimate_driven_not_hinted(spark):
    """Part scales with SF (~100M rows survive the brand/size filter at
    100 TB), so q17 must not pin it with a broadcast HINT — same policy the
    q5 supplier test enforces. With thresholds disabled, an un-hinted part
    must fall back to a shuffle join."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plan = _plan(QUERIES["q17_small_quantity_revenue"](spark, SF))
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    for sub in _broadcast_subtrees(plan):
        assert "part.parquet" not in sub, sub


def test_q15_scalar_max_broadcasts_not_sorts(spark):
    """The revenue view's scalar MAX must reach the filter as a broadcast
    one-row table — not via any global sort of the revenue relation."""
    plan = _plan(QUERIES["q15_top_supplier"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q22_cutoff_broadcasts_and_anti_join_present(spark):
    """The scalar-average cutoff is a one-row broadcast; the idle test compiles
    to a genuine anti join (no correlated re-execution per row)."""
    plan = _plan(QUERIES["q22_idle_balances"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "LeftAnti" in plan or "anti" in plan.lower(), plan


def test_dedup_incremental_is_anti_join_with_bucket_pruning(spark):
    """The serve path must compile to a genuine anti join against the
    persisted index keyed (bucket, fp) — never a cartesian or a full
    re-dedup of both relations — AND the index scan must carry a static
    bucket PartitionFilter (DPP does not cover a LeftAnti right side, so
    without the explicit isin the whole corpus index is scanned and
    broadcast per batch)."""
    plan = _plan(QUERIES["q_dedup_incremental"](spark, SF))
    assert "LeftAnti" in plan or "anti" in plan.lower(), plan
    assert "CartesianProduct" not in plan
    idx_scans = [
        ln for ln in plan.splitlines() if "fps" in ln and "PartitionFilters" in ln
    ]
    assert idx_scans, plan
    assert any(
        "INSET" in ln.split("PartitionFilters")[1] or "isin" in ln.lower()
        for ln in idx_scans
    ), idx_scans


def test_q4_exists_compiles_to_semi_join(spark):
    """Q4's EXISTS must be a LEFT SEMI (one probe per order, however many
    matching lineitems) — never an inner join + distinct, which would
    duplicate-then-dedup the fact table at 100 TB."""
    plan = _plan(QUERIES["q4_order_priority"](spark, SF))
    assert "LeftSemi" in plan or "semi" in plan.lower(), plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed), plan
    assert any("l_returnflag" in ln for ln in pushed), plan


def test_q19_envelope_predicates_reach_both_scans(spark):
    """The OR-of-ANDs references both sides, but its single-side envelopes
    (brand IN / quantity range) must still be inferred and pushed to each
    scan — a Q19 that evaluates the disjunction only at the join reads both
    tables whole."""
    plan = _plan(QUERIES["q19_disjunctive_revenue"](spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_brand" in ln for ln in pushed), plan
    assert any("l_quantity" in ln for ln in pushed), plan
    assert "CartesianProduct" not in plan


def test_q21_self_joins_key_on_orderkey_only(spark):
    """Both correlated-subquery legs must lower to semi/anti joins keyed on
    l_orderkey (the inequality stays a residual condition) — a plan that
    turned the <> correlate into the join key would be a cartesian per
    order. All lineitem legs must also prune to the two-column
    (orderkey, suppkey) projection."""
    plan = _plan(QUERIES["q21_waiting_suppliers"](spark, SF))
    assert ("LeftSemi" in plan or "semi" in plan.lower()), plan
    assert ("LeftAnti" in plan or "anti" in plan.lower()), plan
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "lineitem.parquet" in ln and "ReadSchema" in ln:
            assert "l_extendedprice" not in ln, ln


def test_q2_region_reduction_broadcasts_supply_min_reuses_shuffle(spark):
    """The supplier->nation->region reduction must reach lineitem as a
    broadcast; the per-part best-cost aggregate and its probe co-key on
    l_partkey, so the decorrelated min must not introduce a range/global
    sort anywhere."""
    plan = _plan(QUERIES["q2_min_cost_supplier"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q11_supval_is_computed_once(spark):
    """The grouped view feeds both the row stream and the grand total; the
    plan must reuse the aggregate's exchange (ReusedExchange or a reused
    subquery), not recompute the lineitem scan twice... Spark reuses
    exchanges only when the subtrees are identical — assert at most 2
    lineitem scans (one per consumer) and that the one-row total arrives
    via broadcast, not a sort."""
    plan = _plan(QUERIES["q11_important_parts"](spark, SF))
    assert "BroadcastExchange" in plan
    n_scans = sum(
        1 for ln in plan.splitlines()
        if "lineitem.parquet" in ln and "Scan parquet" in ln
    )
    reused = "ReusedExchange" in plan or "ReusedSubquery" in plan
    assert reused or n_scans <= 2, plan


def test_tpch_completion_set_has_no_sf_scaling_broadcast_hints(spark):
    """Q2/Q11/Q16/Q20's derived supplier/part sets scale with SF, so none may
    be pinned with a broadcast HINT — same policy as the q5-supplier and
    q17-part tests. With both thresholds disabled, only the catalog-constant
    nation/region hints may broadcast; any supplier/part/lineitem relation on
    a broadcast build side means a hint crept back in."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        for q in (
            "q2_min_cost_supplier",
            "q11_important_parts",
            "q16_supplier_count",
            "q20_promotion_suppliers",
        ):
            # bypass the registry's per-session plan cache: another test may
            # have built this query under NORMAL thresholds, and a cached
            # DataFrame's physical plan keeps the conf it was planned with —
            # the estimate-driven broadcasts it legitimately had would read
            # as hint violations here
            plan = _plan(QUERIES[q].__wrapped__(spark, SF))
            for sub in _broadcast_subtrees(plan):
                if "HashAggregate(keys=[]" in sub:
                    continue  # one-row scalar reduction (q11's grand total):
                    # broadcasting it is right regardless of what it scanned
                for fact in ("supplier.parquet", "part.parquet", "lineitem.parquet"):
                    assert fact not in sub, (q, sub)
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_triangles_all_joins_are_equi_no_cartesian(spark):
    """The degree-oriented wedge join must compile to hash/sort-merge
    equi-joins throughout: a CartesianProduct or BroadcastNestedLoopJoin in
    this plan means the orientation/blocking collapsed to all-pairs, the
    exact O(n^2) cliff the operator exists to avoid. (The wedge join's
    e1.dst < e2.dst leaf ordering rides the src equi-key as a post-join
    filter, not a join strategy.)"""
    plan = _plan(QUERIES["q_graph_triangles"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_rolling_window_single_user_shuffle_with_range_frame(spark):
    """The trailing-1h window must be one hash shuffle on user_id feeding a
    RANGE-frame Window — a second non-AQE exchange or a missing running
    frame means the sliding pass degraded to something that rescans."""
    plan = _plan(QUERIES["q_events_rolling_window"](spark, SF))
    user_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "user_id" in ln
    ]
    assert len(user_exchanges) == 1, plan
    assert re.search(r"specifiedwindowframe\(RangeFrame", plan, re.I), plan


def test_nullsafe_join_hash_partitions_not_nested_loop(spark):
    """eqNullSafe keys must stay a hash-partitionable equi-join (NULLs
    co-locate like any key value); BroadcastNestedLoopJoin here would mean
    the null-safe predicate fell off the equi-key path and the join went
    quadratic."""
    plan = _plan(QUERIES["q_join_nullsafe"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """At 100 TB the fact side of a selective shuffle join should be pre-filtered
    by a runtime bloom filter built from the dim side (Spark injects it when the
    application side scan exceeds ~10 GB — far above local testdata, so this
    pins the mechanism with the threshold floored; the 100 TB conf keeps the
    default). Both the bloom_filter_agg build and the might_contain probe must
    appear in the physical plan."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        l = spark.read.parquet(f"{SF}/lineitem.parquet")
        p = spark.read.parquet(f"{SF}/part.parquet").filter(F.col("p_size") < 3)
        j = l.join(p, l.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = _plan(j)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_attribution_single_user_shuffle_no_self_join(spark):
    """Last-touch attribution must stay the carry-forward window form: one
    hash exchange on user_id and zero joins — a SortMergeJoin or second
    exchange means it degraded to the purchases-vs-touches self-join."""
    plan = _plan(QUERIES["q_events_attribution"](spark, SF))
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "user_id" in ln
    ]
    assert len(exchanges) == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan


def test_sessions_closed_broadcasts_global_max(spark):
    """The end-of-input watermark is a one-row broadcast folded into the
    filter, never a cartesian against the session relation; the session
    windows and the aggregate share the user_id shuffle."""
    plan = _plan(QUERIES["q_events_sessions_closed"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # the watermark side is a SECOND pass over events but must prune to the
    # single ts column (folding it into the session agg would need a
    # single-partition window over the corpus-sized session relation — the
    # 1-column re-scan is the cheaper honest cost at scale)
    import re as _re

    # encoding-agnostic: the driver has shipped ts as NTZ/LTZ/nanos-long in
    # different rounds; the contract is one-column pruning, not the type
    schemas = _re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert any(s.split(":")[0] == "ts" and "," not in s for s in schemas), schemas


def test_oov_rate_vocab_is_broadcast(spark):
    """The induced top-30 vocabulary must reach the per-instance probe as a
    broadcast — a token-keyed shuffle of the exploded corpus against a
    30-row dim would be the classic small-side mistake at scale."""
    plan = _plan(QUERIES["q_doc_oov_rate"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_attribution_linear_never_cartesian(spark):
    """Purchases x touches joins on user_id with the lookback as a join-side
    filter — a time-axis cross join would be quadratic at 100 TB."""
    plan = _plan(QUERIES["q_events_attribution_linear"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_psi_single_scan(spark):
    """The whole PSI vector (buckets, both sides, totals) derives from ONE
    pass over documents; totals ride a one-row broadcast."""
    plan = _plan(QUERIES["q_doc_psi_length_drift"](spark, SF))
    assert plan.count("FileScan parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_release_query_caches_spares_caller_caches(spark):
    """release_query_caches must unpersist ONLY registry-owned blocks
    (VERDICT r6 item 7): a library caller's own persisted relation survives
    the release, while the registry query's persisted intermediates (tracked
    by the build-time persist interception) are gone."""
    from pyspark import StorageLevel

    from plenario_mapper_spark.plans.registry import (
        _OWNED_PERSISTS,
        _PLAN_CACHE,
        release_query_caches,
    )

    mine = spark.range(1000).selectExpr("id", "id * 2 AS dbl").persist()
    mine.count()
    assert mine.storageLevel.useMemory

    # q_dedup_minhash persists signature/candidate/shingle intermediates
    QUERIES["q_dedup_minhash"](spark, "/root/testdata/sf0.001").count()
    owned = list(_OWNED_PERSISTS.get(spark, []))
    assert owned, "registry build tracked no persists — interception broken"
    # an operator may release its own SETUP-ONLY cache early (r12: pagerank
    # unpersists the raw edge relation once its derived statics materialize)
    # — those tracked frames are legitimately dead before the release; the
    # interception property needs at least one still-live owned persist
    assert any(df.storageLevel != StorageLevel.NONE for df in owned)
    # the caller's DataFrame was persisted outside any registry build
    assert all(df is not mine for df in owned)

    release_query_caches(spark)

    assert mine.storageLevel.useMemory, "caller-owned cache was clobbered"
    assert mine.count() == 1000
    assert all(df.storageLevel == StorageLevel.NONE for df in owned)
    assert spark not in _OWNED_PERSISTS or not _OWNED_PERSISTS[spark]
    assert spark not in _PLAN_CACHE or not _PLAN_CACHE[spark]
    mine.unpersist()


def _executed_view(df) -> str:
    """Text-form executed view: drop InMemoryRelation child plans FIRST
    (those scans ran once at persist time; a cached child built under AQE
    even embeds its own '== Initial Plan ==' marker, which would amputate
    the outer plan if sliced first), THEN cut the outer Initial section.
    KNOWN LIMIT: a DEEPLY-nested InMemoryRelation embeds its child at a
    RESET indentation that defeats the depth-based skip — use _outer_nodes
    (the JVM tree walk, same approach as tools/plan_audit.outer_nodes) for
    assertions on cache-heavy plans."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out, skip_depth = [], None
    for ln in plan.splitlines():
        m = re.search(r"[A-Za-z=*]", ln)
        depth = m.start() if m else 0
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            skip_depth = None
        out.append(ln)
        if "InMemoryRelation" in ln:
            skip_depth = depth
    return "\n".join(out).split("== Initial Plan ==")[0]


def test_heavy_hitters_corpus_scanned_once_and_candidates_broadcast(spark):
    """q_doc_heavy_hitters: the token explode is persisted and every leg
    (sketch, exact twin, scalar total) reads the cache — no parquet scan of
    documents executes per run (only the one-time persist build); the
    candidate/deduction/total relations join back by broadcast (ids + longs,
    bounded at k*partitions rows), never a shuffle of the corpus-side
    aggregate."""
    plan = _executed_view(QUERIES["q_doc_heavy_hitters"](spark, SF))
    assert "InMemoryRelation" in plan, plan
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 0, plan
    assert plan.count("BroadcastExchange") >= 2, plan


def test_pareto_frontier_anti_join_over_candidates_only(spark):
    """q_pareto_frontier: the full-table side feeds ONLY the mapInPandas local
    prune; the dominance anti-join is a BroadcastNestedLoopJoin whose BOTH
    inputs descend from pruned candidates — quadratic in candidates, never in
    input rows (the property that survives 100x)."""
    plan = _plan(QUERIES["q_pareto_frontier"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan, plan
    # two candidate legs -> two local-prune python boundaries, no more
    assert plan.count("MapInPandas") == 2, plan
    # no shuffle anywhere: prune is partition-local, the join broadcasts
    assert "Exchange hashpartitioning" not in plan, plan


def test_vocab_topn_is_take_ordered_not_global_sort(spark):
    """q_vocab_topn_coverage: the top-25 must plan as TakeOrdered
    (per-partition partial top-k + k-row merge) — a global Sort of the whole
    vocabulary would single-reduce billions of distinct tokens at corpus
    scale. The rank/cumsum windows may single-partition only AFTER the limit
    (bounded by the constant k)."""
    df = QUERIES["q_vocab_topn_coverage"](spark, SF)
    df.count()
    plan = _executed_view(df)
    assert "TakeOrdered" in plan, plan
    # no Sort inside the take's subtree: the only Sort allowed is the 25-row
    # window sort, which sits above TakeOrdered in the plan text
    below = plan.split("TakeOrdered", 1)[1]
    assert "Sort " not in below, below


def test_bloom_prefilter_query_single_fact_scan(spark):
    """q_join_bloom_prefilter: the fact table scans ONCE (probe + exact twin
    share it), the bloom probe adds no Exchange of its own, and the dim key
    relation joins back small (broadcast under AQE) — never a shuffle of the
    fact side keyed on the join column before the aggregate's own exchange."""
    df = QUERIES["q_join_bloom_prefilter"](spark, SF)
    df.count()
    plan = _executed_view(df)
    fact_scans = len(
        [ln for ln in plan.splitlines() if "Scan parquet" in ln and "lineitem" in ln]
    )
    assert fact_scans == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_curriculum_scoring_is_scan_stage_no_explode(spark):
    """q_doc_curriculum_shards: difficulty scoring, staging, and shard
    assignment are all scan-stage expressions — no Generate (explode) of the
    token array, and the ONLY shuffle is the final 16-group aggregate's own
    exchange. At corpus scale the operator is embarrassingly parallel up to
    the last stage."""
    df = QUERIES["q_doc_curriculum_shards"](spark, SF)
    df.count()
    plan = _executed_view(df)
    assert "Generate" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def _outer_nodes(df) -> list[str]:
    """Physical-plan node class names of the OUTER plan only — a JVM tree
    walk that does not descend into cached (InMemoryTableScan) subtrees.
    The textual _executed_view strip cannot handle a DEEPLY-NESTED cached
    child: InMemoryRelation's toString embeds its child plan at a reset
    indentation (often SHALLOWER than the relation's own tree depth), so
    depth-based stripping leaks embedded FileScan lines into substring
    assertions. Walking the tree sidesteps the text format entirely."""
    out: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        out.append(name)
        if "InMemoryTableScan" in name:
            return  # cached subtree: its build plan already ran at persist time
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_prefix_jaccard_no_cartesian_and_cached_sets(spark):
    """q_dedup_prefix_jaccard: candidates come from the token equi-join and
    the verify from cached set relations — never a cartesian/broadcast-NL
    pairing of docs, and no re-scan of documents per leg (the persisted set
    table feeds prefix induction and both verify sides)."""
    df = QUERIES["q_dedup_prefix_jaccard"](spark, SF)
    df.count()
    nodes = _outer_nodes(df)
    assert not any("CartesianProduct" in n for n in nodes), nodes
    assert not any("BroadcastNestedLoop" in n for n in nodes), nodes
    # every leaf reads a cache; no parquet scan survives in the outer plan
    assert not any("FileSourceScan" in n or "BatchScan" in n for n in nodes), nodes
    assert any("InMemoryTableScan" in n for n in nodes), nodes


def test_kmv_overlap_joins_stay_broadcast(spark):
    """q_sets_kmv_overlap: every sketch join is <= 64 rows — a SortMergeJoin
    anywhere means a constant-size relation shuffled, defeating the sketch."""
    df = QUERIES["q_sets_kmv_overlap"](spark, SF)
    df.count()
    plan = _executed_view(df)
    assert "SortMergeJoin" not in plan, plan


def test_rrf_rankers_are_take_ordered_not_global_sort(spark):
    """q_search_rrf_fusion: both rankers' top-100 cuts must plan as
    TakeOrderedAndProject (per-partition partial top-k) — a global Sort of
    the corpus would be the shape that dies at 100x. The only global sort
    allowed is the final 20-row output window over the fused constant-size
    relation."""
    plan = _executed_view(QUERIES["q_search_rrf_fusion"](spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_zipf_top100_is_take_ordered(spark):
    """q_vocab_zipf_fit: the top-100 vocabulary cut is TakeOrdered — the
    vocab table is never globally sorted."""
    plan = _executed_view(QUERIES["q_vocab_zipf_fit"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [c" not in plan, plan


def test_count_min_sketch_broadcasts_to_probe(spark):
    """q_doc_count_min: the probe joins the CONSTANT d*w sketch by
    broadcast — the sketch is the build side by construction, and the
    token/vocab relations never shuffle into the probe join."""
    plan = _executed_view(QUERIES["q_doc_count_min"](spark, SF))
    assert "BroadcastExchange" in plan, plan


def test_readability_is_scan_stage_only(spark):
    """q_doc_readability: the whole battery is scan-stage HOF expressions —
    no Exchange of any kind and no Python boundary in the plan."""
    plan = _plan(QUERIES["q_doc_readability"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan, plan


def test_persist_tracking_is_thread_scoped(spark):
    """ADVICE r7: a persist issued by ANOTHER thread while a registry build
    has the class-wide patch in place must NOT be claimed as registry-owned —
    release_query_caches unpersisting a concurrent foreachBatch's (or another
    session's) cache would be silent cache loss."""
    import threading

    from pyspark import StorageLevel

    from plenario_mapper_spark.plans.registry import (
        _OWNED_PERSISTS,
        _tracked_build,
        release_query_caches,
    )

    release_query_caches(spark)
    foreign = spark.range(100).selectExpr("id", "id + 1 AS nxt")
    errs = []

    def build(s, sf_dir):
        own = s.range(50).selectExpr("id * 3 AS trip").persist()
        own.count()
        t = threading.Thread(
            target=lambda: (foreign.persist(), foreign.count())
        )
        t.start()
        t.join()
        return own

    out = _tracked_build(spark, build, "unused")
    try:
        owned = list(_OWNED_PERSISTS.get(spark, []))
        assert any(df is out for df in owned), "build thread's persist untracked"
        assert all(df is not foreign for df in owned), (
            "foreign thread's persist was claimed as registry-owned"
        )
        assert foreign.storageLevel.useMemory
        release_query_caches(spark)
        assert foreign.storageLevel.useMemory, "foreign cache clobbered"
        assert out.storageLevel == StorageLevel.NONE
    finally:
        foreign.unpersist()


def test_semantic_dedup_broadcasts_centroids_no_cartesian(spark):
    """q_embed_semantic_dedup, each scale property pinned where it lives:
    the within-cluster pair join must be a cluster-id EQUI-join over the
    CACHED assignment (InMemoryTableScan — the r9 self-review persist: both
    pair-join sides and the keep join read it without replaying the scoring
    pass) and never a CartesianProduct; the centroid scoring join inside
    that cached lineage must broadcast the K-row centroid table (asserted
    on the operator's own plan — the cache build's subtree is invisible to
    the outer walk by design)."""
    from plenario_mapper_spark.operators import similarity as SIM2

    df = QUERIES["q_embed_semantic_dedup"](spark, SF)
    df.count()
    nodes = _outer_nodes(df)
    assert not any("CartesianProduct" in n for n in nodes), nodes
    assert not any("BroadcastNestedLoop" in n for n in nodes), nodes
    assert any("InMemoryTableScan" in n for n in nodes), nodes

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    assign = SIM2.assign_to_centroids(e, SIM2.label_centroids(e))
    assign.count()
    assert any("BroadcastExchange" in n for n in _outer_nodes(assign)), (
        "centroid scoring join must broadcast the K-row centroid table"
    )


def _join_nodes(df) -> list[tuple[str, str, object]]:
    """(class, leftKeys, isSkewJoin) for every join in the OUTER executed
    plan — the key-level companion to _outer_nodes for assertions that need
    WHAT a join shuffles on, not just that one exists. The DataFrame must
    have been EXECUTED via its own plan (collect/write — count() builds a
    separate query execution and leaves this plan's AQE stages unrun)."""
    out: list[tuple[str, str, object]] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "InMemoryTableScan" in name:
            return
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if "Join" in name or "Cartesian" in name:
            try:
                keys = node.leftKeys().toString()
            except Exception:
                keys = ""
            try:
                skew = bool(node.isSkewJoin())
            except Exception:
                skew = None
            out.append((name, keys, skew))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_semantic_dedup_pair_join_cluster_keyed_and_skew_splits(spark):
    """VERDICT r9 item 4: the semantic-dedup pair join must shuffle ON THE
    CLUSTER KEY (one hashpartitioning(assigned_cid) exchange per side — the
    co-location that makes the quadratic verify cluster-bounded), and a
    planted HOT cluster must be AQE skew-split (isSkewJoin=true) so one
    giant cluster cannot serialize the stage at 100 TB. forceOptimizeSkewedJoin
    because the join output feeds further shuffles (see the operator
    docstring). Verdicts are checked against an independent numpy oracle on
    the planted geometry — the skew split must not change results."""
    import math
    import random

    import numpy as np

    from plenario_mapper_spark.operators import similarity as SIM2

    random.seed(7)

    def vec(deg, jit):
        r = math.radians(deg + jit)
        return [math.cos(r), math.sin(r)] + [0.0] * 30

    # hot cluster: 3000 items smeared around 0 deg; cold: 20 around 90 deg
    rows = [(i, vec(0.0, random.uniform(-40, 40))) for i in range(3000)]
    rows += [(10_000 + i, vec(90.0, random.uniform(-5, 5))) for i in range(20)]
    items = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)
    cent = spark.createDataFrame(
        [(0, vec(0, 0)), (1, vec(90, 0))], "cid long, centroid array<double>"
    )
    confs = {
        # no broadcast: the cluster-keyed SHUFFLE join is the 100 TB shape
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "0",
        # trip skew detection on toy sizes (defaults are 256MB-scale)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        # the session default (true) lets AQE re-partition cached plans,
        # which currently DEFEATS OptimizeSkewedJoin on joins fed by a
        # persisted relation (measured: identical planted data splits with
        # this false, never with it true) — the operator docstring names
        # both knobs
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        d = SIM2.semantic_dedup(items, cent, threshold=0.95)
        got = {r["vec_id"]: r["is_kept"] for r in d.collect()}  # executes d
        joins = _join_nodes(d)
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)

    pair = [j for j in joins if "assigned_cid" in j[1]]
    assert len(pair) == 1, joins
    assert "SortMergeJoin" in pair[0][0] or "ShuffledHashJoin" in pair[0][0], joins
    assert pair[0][2] is True, f"hot cluster not skew-split: {joins}"

    # independent numpy oracle for the drop rule on the planted geometry
    ids = np.array([r[0] for r in rows])
    vs = np.array([r[1] for r in rows])
    u = vs / np.linalg.norm(vs, axis=1)[:, None]
    cid = np.where(ids < 10_000, 0, 1)  # planted geometry makes this exact
    order = np.argsort(ids)
    want = {}
    for c in (0, 1):
        idx = [i for i in order if cid[i] == c]
        uc = u[idx]
        g = uc @ uc.T
        for a in range(len(idx)):
            want[int(ids[idx[a]])] = not bool((g[a, :a] >= 0.95).any())
    assert got == want


def test_hard_negatives_broadcast_queries_no_cartesian(spark):
    """q_embed_hard_negatives: the scoring pass broadcasts the 10-row query
    side (BroadcastNestedLoop on the != predicate is the intended constant-
    small-side shape); the corpus side must never land in a cartesian
    product, and ranking shuffles only banded survivors."""
    df = QUERIES["q_embed_hard_negatives"](spark, SF)
    df.count()
    nodes = _outer_nodes(df)
    assert not any("CartesianProduct" in n for n in nodes), nodes
    assert any("BroadcastExchange" in n for n in nodes), nodes


def test_pca_gram_partials_is_one_python_pass(spark):
    """gram_matrix_partials: exactly one Python boundary (the mapInPandas
    partial-Gram accumulator) and no join — the d^2-key sum is the only
    shuffle. This is the 100 TB build shape; the ordered-fold twin is
    allowed its heavier plan because it exists for oracle bit-parity."""
    from plenario_mapper_spark.operators.projection import gram_matrix_partials

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = gram_matrix_partials(e)
    df.count()
    nodes = _outer_nodes(df)
    py = [n for n in nodes if "MapInPandas" in n or "EvalPython" in n]
    assert len(py) == 1, nodes
    assert not any("Join" in n for n in nodes), nodes


def test_bucketed_join_has_no_exchange_on_either_side(spark):
    """The whole point of sources/bucketed.py: both fact sides pre-bucketed on
    the join key means the SortMergeJoin runs with ZERO Exchange under it —
    the only shuffle in the query is the aggregate's. Broadcast is disabled so
    the small sf can't hide a missing-bucketing regression behind a
    BroadcastHashJoin; a second ensure call must hit the session catalog, not
    rewrite."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.sources.bucketed import ensure_bucketed_pair

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        o_name, l_name = ensure_bucketed_pair(spark, SF)
        o, li = spark.table(o_name), spark.table(l_name)
        j = (
            o.join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        j.collect()
        plan = _plan(j)
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    assert "SortMergeJoin" in plan, plan
    # no shuffle on either JOIN key — the single Exchange belongs to the agg
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    # idempotence: the second call is a catalog hit (same names, no rewrite)
    assert ensure_bucketed_pair(spark, SF) == (o_name, l_name)


def test_semantic_decontaminate_broadcasts_benchmark_side(spark):
    """The decontamination scoring join must broadcast the (fixed-size in
    production) benchmark side — a shuffle or sort-merge here would mean the
    plan treats both sides as corpus-scale."""
    plan = _plan(QUERIES["q_doc_semantic_decontaminate"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan
    # a sort-merge join is fine on the 4-row threshold ladder, but never on
    # the corpus-scale scoring pass (its join carries the vector columns)
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "threshold_micro" in line, plan
