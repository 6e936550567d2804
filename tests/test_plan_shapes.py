"""Physical-plan regression tests for scale-critical properties.

Correctness tests can't catch a plan that silently degrades (a fact table
slipping onto a broadcast build side, a pruned column creeping back into the
scan). These pin the plan shapes at sf0.1 — the scale where the estimates
actually diverge between dims and facts."""

import re

from plenario_mapper_spark.plans import QUERIES

SF = "/root/testdata/sf0.1"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
