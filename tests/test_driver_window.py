"""Pins the r13 driver-gate contract AND the steady-state re-verification
policy (VERDICT r12 item 1).

The driver's correctness gate evaluates exactly the FIRST 50 entries of
queries()/oracle_sql(); the judge byte-compares that window against the
committed plan. With certification debt at zero since r12, the standing
recipe (codified in the round-13 rotation note in __spark_entry__.py) is:

  1. never-driver-verified queries first,
  2. changed-code canaries (engine change after a driver green stales the
     row),
  3. the stalest rows by latest driver round (registration order within a
     round) until the 50 slots fill,

under the INVARIANT that no registry query's latest driver row is ever
older than HORIZON_ROUNDS rounds — every query staler than that MUST be in
the committed window. The policy test below re-derives all of this from
the explicit artifact list, so a rotation that violates the horizon (or a
round that lands an artifact without rotating) fails the suite loudly.
"""

from __future__ import annotations

import json
import os

# The artifacts the r13 window was derived from. Frozen: the derivation
# tests read exactly these files, so landing CORRECTNESS_r13.json (this
# round's own gate output) cannot retroactively re-shape the window.
R13_SOURCE_ARTIFACTS = [f"CORRECTNESS_r{i:02d}.json" for i in range(1, 13)]

# This round's own artifact, produced by the driver at round close AFTER
# this commit. Its appearance is expected and must not red the suite;
# anything NEWER means the window is stale and must be recomputed.
R13_OWN_ARTIFACT = "CORRECTNESS_r13.json"

# The round this window was committed for (== the round of OWN_ARTIFACT).
R13_ROUND = 13

# The steady-state staleness horizon: after each round's artifact lands, no
# registry query's latest driver row may be older than this many rounds.
HORIZON_ROUNDS = 7

# Changed-code canaries this round (rule 2): engine/source code under these
# queries changed after their latest driver green.
R13_CANARIES = [
    # sources/bucketed.py gained the superseded-suffix drop (ADVICE r12)
    "q_join_bucketed_colocated",
]

R13_WINDOW = [
    # -- slots 1-6: the r13 never-driver-verified additions (BPE tokenizer
    #    train/apply/pack + PQ train/encode/ADC), registration order --
    "q_vocab_bpe_train",
    "q_doc_bpe_tokenize",
    "q_doc_pack_bpe_budget",
    "q_embed_pq_train",
    "q_embed_pq_encode",
    "q_embed_pq_adc_topk",
    # -- slot 7: changed-code canary --
    "q_join_bucketed_colocated",
    # -- slots 8-11: the r4-vintage rows (oldest in the registry) --
    "q_scalar_datetime",
    "q_scalar_string",
    "q_scalar_json",
    "q_scalar_array_hof",
    # -- slots 12-48: every r5-vintage row, registration order --
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q9_product_type_profit",
    "q11_important_parts",
    "q12_ship_latency",
    "q16_supplier_count",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q_events_gap_fill",
    "q_agg_hll_rollup",
    "q_events_funnel",
    "q_events_cohort_retention",
    "q_events_winsorized",
    "q_events_rolling_window",
    "q_events_sliding_window",
    "q_join_nullsafe",
    "q_events_attribution",
    "q_events_throttle_batch",
    "q_binary_phash_dedup",
    "q_quality_constraints",
    "q_doc_mixture_weights",
    "q_doc_span_dedup",
    "q_events_sessions_closed",
    "q_graph_triangles",
    "q_scd2_versions",
    "q_dedup_fuzzy_names",
    "q_layout_zorder_key",
    "q_merge_upsert_delete",
    "q_rollup_incremental_maintain",
    "q_scd2_point_in_time",
    "q_geo_radius_join",
    "q_geo_grid_timeseries",
    "q_join_dpp_partitioned",
    "q_join_interval_overlap",
    "q_profile_orders",
    "q_table_diff",
    # -- slots 49-50: the 2 oldest r6-vintage rows --
    "q1_pricing_summary",
    "q_agg_distinct",
]


def _root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_root(), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_under_test", mod)
    spec.loader.exec_module(mod)
    return mod


def _latest_rounds() -> dict[str, int]:
    """query -> latest driver round, from the frozen artifact list."""
    latest: dict[str, int] = {}
    for i, name in enumerate(R13_SOURCE_ARTIFACTS, start=1):
        with open(os.path.join(_root(), name)) as fh:
            for q in json.load(fh):
                latest[q] = max(latest.get(q, 0), i)
    return latest


def test_first_50_is_the_committed_r13_window():
    e = _entry()
    assert list(e.oracle_sql())[:50] == R13_WINDOW


def test_queries_and_oracles_share_one_ordering():
    e = _entry()
    qs, osql = e.queries(), e.oracle_sql()
    assert list(qs) == list(osql)


def test_registry_is_343_fully_oracle_backed():
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    assert len(QUERIES) == 343
    assert len(ORACLES) == 343
    assert set(ORACLES) == set(QUERIES)  # zero rows-only entries


def test_window_derivation_never_verified_then_canaries_then_stalest():
    """Re-derive the full 50-slot window from the artifacts: rule 1 (all
    never-verified names, registration order), rule 2 (the committed
    canaries), rule 3 (stalest-first fill, registration order within a
    round). The committed R13_WINDOW must be exactly that."""
    latest = _latest_rounds()
    from plenario_mapper_spark.plans import QUERIES

    order = list(QUERIES)
    pos = {n: i for i, n in enumerate(order)}
    never = [n for n in order if n not in latest]
    fill = sorted(
        (n for n in order if n in latest and n not in R13_CANARIES),
        key=lambda n: (latest[n], pos[n]),
    )
    n_fill = 50 - len(never) - len(R13_CANARIES)
    assert n_fill >= 0, "rules 1-2 crowd out rule 3: split the window"
    derived = never + R13_CANARIES + fill[:n_fill]
    assert derived == R13_WINDOW


def test_staleness_horizon_invariant():
    """THE steady-state policy: every query whose latest driver row is
    older than HORIZON_ROUNDS rounds (as of this round's close) must be in
    the committed window, so no row's age ever exceeds the horizon once
    the round's artifact lands."""
    latest = _latest_rounds()
    from plenario_mapper_spark.plans import QUERIES

    too_stale = [
        n
        for n in QUERIES
        if latest.get(n, 0) < R13_ROUND - HORIZON_ROUNDS
    ]
    missing = [n for n in too_stale if n not in R13_WINDOW]
    assert not missing, (
        f"{len(missing)} queries exceed the {HORIZON_ROUNDS}-round staleness "
        f"horizon and are NOT in the committed window: {missing[:10]} — "
        "recompute the rotation (round-13 note in __spark_entry__.py)"
    )


def test_artifact_freshness_tripwire():
    """Staleness alarm: the only CORRECTNESS artifacts allowed on disk are
    the r01-r12 sources plus this round's own r13 output. Anything newer
    means a later round landed without rotating the window — recompute
    _FRONT per the steady-state recipe (round-13 rotation note in
    __spark_entry__.py) and update this module's pins."""
    import glob

    found = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(_root(), "CORRECTNESS_r*.json"))
    }
    allowed = set(R13_SOURCE_ARTIFACTS) | {R13_OWN_ARTIFACT}
    unexpected = found - allowed
    assert not unexpected, (
        f"newer CORRECTNESS artifact(s) landed ({sorted(unexpected)}) — the "
        "committed window is stale; rotate per the steady-state policy and "
        "update tests/test_driver_window.py"
    )
    assert set(R13_SOURCE_ARTIFACTS) <= found
