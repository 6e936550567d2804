"""Pins the r12 driver-gate contract (VERDICT r11 item 1).

The driver's correctness gate evaluates exactly the FIRST 50 entries of
queries()/oracle_sql(); the judge byte-compares that window against the
committed plan. These pins make the contract un-scramblable by refactors:
slots 1-35 must be EXACTLY the 35 never-driver-verified registry queries in
registration order (computed from the explicit CORRECTNESS_r01-r11 artifact
list the window was derived from — per ADVICE r11, the derivation no longer
globs, so a new artifact cannot silently change what the window *should*
have been), slots 36-50 are the committed changed-code canaries + oldest
migration-debt re-verifies, and the artifact-freshness tripwire lives in
its own test that tolerates this round's own CORRECTNESS_r12.json.
"""

from __future__ import annotations

import json
import os

# The artifacts the r12 window was derived from. Frozen: the derivation test
# below reads exactly these files, so landing CORRECTNESS_r12.json (this
# round's own gate output) cannot retroactively re-shape the window.
R12_SOURCE_ARTIFACTS = [f"CORRECTNESS_r{i:02d}.json" for i in range(1, 12)]

# This round's own artifact, produced by the driver at round close AFTER this
# commit. Its appearance is expected and must not red the suite; anything
# NEWER means the window is stale and the rotation must be recomputed.
R12_OWN_ARTIFACT = "CORRECTNESS_r12.json"

R12_WINDOW = [
    # -- slots 1-35: the 35 never-driver-verified (H187-H221), registration
    #    order (re-derived from R12_SOURCE_ARTIFACTS by the test below) --
    "q_part_price_elasticity",
    "q_customer_theil",
    "q_graph_modularity",
    "q_embed_silhouette",
    "q_quality_freshness",
    "q_orders_backlog_aging",
    "q_events_holt_winters",
    "q_doc_byte_entropy",
    "q_agg_mode_exact",
    "q_eval_mrr",
    "q_eval_conformal_interval",
    "q_graph_assortativity",
    "q_eval_brier_decomposition",
    "q_events_mann_kendall",
    "q_eval_brown_forsythe",
    "q_doc_cramers_v",
    "q_doc_semantic_decontaminate",
    "q_events_active_coverage",
    "q_events_max_drawdown",
    "q_events_ar1_meanreversion",
    "q_eval_qini_uplift",
    "q_quality_delivery_gaps",
    "q_eval_srm_check",
    "q_eval_psm_att",
    "q_events_periodogram",
    "q_embed_triplet_margin",
    "q_events_skew_kurtosis",
    "q_events_pettitt_changepoint",
    "q_agg_weighted_quantiles",
    "q_graph_kcore_peel",
    "q_events_peak_concurrency",
    "q_eval_overlap_ks",
    "q_part_abc_xyz_matrix",
    "q_embed_hubness_audit",
    "q_part_price_indices",
    # -- slots 36-42: r11 changed-code canaries (inverted-index jaccard
    #    family in registration order, then the bm25 re-verify) --
    "q_ngram_jaccard_pairs",
    "q_dedup_cluster_cc",
    "q_doc_leakage_safe_split",
    "q_dedup_incremental_cc",
    "q_entity_survivorship",
    "q_dedup_cross_source_rate",
    "q_search_bm25_topk",
    # -- slots 43-50: the 8 oldest migration-debt r8 greens, registration
    #    order --
    "q_pareto_frontier",
    "q_sample_weighted",
    "q_ngram_containment_pairs",
    "q_vocab_topn_coverage",
    "q_doc_curriculum_shards",
    "q_sets_kmv_overlap",
    "q_dedup_prefix_jaccard",
    "q_embed_jl_distortion",
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


def test_first_50_is_the_committed_r12_window():
    e = _entry()
    assert list(e.oracle_sql())[:50] == R12_WINDOW


def test_queries_and_oracles_share_one_ordering():
    e = _entry()
    qs, osql = e.queries(), e.oracle_sql()
    assert list(qs) == list(osql)


def test_registry_frozen_at_337():
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    assert len(QUERIES) == 337
    assert len(ORACLES) == 337
    assert set(ORACLES) == set(QUERIES)  # zero rows-only entries


def test_window_head_is_every_never_driver_verified_query():
    """Slots 1-35 must equal ALL never-driver-verified registry names in
    registration order, recomputed from the EXPLICIT r01-r11 artifact list
    (not a glob — ADVICE r11: a new artifact must not change the derivation
    the window was committed against). After the r12 gate runs this window,
    the never-verified debt is zero."""
    verified: set[str] = set()
    for name in R12_SOURCE_ARTIFACTS:
        with open(os.path.join(_root(), name)) as fh:
            verified.update(json.load(fh))
    from plenario_mapper_spark.plans import QUERIES

    never = [n for n in QUERIES if n not in verified]
    assert never == R12_WINDOW[:35]


def test_artifact_freshness_tripwire():
    """Separate, independently-updatable staleness alarm (ADVICE r11): the
    only CORRECTNESS artifacts allowed on disk are the r01-r11 sources plus
    this round's own r12 output. Anything newer means a later round landed
    without rotating the window — recompute _FRONT in __spark_entry__.py
    (see the round-12 rotation note there) and update this module's pins."""
    import glob

    found = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(_root(), "CORRECTNESS_r*.json"))
    }
    allowed = set(R12_SOURCE_ARTIFACTS) | {R12_OWN_ARTIFACT}
    unexpected = found - allowed
    assert not unexpected, (
        f"newer CORRECTNESS artifact(s) landed ({sorted(unexpected)}) — the "
        "committed window is stale; recompute the rotation (round-12 note in "
        "__spark_entry__.py) and update tests/test_driver_window.py"
    )
    assert set(R12_SOURCE_ARTIFACTS) <= found
