"""Pins the r11 driver-gate contract (VERDICT r10 items 1+2).

The driver's correctness gate evaluates exactly the FIRST 50 entries of
queries()/oracle_sql(); the judge byte-compares that window against the
committed plan. These pins make the contract un-scramblable by refactors:
the window must be EXACTLY the 50 oldest never-driver-verified registry
queries in registration order (computed from the CORRECTNESS_r01-r10
artifacts at commit time, duplicated literally here), and the registry is
frozen at 337 until the certification debt clears.
"""

from __future__ import annotations

R11_WINDOW = [
    "q_embed_hard_negatives_indexed",
    "q_search_bm25_topk",
    "q_doc_winnowing",
    "q_embed_ivf_cell_balance",
    "q_doc_mixture_temperature",
    "q_doc_padding_waste",
    "q_embed_davies_bouldin",
    "q_scan_csv_json_roundtrip",
    "q_eval_poisson_bootstrap_ci",
    "q_events_click_purchase_pairs",
    "q_events_kleinberg_bursts",
    "q_eval_diff_in_diff",
    "q_eval_cuped_adjusted",
    "q_eval_stratified_ate",
    "q_eval_wilcoxon_signed_rank",
    "q_eval_ipw_ate",
    "q_eval_cmh_odds",
    "q_eval_sprt_decision",
    "q_sample_group_kfold",
    "q_eval_jackknife_ratio_ci",
    "q_doc_heldout_perplexity",
    "q_embed_pair_cosine_histogram",
    "q_eval_isotonic_calibration",
    "q_part_abc_class",
    "q_eval_ucb1_arms",
    "q_doc_rendezvous_shards",
    "q_events_segmented_trend",
    "q_scan_orc_roundtrip",
    "q_graph_label_prop_3",
    "q_embed_prefix_norm_share",
    "q_events_entry_exit",
    "q_events_trending_types",
    "q_link_fs_u_weights",
    "q_events_lifecycle_states",
    "q_eval_power_mde",
    "q_customer_gini",
    "q_supplier_hhi",
    "q_events_spearman_corr",
    "q_eval_lift_deciles",
    "q_doc_target_encode_loo",
    "q_survival_nelson_aalen",
    "q_link_sorted_neighborhood",
    "q_events_lagged_xcorr",
    "q_events_seasonal_decomp",
    "q_graph_link_prediction",
    "q_eval_ndcg",
    "q_part_abc_migration",
    "q_join_bucketed_colocated",
    "q_events_kendall_tau",
    "q_supplier_rca",
]


def _entry():
    import importlib.util
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_under_test", mod)
    spec.loader.exec_module(mod)
    return mod


def test_first_50_is_the_committed_r11_window():
    e = _entry()
    assert list(e.oracle_sql())[:50] == R11_WINDOW


def test_queries_and_oracles_share_one_ordering():
    e = _entry()
    qs, osql = e.queries(), e.oracle_sql()
    assert list(qs) == list(osql)


def test_registry_frozen_at_337():
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    assert len(QUERIES) == 337
    assert len(ORACLES) == 337
    assert set(ORACLES) == set(QUERIES)  # zero rows-only entries


def test_window_is_never_driver_verified_and_oldest_first():
    """The window must equal the first 50 never-driver-verified registry
    names in registration order, recomputed from the artifacts on disk —
    if a future round adds a CORRECTNESS file, this pin goes stale LOUDLY
    and the rotation comment in __spark_entry__.py says what to do."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    arts = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert len(arts) == 10, (
        "a new CORRECTNESS artifact landed — recompute the window "
        "(see the round-11 rotation note in __spark_entry__.py)"
    )
    for f in arts:
        with open(f) as fh:
            verified.update(json.load(fh))
    from plenario_mapper_spark.plans import QUERIES

    never = [n for n in QUERIES if n not in verified]
    assert never[:50] == R11_WINDOW
    assert len(never) == 85  # 35 remain: the committed r12 claimants
