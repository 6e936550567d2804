"""Property-based invariants (hypothesis) for the round-7 operator units.

Hand-pinned examples catch the cases someone thought of; these pin the
THEOREMS on randomized inputs: concentration bounds for the skew audit,
one-sided error for count-min, and risk-mass reconstruction for the
k-anonymity audit. Spark round-trips are ~1 s/example, so examples are
capped low — the point is shape coverage, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from plenario_mapper_spark.operators.privacy import k_anonymity_audit
from plenario_mapper_spark.operators.sketches import cm_build, cm_estimate
from plenario_mapper_spark.operators.skew import key_skew_audit

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

hist = st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=12)


@given(counts=hist)
@settings(**_SETTINGS)
def test_skew_audit_concentration_bounds(spark, counts):
    """For ANY histogram: gini ∈ [0, 1−1/n], hhi ∈ [1/n, 1], top1 ≥ 1/n,
    and the row mass reconstructs."""
    rows = [(f"k{i}",) for i, c in enumerate(counts) for _ in range(c)]
    d = spark.createDataFrame(rows, "k string")
    r = key_skew_audit(d, "k", top_k=3).collect()[0]
    n, nk = sum(counts), len(counts)
    assert r["n_rows"] == n and r["n_keys"] == nk
    assert -1e-9 <= r["gini"] <= 1 - 1 / nk + 1e-9
    assert 1 / nk - 1e-9 <= r["hhi"] <= 1 + 1e-9
    assert r["top1_share"] >= 1 / nk - 1e-9
    assert r["max_count"] == max(counts)


@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=100),
        min_size=2,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_count_min_one_sided_for_every_key(spark, counts):
    """est >= true for EVERY key on ANY histogram — the CM theorem, not a
    tendency (width 8 forces heavy collisions)."""
    dom = spark.createDataFrame(list(counts.items()), "key string, c long")
    sketch = cm_build(dom, depth=3, width=8)
    est = {
        r["key"]: r["cm_est"]
        for r in cm_estimate(dom.select("key"), sketch, depth=3, width=8).collect()
    }
    assert set(est) == set(counts)
    for k, c in counts.items():
        assert est[k] >= c, (k, est[k], c)


@given(
    classes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),   # class size
            st.integers(min_value=1, max_value=3),   # distinct sensitive values
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_k_anonymity_risk_mass_reconstructs(spark, classes):
    """rows_at_risk == Σ sizes of classes below k, min l-diversity is the
    true min, and totals reconstruct — for ANY class structure."""
    rows = []
    for ci, (size, nl) in enumerate(classes):
        for j in range(size):
            rows.append((f"q{ci}", j % min(nl, size)))
    d = spark.createDataFrame(rows, "quasi string, sens int")
    r = k_anonymity_audit(d, ["quasi"], "sens", k=4, l=2).collect()[0]
    sizes = [s for s, _ in classes]
    true_l = [min(nl, s) for s, nl in classes]
    assert r["n_rows"] == sum(sizes)
    assert r["n_classes"] == len(classes)
    assert r["k_anonymity"] == min(sizes)
    assert r["rows_at_risk"] == sum(s for s in sizes if s < 4)
    assert r["n_classes_below_k"] == sum(1 for s in sizes if s < 4)
    assert r["min_l_diversity"] == min(true_l)
    assert r["n_classes_below_l"] == sum(1 for v in true_l if v < 2)
