"""k-anonymity / l-diversity audit semantics on hand-built releases."""

from plenario_mapper_spark.operators.privacy import k_anonymity_audit

ROWS = [
    # class (US, a): 5 rows, sensitive varies -> safe at k=5, l=2
    ("US", "a", 1), ("US", "a", 2), ("US", "a", 1), ("US", "a", 3), ("US", "a", 1),
    # class (US, b): 2 rows -> below k; l=2
    ("US", "b", 1), ("US", "b", 2),
    # class (DE, a): 6 rows but ALL share the sensitive value -> k-safe, l=1
    ("DE", "a", 7), ("DE", "a", 7), ("DE", "a", 7),
    ("DE", "a", 7), ("DE", "a", 7), ("DE", "a", 7),
    # class (None, a): 1 row -> NULL quasi is its own class, below k
    (None, "a", 9),
]


def _audit(spark):
    d = spark.createDataFrame(ROWS, "nation string, seg string, sens int")
    return k_anonymity_audit(d, ["nation", "seg"], "sens", k=5, l=2).collect()[0]


def test_k_anonymity_counts(spark):
    r = _audit(spark)
    assert r["n_rows"] == 14
    assert r["n_classes"] == 4
    assert r["k_anonymity"] == 1  # the NULL-quasi singleton is the weakest class
    assert r["n_classes_below_k"] == 2  # (US,b) and (None,a)
    assert r["rows_at_risk"] == 3
    assert abs(r["risk_rate"] - 3 / 14) < 1e-6


def test_l_diversity_catches_homogeneous_class(spark):
    """(DE, a) is k-anonymous yet discloses the sensitive value to anyone who
    can place a person in the class — l-diversity must flag it."""
    r = _audit(spark)
    assert r["min_l_diversity"] == 1
    assert r["n_classes_below_l"] == 2  # (DE,a) l=1 and (None,a) l=1


def test_fully_safe_release(spark):
    rows = [("X", i % 2, v) for i in range(2) for v in (1, 2, 3, 4, 5)]
    d = spark.createDataFrame(rows, "a string, b int, sens int")
    r = k_anonymity_audit(d, ["a", "b"], "sens", k=5, l=2).collect()[0]
    assert r["k_anonymity"] == 5
    assert r["n_classes_below_k"] == 0
    assert r["rows_at_risk"] == 0
    assert r["risk_rate"] == 0.0
    assert r["min_l_diversity"] == 5
    assert r["n_classes_below_l"] == 0
