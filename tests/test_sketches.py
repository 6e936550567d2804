"""KMV distinct sketches (operators/sketches).

Pins: the sketch equals an independent Python reference (k smallest distinct
md5 hashes), partition invariance, the exact small-set regime, the union
composition property, and estimator accuracy in the sketching regime.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import sketches as SK


def _py_hash(key, salt="kmv0") -> int:
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:12], 16)


def _py_sketch(keys, k, salt="kmv0") -> list[int]:
    return sorted({_py_hash(v, salt) for v in keys})[:k]


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(5_000).select(F.col("id").alias("key"))


def test_sketch_matches_python_reference(spark, ids):
    got = [r["h"] for r in SK.kmv_sketch(ids, "key", 64).collect()]
    assert got == _py_sketch(range(5_000), 64)


def test_sketch_is_partitioning_invariant_and_dupe_proof(spark, ids):
    base = [r["h"] for r in SK.kmv_sketch(ids, "key", 32).collect()]
    shuffled = [
        r["h"]
        for r in SK.kmv_sketch(ids.repartition(13, "key"), "key", 32).collect()
    ]
    duped = [
        r["h"] for r in SK.kmv_sketch(ids.union(ids).union(ids), "key", 32).collect()
    ]
    assert base == shuffled == duped


def test_exact_regime_small_set(spark):
    """Fewer distinct keys than k: the sketch IS the set and the estimate is
    the exact count."""
    small = spark.range(20).select(F.col("id").alias("key"))
    sk = SK.kmv_sketch(small, "key", 64)
    rows = sk.agg(
        F.max("h").alias("tau"), F.count("*").cast("long").alias("m")
    ).select(SK.kmv_estimate(F.col("tau"), F.col("m"), 64).alias("est"))
    assert rows.collect()[0]["est"] == 20.0


def test_union_composition(spark):
    """kmv_union(sketch(A), sketch(B)) == sketch(A ∪ B) — the property that
    makes sketches comparable without revisiting the raw sets."""
    a = spark.range(0, 3_000).select(F.col("id").alias("key"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("key"))
    k = 48
    composed = [
        r["h"]
        for r in SK.kmv_union(
            SK.kmv_sketch(a, "key", k), SK.kmv_sketch(b, "key", k), k
        ).collect()
    ]
    direct = [r["h"] for r in SK.kmv_sketch(a.union(b), "key", k).collect()]
    assert composed == direct


def test_estimator_accuracy_in_sketching_regime(spark):
    """k=256 over 20k distinct keys: relative error ~ 1/sqrt(k) ~ 6%; pin a
    3-sigma band. Deterministic (md5), so this is a regression pin, not a
    flaky statistical test."""
    n, k = 20_000, 256
    keys = spark.range(n).select(F.col("id").alias("key"))
    sk = SK.kmv_sketch(keys, "key", k)
    est = (
        sk.agg(F.max("h").alias("tau"), F.count("*").cast("long").alias("m"))
        .select(SK.kmv_estimate(F.col("tau"), F.col("m"), k).alias("est"))
        .collect()[0]["est"]
    )
    assert abs(est - n) / n < 0.20


def test_jaccard_estimate_tracks_true_overlap(spark):
    """Constructed 50% overlap: |A|=|B|=4k, |A∩B|=2k -> J=1/3. The k=256
    estimate must land within ~3 sigma of the truth."""
    k = 256
    a = spark.range(0, 4_000).select(F.col("id").alias("key"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("key"))
    ska, skb = SK.kmv_sketch(a, "key", k), SK.kmv_sketch(b, "key", k)
    row = (
        SK.kmv_union(ska, skb, k)
        .join(ska.withColumn("in_a", F.lit(1)), "h", "left")
        .join(skb.withColumn("in_b", F.lit(1)), "h", "left")
        .agg(
            F.count("*").cast("long").alias("m"),
            F.count(
                F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)
            ).alias("rho"),
        )
        .collect()[0]
    )
    est_j = row["rho"] / row["m"]
    assert abs(est_j - 1 / 3) < 0.10


def test_k_validation():
    with pytest.raises(ValueError):
        SK.kmv_sketch(None, "key", 1)


# ---------------------------------------------------------------- count-min


def _py_cm(counts: dict, depth=4, width=16):
    """Independent reference: same md5 cell derivation, plain dicts."""
    import hashlib

    cells = {}
    for tok, c in counts.items():
        for j in range(depth):
            h = int(hashlib.md5(f"cm{j}|{tok}".encode()).hexdigest()[:8], 16)
            key = (j, h % width)
            cells[key] = cells.get(key, 0) + c
    est = {}
    for tok in counts:
        vals = []
        for j in range(depth):
            h = int(hashlib.md5(f"cm{j}|{tok}".encode()).hexdigest()[:8], 16)
            vals.append(cells[(j, h % width)])
        est[tok] = min(vals)
    return est


def test_count_min_matches_python_reference_and_never_undercounts(spark):
    from plenario_mapper_spark.operators.sketches import cm_build, cm_estimate

    # Zipf-ish histogram over a vocab (40) far wider than the cells (16):
    # collisions are guaranteed, the one-sided error must still hold.
    counts = {f"tok{i:02d}": max(1, 400 // (i + 1)) for i in range(40)}
    dom = spark.createDataFrame(list(counts.items()), "key string, c long")
    sketch = cm_build(dom, depth=4, width=16)
    est = {
        r["key"]: r["cm_est"]
        for r in cm_estimate(dom.select("key"), sketch, depth=4, width=16).collect()
    }
    ref = _py_cm(counts, depth=4, width=16)
    assert est == ref
    assert all(est[t] >= c for t, c in counts.items())
    # collisions actually happened (else the test proves nothing)
    assert any(est[t] > c for t, c in counts.items())


def test_count_min_exact_when_no_collisions(spark):
    from plenario_mapper_spark.operators.sketches import cm_build, cm_estimate

    counts = {"a": 5, "b": 3}
    dom = spark.createDataFrame(list(counts.items()), "key string, c long")
    sketch = cm_build(dom, depth=4, width=4096)
    est = {
        r["key"]: r["cm_est"]
        for r in cm_estimate(dom.select("key"), sketch, depth=4, width=4096).collect()
    }
    # two keys in 4096 cells x 4 independent rows: a shared cell in EVERY
    # row is impossible unless md5 collides 4x — estimates are exact
    assert est == counts
