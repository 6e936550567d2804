"""Measure the ANN certification queries' OBSERVED recall on a dataset —
the safety-margin check behind their pytest/oracle floors (VERDICT r8 item
6): the floors (LSH 0.25, IVF 0.45, near-dup 0.35) pass on the current
seed-pinned testdata, but the driver regenerates data between rounds, so the
margin must be measured across datasets (base SFs + fuzz_parity clones)
rather than assumed. Prints one line per (dataset, query) with the observed
pooled recall, the floor, and the margin; the PERF_NOTES table is compiled
from these.

Usage: python tools/ann_recall_margin.py <sf_dir> [<sf_dir> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

# Keep in lockstep with the certification queries + pytest pins (the r9
# re-justified floors: min observed across 4 datasets minus ~1 pool sd).
# hard_neg_ivf (r10): band-recall@3 of hard_negatives_via_index vs the exact
# band twin — band members sit farther from the query than top-k neighbors,
# so at equal n_probe the recall is structurally lower than ivf_topk's.
FLOORS = {"lsh_topk": 0.20, "ivf_topk": 0.40, "near_dup": 0.30, "hard_neg_ivf": 0.35}


def observed_recalls(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Pooled (micro) recall of each ANN path against its exact twin, with
    the exact geometries the registry queries use."""
    from plenario_mapper_spark.operators import similarity as SIM
    from plenario_mapper_spark.plans.relational import _t

    out: dict[str, float] = {}
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(e, q, k=5).persist()
    exact.count()
    for name, approx in (
        ("lsh_topk", SIM.lsh_topk(e, q, k=5)),
        ("ivf_topk", SIM.ivf_topk(e, q, k=5)),
    ):
        j = exact.alias("x").join(
            approx.alias("a"),
            (F.col("x.query_id") == F.col("a.query_id"))
            & (F.col("x.item_id") == F.col("a.item_id")),
            "left",
        )
        row = j.agg(
            (
                F.sum(F.col("a.item_id").isNotNull().cast("int")) / F.count("*")
            ).alias("recall")
        ).collect()[0]
        out[name] = float(row["recall"])
    exact.unpersist()

    # hard negatives via the persisted IVF index, the registry geometry
    # (k=3, band [0.25, 0.45), 16 cells / 4 probed — the q_ann_ivf_topk geometry)
    import shutil
    import tempfile

    ex_band = SIM.hard_negative_topk(e, q, k=3).persist()
    ex_band.count()
    index_dir = tempfile.mkdtemp(prefix="ann_margin_ivf_")
    try:
        SIM.build_ivf_index(e, index_dir)
        ap_band = SIM.hard_negatives_via_index(spark, index_dir, q, k=3, n_probe=4)
        j = ex_band.alias("x").join(
            ap_band.alias("a"),
            (F.col("x.query_id") == F.col("a.query_id"))
            & (F.col("x.item_id") == F.col("a.item_id")),
            "left",
        )
        row = j.agg(
            (
                F.sum(F.col("a.item_id").isNotNull().cast("int")) / F.count("*")
            ).alias("recall")
        ).collect()[0]
        out["hard_neg_ivf"] = float(row["recall"])
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    ex_band.unpersist()

    sl = e.filter(F.col("vec_id") < 500)
    ex_pairs = SIM.exact_near_dup_pairs(sl, threshold=0.4).persist()
    ex_pairs.count()
    ap_pairs = SIM.embedding_near_dup_pairs(
        sl, threshold=0.4, n_planes=6, n_tables=8
    )
    j = ex_pairs.alias("x").join(
        ap_pairs.alias("a"),
        (F.col("x.id_a") == F.col("a.id_a")) & (F.col("x.id_b") == F.col("a.id_b")),
        "left",
    )
    row = j.agg(
        (F.sum(F.col("a.cosine").isNotNull().cast("int")) / F.count("*")).alias(
            "recall"
        )
    ).collect()[0]
    out["near_dup"] = float(row["recall"])
    ex_pairs.unpersist()
    return out


def main() -> None:
    cpus = os.environ.get("CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    for sf_dir in sys.argv[1:]:
        rec = observed_recalls(spark, sf_dir)
        for name, r in rec.items():
            floor = FLOORS[name]
            flag = "OK " if r >= floor else "BELOW"
            print(
                f"{sf_dir:32} {name:10} recall={r:.3f} floor={floor:.2f} "
                f"margin={r - floor:+.3f} {flag}"
            )


if __name__ == "__main__":
    main()
