"""Product quantization: per-subspace Lloyd training vs a numpy reference,
brute-force-checked encode, ADC vs exact ranking, and the scan-stage-only
encode plan contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebook(spark, emb):
    return SIM.pq_train(emb, m=4, k=8, n_iter=2)


def _np_ref(emb_rows, m, k, n_iter):
    """Reference per-subspace Lloyd with the same contract: lowest-id seeds,
    argmin with smallest-cid tie-break, empty clusters drop."""
    ids = np.array([r[0] for r in emb_rows])
    X = np.array([r[1] for r in emb_rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    sub = X.shape[1] // m
    books = {}
    for mi in range(m):
        Xs = X[:, mi * sub : (mi + 1) * sub]
        cents = {int(ids[i]): Xs[i].copy() for i in range(k)}
        for _ in range(n_iter):
            cids = sorted(cents)
            C = np.array([cents[c] for c in cids])
            d = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)  # first (smallest cid) wins ties
            new = {}
            for j, c in enumerate(cids):
                mask = assign == j
                if mask.any():
                    new[c] = Xs[mask].mean(axis=0)
            cents = new
        books[mi] = cents
    return books, ids, X, sub


def test_pq_train_matches_numpy_reference(emb, codebook):
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    books, _, _, _ = _np_ref(rows, 4, 8, 2)
    got = {(r["m"], r["cid"]): np.array(r["centroid"]) for r in codebook.collect()}
    want = {(mi, c): v for mi, b in books.items() for c, v in b.items()}
    assert set(got) == set(want)
    for key in want:
        assert np.allclose(got[key], want[key], atol=1e-9), key


def test_pq_encode_matches_brute_force(emb, codebook):
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    books, ids, X, sub = _np_ref(rows, 4, 8, 2)
    enc = {r["vec_id"]: (r["pq_code"], r["recon_err"]) for r in
           SIM.pq_encode(emb, codebook).collect()}
    for i, vid in enumerate(ids):
        codes, err = [], 0.0
        for mi in range(4):
            cids = sorted(books[mi])
            C = np.array([books[mi][c] for c in cids])
            d = ((X[i, mi * sub : (mi + 1) * sub] - C) ** 2).sum(axis=1)
            j = int(d.argmin())
            codes.append(str(cids[j]))
            err += float(d[j])
        assert enc[int(vid)][0] == "-".join(codes), vid
        assert abs(enc[int(vid)][1] - err) < 1e-6, vid


def test_pq_encode_plan_is_scan_stage_only(emb, codebook):
    """The 100 TB contract: encode against an inlined codebook is a narrow
    projection — no Exchange, no join, no Python in the plan."""
    from tests.conftest import final_plan

    plan = final_plan(SIM.pq_encode(emb, codebook))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py not in plan, plan


def test_pq_adc_contract_on_corpus(emb, codebook):
    """On the (near-random) corpus embeddings ADC recall is data-dependent —
    8 codewords per 16-dim subspace is coarse compression by design — so
    pin the CONTRACT, not a recall number: dense deterministic ranks, adc
    monotone in rank, the probe itself retrieved, and every returned
    adc_dist equal to the value recomputed from codes + lookup tables."""
    probe = [
        float(x)
        for x in emb.orderBy("vec_id").limit(1).head()["embedding"]
    ]
    top = SIM.pq_adc_topk(emb, codebook, probe, k=10).collect()
    assert [r["rank"] for r in top] == list(range(1, 11))
    adc = [r["adc_dist"] for r in top]
    assert adc == sorted(adc)
    probe_id = emb.orderBy("vec_id").limit(1).head()["vec_id"]
    assert probe_id in {r["vec_id"] for r in top}
    # recompute adc from the reference codes + luts
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    books, ids, X, sub = _np_ref(rows, 4, 8, 2)
    q = np.array(probe)
    by_id = {int(ids[i]): i for i in range(len(ids))}
    for r in top:
        i = by_id[r["vec_id"]]
        want = 0.0
        for mi in range(4):
            cids = sorted(books[mi])
            C = np.array([books[mi][c] for c in cids])
            d = ((X[i, mi * sub : (mi + 1) * sub] - C) ** 2).sum(axis=1)
            code = int(d.argmin())
            want += float(((q[mi * sub : (mi + 1) * sub] - C[code]) ** 2).sum())
        assert abs(r["adc_dist"] - want) < 1e-6, r


def test_pq_adc_equals_exact_when_quantization_is_lossless(spark):
    """When the corpus has exactly k distinct subvector patterns per
    subspace, Lloyd converges onto them, recon_err is 0, and ADC distance
    IS the exact distance — recall@k is then perfect by construction. This
    pins the ADC arithmetic end-to-end with no approximation blur."""
    rng = np.random.RandomState(7)
    protos = rng.randn(2, 4, 4)  # (m=2 subspaces, k=4 prototypes, sub=4)
    rows = []
    for vid in range(40):
        # the lowest-id seeds (0..3) must carry DISTINCT patterns in BOTH
        # subspaces, else Lloyd sees duplicate seeds and empties clusters
        p0, p1 = vid % 4, (vid % 4 + vid // 4) % 4
        v = np.concatenate([protos[0, p0], protos[1, p1]])
        rows.append((vid, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = SIM.pq_train(df, m=2, k=4, n_iter=3)
    enc = SIM.pq_encode(df, cb).collect()
    assert max(abs(r["recon_err"]) for r in enc) < 1e-18
    probe = rows[5][1]
    top = SIM.pq_adc_topk(df, cb, probe, k=10).collect()
    q = np.array(probe)
    exact = sorted(
        rows, key=lambda r: (round(float(((np.array(r[1]) - q) ** 2).sum()), 9), r[0])
    )
    assert [r["vec_id"] for r in top] == [r[0] for r in exact[:10]]
    for r, (vid, v) in zip(top, exact[:10]):
        assert abs(r["adc_dist"] - ((np.array(v) - q) ** 2).sum()) < 1e-9


def test_pq_queries_registered_with_oracles():
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    for q in ("q_embed_pq_train", "q_embed_pq_encode", "q_embed_pq_adc_topk"):
        assert q in QUERIES and q in ORACLES
