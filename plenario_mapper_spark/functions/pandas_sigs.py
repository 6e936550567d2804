"""Arrow-vectorized signature UDFs.

NOTE: this module intentionally does NOT use `from __future__ import
annotations` — pandas_udf infers its eval type from the REAL type hints, and
postponed (stringified) annotations break the inference.
"""

import hashlib
import re

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_shingles_udf(shingle_n):
    """text -> array<string> distinct word n-gram shingles.

    Semantics identical to functions.text.shingles (lower, split on
    non-[a-z0-9_], distinct n-grams, whole-text fallback under n) — verified by
    tests comparing against the JVM expression and the DuckDB oracle. Exists
    because the JVM formulation (transform + slice + array_join over an index
    array) is interpreted, measured ~4ms/doc; the Python loop per Arrow batch
    is ~50x faster. Order of the returned array differs from the JVM version
    (set order), which is irrelevant: every consumer treats it as a set."""
    split_re = re.compile(r"[^a-z0-9_]+")

    def _one(text):
        toks = [w for w in split_re.split((text or "").lower()) if w]
        if len(toks) >= shingle_n:
            return list(
                {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            )
        return [" ".join(toks)]

    @pandas_udf("array<string>")
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(_one)

    return sh


def make_minhash_signature_udf(coeffs, mersenne, shingle_n):
    """text -> array<long> MinHash signature (vectorized numpy per Arrow batch).

    `coeffs` is the (K, 2) int64 array of affine permutation coefficients.
    Shingle-set semantics mirror functions.text.shingles exactly (lower, split
    on non-[a-z0-9_], distinct word n-grams, whole-text fallback under n).
    Shingle hashing is md5's low 8 bytes — deterministic across workers
    (Python's builtin hash() is per-process salted and must not be used)."""
    A = coeffs[:, 0:1]  # (K, 1)
    B = coeffs[:, 1:2]
    split_re = re.compile(r"[^a-z0-9_]+")

    def _one(text):
        toks = [w for w in split_re.split((text or "").lower()) if w]
        if len(toks) >= shingle_n:
            sh = {
                " ".join(toks[i : i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            }
        else:
            sh = {" ".join(toks)}
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                % mersenne
                for s in sh
            ),
            dtype=np.int64,
            count=len(sh),
        )
        return ((A * h[None, :] + B) % mersenne).min(axis=1)

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        return texts.map(_one)

    return sig


def make_simhash_md5_udf():
    """text -> long SimHash-64 fingerprint (md5 token hash), vectorized per
    Arrow batch.

    Bit-for-bit identical to the JVM expression form
    (operators.dedup.simhash(..., token_hash='md5'), which mirrors the DuckDB
    oracle): tokens = lower + split on non-[a-z0-9_]; per token, md5 hex chars
    1-15 give bits 0..59 and char 16 gives bits 60..63; votes = sum(2*bit - 1);
    fingerprint bit i set iff vote > 0, packed two's complement (bit 63
    contributes -2^63). Exists because the expression form folds a 64-wide
    zip_with per token through INTERPRETED lambdas (~tokens x 64 evals/doc,
    measured ~13 s for 500 docs); the numpy loop is ~50x faster. Parity with
    the expression form is pinned by test_simhash_udf_matches_expression."""
    split_re = re.compile(r"[^a-z0-9_]+")
    idx60 = np.arange(60, dtype=np.uint64)
    idx4 = np.arange(4, dtype=np.uint64)
    powers = np.concatenate(
        [1 << np.arange(63, dtype=np.uint64), np.array([1 << 63], dtype=np.uint64)]
    )

    def _one(text):
        if text is None:
            return None  # expression form: tokens(NULL) -> NULL fingerprint
        toks = [w for w in split_re.split(text.lower()) if w]
        votes = np.zeros(64, dtype=np.int64)
        bits = np.empty(64, dtype=np.int64)
        for tok in toks:
            h = hashlib.md5(tok.encode()).hexdigest()
            a = np.uint64(int(h[:15], 16))
            b = np.uint64(int(h[15], 16))
            bits[:60] = ((a >> idx60) & np.uint64(1)).astype(np.int64)
            bits[60:] = ((b >> idx4) & np.uint64(1)).astype(np.int64)
            votes += bits * 2 - 1
        packed = powers[votes > 0].sum(dtype=np.uint64)
        return int(packed.astype(np.int64))  # two's complement reinterpret

    @pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(_one)

    return sh


def make_hyperplane_buckets_udf(planes_by_table):
    """embedding array<double> -> array<long> of LSH bucket ids, one per hash
    table, vectorized as ONE matrix multiply per Arrow batch.

    `planes_by_table` is a (T, P, D) float array (T tables, P planes each).
    The expression form (vector.simhash_bucket) folds a D-wide interpreted
    zip_with per plane — T x P x D lambda evals per row (~8k/row for the
    default 6x10x64, measured seconds per 1000 rows); here the whole batch is
    (B, D) @ (D, T*P) in BLAS. Sign packing matches simhash_bucket: bit i set
    iff dot(v, plane_i) >= 0."""
    P = np.asarray(planes_by_table, dtype=np.float64)
    n_tables, n_planes, _dim = P.shape
    flat = P.reshape(n_tables * n_planes, -1)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    dim = flat.shape[1]
    zero_buckets = np.zeros(n_tables, dtype=np.int64)

    @pandas_udf("array<long>")
    def bk(vecs: pd.Series) -> pd.Series:
        vals = vecs.tolist()
        # NULL / wrong-dim embeddings degrade to all-zero buckets (the
        # expression form's when(dot(null, p) >= 0, ...) otherwise-branch),
        # keeping the operator total; clean rows take the matmul fast path
        bad = [i for i, v in enumerate(vals) if v is None or len(v) != dim]
        if not bad:
            M = np.asarray(vals, dtype=np.float64)  # (B, D)
            signs = (M @ flat.T >= 0).reshape(len(M), n_tables, n_planes)
            return pd.Series(list((signs * powers).sum(axis=2)))
        out = []
        for v in vals:
            if v is None or len(v) != dim:
                out.append(zero_buckets)
            else:
                s = (np.asarray(v, dtype=np.float64) @ flat.T >= 0)
                out.append((s.reshape(n_tables, n_planes) * powers).sum(axis=1))
        return pd.Series(out)

    return bk


def grouped_zscore(
    df, group_col: str, value_col: str, out_col: str = "zscore"
):
    """Per-group z-score via grouped-map applyInPandas — the §2.G grouped-map
    UDF surface on a real operator. Each group's Arrow batch is normalized in
    one vectorized pandas pass ((x - mean) / sample-std, ddof=1 to match SQL
    STDDEV_SAMP); groups are independent, so the plan is one shuffle on the
    group key and the Python stage streams batch-at-a-time (bounded memory per
    group — for power-law group sizes prefer the pure-SQL window formulation,
    which this is oracle-checked against)."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    # StructType.add mutates in place — build a fresh schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd == sd else v * float("nan")
        return pdf.assign(**{out_col: z})

    return df.groupBy(group_col).applyInPandas(norm, out_schema)


def geomean_udf():
    """Grouped-agg pandas UDF (Series -> scalar): geometric mean. Arrow ships
    each group's values as one numpy-backed Series; the agg itself is
    vectorized log/mean/exp. Partial aggregation does NOT apply to grouped-agg
    Python UDFs (whole groups move to the Python worker), so at 100 TB prefer
    the algebraic form exp(avg(ln(x))) — which is exactly what the oracle
    checks this against."""
    import numpy as np
    import pandas as pd

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        a = v.astype("float64")
        if bool((a <= 0).any()):
            # zero annihilates the product; negatives are out of the
            # function's domain — explicit branch instead of trusting
            # np.log's -inf/NaN to round-trip through exp (and DuckDB's
            # LN(0) raises outright, so the oracle needs the same branch)
            return 0.0
        return float(np.exp(np.log(a).mean()))

    return geomean


def make_pos_ngrams_udf(n):
    """text -> array<string> POSITIONAL (non-distinct) word n-grams; empty
    under n tokens. Semantics identical to functions.text.pos_ngrams — exists
    for the same measured reason as make_shingles_udf: the corpus-wide
    repetition scan explodes every occurrence, and the Arrow batch loop is
    ~4x faster than even the shifted-slice zip expression (0.5s vs 1.7s for
    5k docs at sf0.1)."""
    split_re = re.compile(r"[^a-z0-9_]+")

    def _one(text):
        toks = [w for w in split_re.split((text or "").lower()) if w]
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    @pandas_udf("array<string>")
    def pg(texts: pd.Series) -> pd.Series:
        return texts.map(_one)

    return pg
