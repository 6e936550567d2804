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
        return float(np.exp(np.log(v.astype("float64")).mean()))

    return geomean
