"""Local DuckDB-oracle harness: mirrors the driver's t2 gate.

Every registered query with an oracle runs through Spark AND DuckDB at sf0.001;
results are compared order-insensitively after sorting columns by name — the same
discipline as CORRECTNESS_r{N}.json. Rows-only queries are smoke-run.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def _query_names():
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    return sorted(QUERIES), ORACLES


ALL_NAMES, _ = _query_names()


def test_documents_text_is_ascii(ddb):
    """Several oracles hash or measure `text` as a string where the Spark side
    works on bytes (md5/length in q_doc_redact_pii, q_doc_chunk_windows,
    q_binary_meta's CAST-to-BLOB digest); string-vs-byte equivalence is exact
    only while the corpus is ASCII, so pin that invariant."""
    n = ddb.execute(
        "SELECT count(*) FROM documents WHERE octet_length(CAST(text AS BLOB)) <> length(text)"
    ).fetchone()[0]
    assert n == 0


def _kind_of_spark(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if s in ("float", "double"):
        return "f"
    if s.startswith("decimal"):
        return "d"
    if s == "boolean":
        return "b"
    return "o"


def _kind_of_duck(t: str) -> str:
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t in ("HUGEINT", "UHUGEINT"):
        return "H"  # pandas .df() converts to float64 -> driver hash mismatch
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "f"
    if t.startswith("DECIMAL"):
        return "d"
    if t == "BOOLEAN":
        return "b"
    return "o"


@pytest.mark.parametrize("name", sorted(_query_names()[1]))
def test_oracle_dtype_lint(spark, ddb, name):
    """Driver-hasher dtype lint (VERDICT r3 item 3). The driver compares Spark
    toPandas() against DuckDB .df(); an uncast SUM/list_sum oracle column is
    HUGEINT, which pandas renders as float64 ("42.0" vs Spark's int64 "42") and
    silently hash-mismatches even when values are identical — this burned
    q_scalar_array_hof for three straight rounds. The DuckDB side's DESCRIBE is
    plan-only; the Spark side reads .schema off the built DataFrame, which is
    plan-only for most queries but DOES execute eagerly-materializing ones
    (q_dedup_cluster_cc runs its CC rounds at construction) — accepted cost,
    the lint's coverage matters more. It fails any oracle exposing HUGEINT and
    any integral-vs-float kind disagreement with the Spark-side schema."""
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    duck_types = {
        r[0]: r[1]
        for r in ddb.execute(f"DESCRIBE ({ORACLES[name]})").fetchall()
    }
    spark_types = {f.name: f.dataType for f in QUERIES[name](spark, SF_DIR).schema}
    assert sorted(duck_types) == sorted(spark_types), f"{name}: column sets differ"
    bad = []
    for col, dt in duck_types.items():
        dk, sk = _kind_of_duck(dt), _kind_of_spark(spark_types[col])
        if dk == "H":
            bad.append(f"{col}: oracle is {dt} (HUGEINT family) — CAST it AS BIGINT")
        elif {dk, sk} == {"i", "f"} or {dk, sk} == {"i", "d"}:
            bad.append(f"{col}: oracle {dt} vs spark {spark_types[col].simpleString()}")
    assert not bad, f"{name}: dtype lint: {bad}"


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_vs_oracle(spark, ddb, name):
    from plenario_mapper_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    cols = sdf.columns
    if name not in ORACLES:
        # rows-only contract: runs and yields a stable schema
        assert cols
        return
    oracle = ddb.execute(ORACLES[name])
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    assert sorted(cols) == sorted(o_cols), f"{name}: column sets differ"
    got = _canon([[r[c] for c in cols] for r in spark_rows], cols)
    want = _canon(o_rows, o_cols)
    assert len(got) == len(want), f"{name}: row counts {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch (first diff: "\
        f"{next(((g, w) for g, w in zip(got, want) if g != w), None)})"
