"""Golden tests for the JS-exact coercion truth table (FIXTURES.md §5, derived from
app/mapper.js:192-243 and unit_tests.js:257-415)."""

import json

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.functions import coercion as C

# (json_literal, expected_varchar, expected_int, expected_float, expected_bool)
# None = coercion error. Values are JSON text so runtime type is explicit.
TRUTH_TABLE = [
    ("1", "1", 1, 1.0, True),
    ("10", "10", 10, 10.0, None),
    ('"0"', "0", 0, 0.0, False),
    ('"true"', "true", None, None, True),
    ("true", "true", None, 1.0, True),
    ("false", "false", None, 0.0, False),
    ('"12.9"', "12.9", 12, 12.9, None),
    ('"7px"', "7px", 7, None, None),
    ('"cumulonimbus"', "cumulonimbus", None, None, None),
    # extras probing JS semantics
    ("null", "null", None, 0.0, None),  # Number(null)=0, parseInt(null)=NaN
    ('""', "", None, 0.0, None),  # Number("")=0
    ('"01"', "01", 1, 1.0, None),  # '01' is NOT loosely == '1' (string-string)
    ('"FALSE"', "FALSE", None, None, False),
    ("-5", "-5", -5, -5.0, None),
    ('"NaN"', "NaN", None, None, None),
]


@pytest.fixture(scope="module")
def truth_df(spark):
    rows = [(i, lit) for i, (lit, *_rest) in enumerate(TRUTH_TABLE)]
    df = spark.createDataFrame(rows, "i int, j string")
    return df.select("i", F.parse_json("j").alias("v"))


def _collect(df):
    return {r["i"]: r for r in df.collect()}


def test_truth_table_all_families(truth_df):
    ok_s, out_s = C.coerce_string(F.col("v"))
    ok_i, out_i = C.coerce_int(F.col("v"))
    ok_d, out_d = C.coerce_double(F.col("v"))
    ok_b, out_b = C.coerce_bool(F.col("v"))
    got = _collect(
        truth_df.select(
            "i",
            out_s.alias("s"), ok_i.alias("ok_i"), out_i.alias("out_i"),
            ok_d.alias("ok_d"), out_d.alias("out_d"),
            ok_b.alias("ok_b"), out_b.alias("out_b"),
        )
    )
    for i, (lit, exp_s, exp_i, exp_d, exp_b) in enumerate(TRUTH_TABLE):
        r = got[i]
        assert r["s"] == exp_s, f"varchar({lit}): {r['s']!r} != {exp_s!r}"
        if exp_i is None:
            assert not r["ok_i"], f"int({lit}) should error"
        else:
            assert r["ok_i"] and r["out_i"] == exp_i, f"int({lit}): {r['out_i']}"
        if exp_d is None:
            assert not r["ok_d"], f"float({lit}) should error"
        else:
            assert r["ok_d"] and r["out_d"] == pytest.approx(exp_d), f"float({lit}): {r['out_d']}"
        if exp_b is None:
            assert not r["ok_b"], f"bool({lit}) should error"
        else:
            assert r["ok_b"] and r["out_b"] == exp_b, f"bool({lit}): {r['out_b']}"


def test_dynamic_dispatch_matches_static(truth_df):
    """coerce_ok (dynamic type string) agrees with the per-family results, across
    every type alias the reference accepts (app/mapper.js:199-239)."""
    aliases = {
        "varchar": 1, "string": 1,
        "integer": 2, "int": 2,
        "float": 3, "double": 3, "double precision": 3,
        "bool": 4, "boolean": 4,
    }
    for tname, col_idx in aliases.items():
        got = _collect(
            truth_df.select("i", C.coerce_ok(F.col("v"), F.lit(tname)).alias("ok"))
        )
        for i, row in enumerate(TRUTH_TABLE):
            expected_ok = row[col_idx] is not None
            assert got[i]["ok"] == expected_ok, f"{tname}({row[0]})"


def test_unknown_type_is_error(truth_df):
    got = truth_df.select(
        C.coerce_ok(F.col("v"), F.lit("geometry")).alias("ok"),
        C.coerce_ok(F.col("v"), F.lit(None).cast("string")).alias("ok_null"),
    ).collect()
    assert all(not r["ok"] and not r["ok_null"] for r in got)


def test_js_typeof(truth_df):
    got = _collect(truth_df.select("i", C.js_typeof(F.col("v")).alias("t")))
    expected = ["number", "number", "string", "string", "boolean", "boolean",
                "string", "string", "string", "object", "string", "string",
                "string", "number", "string"]
    for i, exp in enumerate(expected):
        assert got[i]["t"] == exp, f"typeof row {i}"


def test_json_literal_roundtrip(truth_df):
    got = _collect(truth_df.select("i", C.json_literal(F.col("v")).alias("j")))
    for i, (lit, *_ ) in enumerate(TRUTH_TABLE):
        assert json.loads(got[i]["j"]) == json.loads(lit)
