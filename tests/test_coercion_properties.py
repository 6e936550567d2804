"""Property-based check of string coercion against an independent Python model
of the JS semantics (ECMA-262 parseInt / StringToNumber / the reference's bool
acceptance set, app/mapper.js:192-243).

The Column implementation and this model are written from the same spec by
different construction (regex/conv expressions vs direct Python); agreement on
adversarial inputs (hex/binary/octal prefixes, signs, exponents, Infinity
spellings, garbage) is strong evidence both encode the spec."""

import json
import math
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from plenario_mapper_spark.functions import coercion as C


# --- the model --------------------------------------------------------------


def js_parse_int(s: str):
    t = s.lstrip()
    sign = 1
    if t[:1] in ("+", "-"):
        sign = -1 if t[0] == "-" else 1
        t = t[1:]
    m = re.match(r"^0[xX]([0-9a-fA-F]+)", t)
    if m:
        return sign * int(m.group(1), 16)
    m = re.match(r"^[0-9]+", t)
    if m:
        return sign * int(m.group(0))
    return None  # NaN -> coercion error


def js_number(s: str):
    t = s.strip()
    if t == "":
        return 0.0
    if re.fullmatch(r"0[xX][0-9a-fA-F]+", t):
        return float(int(t[2:], 16))
    if re.fullmatch(r"0[bB][01]+", t):
        return float(int(t[2:], 2))
    if re.fullmatch(r"0[oO][0-7]+", t):
        return float(int(t[2:], 8))
    if re.fullmatch(r"[+-]?Infinity", t):
        return -math.inf if t.startswith("-") else math.inf
    if re.fullmatch(r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?", t):
        return float(t)
    return None  # NaN


def js_bool(s: str):
    if s == "1" or s.upper() == "TRUE":
        return True
    if s == "0" or s.upper() == "FALSE":
        return False
    return None


# --- inputs: adversarial string soup + curated edges ------------------------

EDGES = [
    "0x1A", "-0x1A", "+0x1A", "0X0", "0x", "0b101", "0o17", "0b", "0o8",
    "Infinity", "-Infinity", "+Infinity", "infinity", "INFINITY", "NaN", "nan",
    "1e5", "1E+3", ".5", "12.", "12.9", "7px", "  42  ", "", " ", "+", "-",
    "1_000", "0x1Ag", "--1", "++1", "1.2.3", "e5", ".e3", "5.5e", "true", "12d",
]

soup = st.text(alphabet="0123456789abcxXoObBeE+-. Ifnpz", max_size=10)


@settings(max_examples=15, deadline=None)
@given(batch=st.lists(soup, min_size=1, max_size=40))
def test_string_coercion_matches_js_model(spark, batch):
    inputs = list(dict.fromkeys(EDGES + batch))
    df = spark.createDataFrame(
        [(s, json.dumps(s)) for s in inputs], "s string, j string"
    )
    v = F.parse_json("j")
    got = df.select(
        "s",
        C.coerce_int(v)[1].alias("i"),
        C.coerce_double(v)[1].alias("d"),
        C.coerce_bool(v)[1].alias("b"),
    ).collect()
    for r in got:
        s = r["s"]
        want_i, want_d, want_b = js_parse_int(s), js_number(s), js_bool(s)
        assert r["i"] == want_i, f"parseInt({s!r}): {r['i']} != {want_i}"
        if want_d is None or r["d"] is None:
            assert r["d"] == want_d, f"Number({s!r}): {r['d']} != {want_d}"
        else:
            assert r["d"] == want_d or (
                math.isinf(want_d) and math.isinf(r["d"])
            ), f"Number({s!r}): {r['d']} != {want_d}"
        assert r["b"] == want_b, f"bool({s!r}): {r['b']} != {want_b}"
