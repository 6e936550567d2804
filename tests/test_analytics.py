"""Customer/behavioral analytics queries: hand-checked semantics."""

import datetime
import os
import tempfile

from plenario_mapper_spark.plans.registry import QUERIES


def test_rfm_exact_rank_quintiles(spark):
    """10 customers, one order each, metrics arranged so every quintile
    gets exactly two customers; '2002-01-01' recency anchor."""
    rows = []
    for i in range(10):
        # custkey i: order on 2001-01-(i+1) -> recency rank follows i desc;
        # totalprice 100*(i+1) -> monetary rank follows i desc
        rows.append(
            (
                i + 1,  # o_orderkey
                i,  # o_custkey
                "O",
                100.0 * (i + 1),
                datetime.datetime(2001, 1, i + 1),
                "1-URGENT",
            )
        )
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        got = {r["custkey"]: r for r in QUERIES["q_customer_rfm"](spark, d).collect()}

    assert len(got) == 10
    # customer 9 ordered most recently and spent the most -> r_q=1, m_q=1
    assert got[9]["r_q"] == 1 and got[9]["m_q"] == 1
    # customer 0 is the stalest and cheapest -> r_q=5, m_q=5
    assert got[0]["r_q"] == 5 and got[0]["m_q"] == 5
    # frequency all tied at 1 -> quintile decided by the custkey tie-break,
    # two customers per band
    f_bands = [got[i]["f_q"] for i in range(10)]
    assert f_bands == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    # exact-rank cut: two customers per recency band as well
    assert sorted(r["r_q"] for r in got.values()) == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    assert got[9]["r_days"] == (
        datetime.date(2002, 1, 1) - datetime.date(2001, 1, 10)
    ).days
    assert got[9]["m_cents"] == 100000
    assert got[9]["rfm"] == "1" + str(got[9]["f_q"]) + "1"


def test_ngram_novelty_hand_checked(spark):
    """Copied docs share all grams; the unique doc shares none; a doc
    shorter than the shingle width falls back to its whole-token gram."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "a", 1),
        (2, "alpha beta gamma delta epsilon zeta", "en", "a", 1),  # exact copy
        (3, "one two three four five six seven", "en", "a", 1),    # unique
        (4, "tiny doc", "en", "a", 1),                              # < 5 tokens
        (5, "tiny doc", "en", "a", 1),                              # copy of 4
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r for r in QUERIES["q_doc_ngram_novelty"](spark, d).collect()
        }
    # 6 tokens -> 2 distinct 5-grams; both shared with the copy
    assert got[1]["n_grams"] == 2 and got[1]["n_shared"] == 2
    assert got[1]["dup_rate"] == 1.0 and got[2]["dup_rate"] == 1.0
    # 7 tokens -> 3 grams, none shared
    assert got[3]["n_grams"] == 3 and got[3]["n_shared"] == 0
    assert got[3]["dup_rate"] == 0.0
    # fallback whole-doc gram, shared between the two tiny copies
    assert got[4]["n_grams"] == 1 and got[4]["dup_rate"] == 1.0


def test_simpson_diversity_hand_checked(spark):
    """Uniform source vs one-token source vs all-unique source."""
    rows = [
        # source u: tokens a a b b -> D = (2+2)/(4*3) = 1/3, inv = 3
        (1, "a a b b", "en", "u", 1),
        # source m: one type only -> D = 1, inv = 1
        (2, "x x x x x", "en", "m", 1),
        # source q: all unique -> rep 0 -> D = 0, inv NULL
        (3, "p q r s", "en", "q", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r
            for r in QUERIES["q_doc_simpson_diversity"](spark, d).collect()
        }
    assert got["u"]["n_tokens"] == 4 and got["u"]["n_types"] == 2
    assert abs(got["u"]["simpson"] - 1 / 3) < 1e-6
    assert abs(got["u"]["inv_simpson"] - 3.0) < 1e-6
    assert got["m"]["simpson"] == 1.0 and got["m"]["inv_simpson"] == 1.0
    assert got["q"]["simpson"] == 0.0 and got["q"]["inv_simpson"] is None


def test_percent_rank_cume_dist_tie_semantics(spark):
    """Ties share percent_rank (gap semantics) but cume_dist counts ALL
    peers at the value; singleton partition percent_rank is 0."""
    rows = [
        (1, "n", 0, 10.0, "A"),
        (2, "n", 0, 10.0, "A"),   # tie with custkey 1 on the value
        (3, "n", 0, 20.0, "A"),
        (4, "n", 0, 5.0, "B"),    # singleton partition
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    )
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        got = {
            r["c_custkey"]: r
            for r in QUERIES["q_window_percentile_rank"](spark, d).collect()
        }
    # order within A by (acctbal, custkey): 1, 2, 3 -> ranks 1, 2, 3 since the
    # custkey tie-break makes every ORDER key unique (no shared ranks)
    assert [got[i]["rnk"] for i in (1, 2, 3)] == [1, 2, 3]
    assert got[1]["pct_rank"] == 0.0
    assert abs(got[2]["pct_rank"] - 0.5) < 1e-6
    assert got[3]["pct_rank"] == 1.0
    assert abs(got[1]["cume"] - 1 / 3) < 1e-6
    assert got[4]["pct_rank"] == 0.0 and got[4]["cume"] == 1.0


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus whose counts are EXACTLY c = 1000/r (slope -1 in log-log)
    must fit slope ~= -1 with r2 ~= 1."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    docs = []
    did = 0
    for r in range(1, 41):
        c = max(1, round(1000 / r))
        # token 'tNN' appears c times spread over docs
        docs.append((did, (" ".join([f"t{r:02d}"] * c)), "en", "s", 1))
        did += 1
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        row = QUERIES["q_vocab_zipf_fit"](spark, d).collect()[0]
    assert row["n_points"] == 40
    assert abs(row["zipf_slope"] + 1.0) < 0.02  # rounding of 1000/r only
    assert row["r2"] > 0.999
    assert abs(row["zipf_intercept"] - 6.9077) < 0.02  # ln(1000)


def test_readability_hand_checked(spark):
    """Known words/sentences/syllables; degenerate docs yield NULL."""
    rows = [
        # "See spot run. See spot." -> 5 words, 2 sentences,
        # syllables: see=1 spot=1 run=1 see=1 spot=1 = 5
        (1, "See spot run. See spot.", "en", "a", 1),
        # no sentence punctuation -> split yields one fragment, 1 sentence
        (2, "just three words", "en", "a", 1),
        # empty text -> 0 words -> NULL grade
        (3, "", "en", "a", 1),
        # punctuation only -> 0 words and 0 sentences -> NULL grade
        (4, "...", "en", "a", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r for r in QUERIES["q_doc_readability"](spark, d).collect()
        }
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    ref = 0.39 * (5 / 2) + 11.8 * (5 / 5) - 15.59
    assert abs(r1["fk_grade"] - ref) < 1e-6
    assert got[2]["n_sentences"] == 1 and got[2]["n_words"] == 3
    assert got[3]["fk_grade"] is None
    assert got[4]["fk_grade"] is None and got[4]["n_sentences"] == 0


def test_pareto_deciles_hand_checked(spark):
    """20 suppliers with revenue 20..1: decile 1 = {20,19} -> share 39/210,
    cum_share telescopes to exactly 1.0 at decile 10."""
    rows = []
    lk = 0
    for s in range(1, 21):
        # supplier s earns exactly s units: one lineitem, price s, disc 0
        lk += 1
        rows.append((lk, 1, s, 1, 1.0, float(s), 0.0, 0.0, "N", "O", None))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            r["decile"]: r
            for r in QUERIES["q_supplier_pareto_deciles"](spark, d).collect()
        }
    assert sorted(got) == list(range(1, 11))
    assert all(got[i]["n_suppliers"] == 2 for i in got)
    assert got[1]["revenue"] == 39.0  # 20 + 19
    assert abs(got[1]["share"] - 39 / 210) < 1e-6
    assert got[10]["cum_share"] == 1.0
    cum = 0.0
    for i in range(1, 11):
        cum += got[i]["share"]
        assert abs(got[i]["cum_share"] - cum) < 5e-6


def test_nested_order_lines_roundtrip(spark):
    """Nested array semantics: duplicate line numbers break ties on
    partkey; scalars derive from the array, matching flat truth."""
    rows = [
        # order 1: duplicate lineno 1 (parts 9 and 3) + lineno 2
        (1, 9, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
        (1, 3, 1, 1, 2.0, 1.0, 0.0, 0.0, "N", "O", None),
        (1, 7, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
        # order 2: single line
        (2, 4, 1, 1, 8.0, 1.0, 0.0, 0.0, "N", "O", None),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            r["orderkey"]: r
            for r in QUERIES["q_nested_order_lines"](spark, d).collect()
        }
    o1 = got[1]
    # sort order: (1, 3), (1, 9), (2, 7) -> first part 3, last part 7
    assert o1["n_lines"] == 3
    assert o1["first_part"] == 3 and o1["last_part"] == 7
    assert o1["total_qty"] == 8.0 and o1["max_lineno"] == 2
    o2 = got[2]
    assert (o2["first_part"], o2["last_part"], o2["n_lines"]) == (4, 4, 1)


def test_largest_remainder_allocation_hand_checked(spark):
    """total=100 cents over equal thirds: floors 33 each, the single
    leftover penny goes to the lowest lineno; books always balance."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    li_rows = [
        # order 50 (passes the %50 gate): three equal-priced lines
        (50, 7, 1, 1, 1.0, 0.01, 0.0, 0.0, "N", "O", None),
        (50, 8, 1, 2, 1.0, 0.01, 0.0, 0.0, "N", "O", None),
        (50, 9, 1, 3, 1.0, 0.01, 0.0, 0.0, "N", "O", None),
        # order 100: weights 2:1, total 101 -> floors 67/33, leftover 1 to
        # the larger remainder (line 2: rem 101*1%3=2 > line 1: 202%3=1)
        (100, 1, 1, 1, 1.0, 0.02, 0.0, 0.0, "N", "O", None),
        (100, 2, 1, 2, 1.0, 0.01, 0.0, 0.0, "N", "O", None),
    ]
    import datetime

    o_rows = [
        (50, 1, "O", 1.00, datetime.datetime(2024, 1, 1), "x"),
        (100, 1, "O", 1.01, datetime.datetime(2024, 1, 1), "x"),
    ]
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        got = {
            (r["orderkey"], r["lineno"]): r
            for r in QUERIES["q_alloc_largest_remainder"](spark, d).collect()
        }
    # order 50: 100 cents over [1,1,1] -> 34/33/33, lineno tie-break
    assert [got[(50, i)]["alloc_cents"] for i in (1, 2, 3)] == [34, 33, 33]
    # order 100: 101 cents over [2,1] -> floors 67/33; remainders 1 vs 2 ->
    # the penny goes to line 2
    assert got[(100, 1)]["alloc_cents"] == 67
    assert got[(100, 2)]["alloc_cents"] == 34
    assert all(r["conserved"] == 1 for r in got.values())


def test_time_to_convert_order_statistics(spark):
    """10 converting users with latencies 1..10 s, one who signs up but
    never buys, and one pre-signup purchase that must not count."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid in range(1, 11):
        rows.append((eid, d0, uid, "signup", 0.0, "{}")); eid += 1
        rows.append(
            (eid, d0 + datetime.timedelta(seconds=uid), uid, "purchase", 0.0, "{}")
        ); eid += 1
    rows.append((eid, d0, 99, "signup", 0.0, "{}")); eid += 1  # never converts
    # user 98 purchased BEFORE signing up -> not a conversion
    rows.append((eid, d0 - datetime.timedelta(hours=1), 98, "purchase", 0.0, "{}")); eid += 1
    rows.append((eid, d0, 98, "signup", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        r = QUERIES["q_events_time_to_convert"](spark, d).collect()[0]
    assert r["n_signups"] == 12 and r["n_converted"] == 10
    assert abs(r["conversion_rate"] - 10 / 12) < 1e-6
    # exact-rank type-1 quantiles over 1..10 s: p50 = rank ceil(11/2)=5 ->
    # 5 s; p90 = rank ceil(99/10)=9 -> 9 s
    assert r["p50_lat_us"] == 5_000_000
    assert r["p90_lat_us"] == 9_000_000


def test_stickiness_hand_checked(spark):
    """Two months: a daily-habit user + a one-day tourist give known
    DAU sums; the ratio is exact."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows, eid = [], 0
    # January (3 active days): user 1 active all 3 days, user 2 on day 1 only
    for day in (1, 2, 3):
        rows.append((eid, datetime.datetime(2024, 1, day), 1, "view", 0.0, "{}")); eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 1), 2, "view", 0.0, "{}")); eid += 1
    # duplicate same-day events must not inflate DAU
    rows.append((eid, datetime.datetime(2024, 1, 1, 9), 2, "click", 0.0, "{}")); eid += 1
    # February: single user, single day
    rows.append((eid, datetime.datetime(2024, 2, 10), 3, "view", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {str(r["month"]): r for r in QUERIES["q_events_stickiness"](spark, d).collect()}
    jan = got["2024-01-01"]
    # DAU: day1=2, day2=1, day3=1 -> sum 4 over 3 days; MAU=2
    assert jan["n_days"] == 3 and jan["dau_sum"] == 4 and jan["mau"] == 2
    assert abs(jan["stickiness"] - 4 / 6) < 1e-6
    feb = got["2024-02-01"]
    assert feb["stickiness"] == 1.0


def test_js_divergence_identity_and_disjoint_extremes(spark):
    """A source identical to the corpus diverges 0; fully-disjoint
    vocabularies hit the ln2 ceiling; a mixed case matches an
    independently-coded reference."""
    import math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    def run(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            return {
                r["source"]: r
                for r in QUERIES["q_doc_js_source_divergence"](spark, d).collect()
            }

    # single source: P == Q exactly -> JS 0, coverage 1
    got = run([(1, "a b c a", "en", "only", 1)])
    assert got["only"]["js_divergence"] == 0.0
    assert got["only"]["corpus_mass_covered"] == 1.0

    # two disjoint-vocab sources of equal mass: for each source,
    # JS(P, M_corpus) where corpus = even mixture
    got = run([(1, "a a b b", "en", "s1", 1), (2, "x x y y", "en", "s2", 1)])

    def ref_js(p_counts, q_counts):
        np_, nq = sum(p_counts.values()), sum(q_counts.values())
        toks = set(p_counts) | set(q_counts)
        js = 0.0
        for t in toks:
            p = p_counts.get(t, 0) / np_
            q = q_counts.get(t, 0) / nq
            m = (p + q) / 2
            if p:
                js += 0.5 * p * math.log(p / m)
            if q:
                js += 0.5 * q * math.log(q / m)
        return js

    corpus = {"a": 2, "b": 2, "x": 2, "y": 2}
    expect = ref_js({"a": 2, "b": 2}, corpus)
    assert abs(got["s1"]["js_divergence"] - expect) < 1e-6
    assert abs(got["s2"]["js_divergence"] - expect) < 1e-6
    assert abs(got["s1"]["corpus_mass_covered"] - 0.5) < 1e-6

    # mixed overlap vs reference
    got = run([(1, "a a b", "en", "s1", 1), (2, "a c c c", "en", "s2", 1)])
    corpus = {"a": 3, "b": 1, "c": 3}
    assert abs(got["s1"]["js_divergence"] - ref_js({"a": 2, "b": 1}, corpus)) < 1e-6
    assert abs(got["s2"]["js_divergence"] - ref_js({"a": 1, "c": 3}, corpus)) < 1e-6


def test_bot_signals_hand_checked(spark):
    """A scripted one-type user flags; a diverse human does not; entropy
    and intensity match hand math."""
    import datetime, math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # bot: 25 clicks, nothing else, all on one day
    for _ in range(25):
        rows.append((eid, d0, 1, "click", 0.0, "{}")); eid += 1
    # human: 4 types x 3 events over 3 days
    for day in range(3):
        for t in ("click", "view", "purchase", "signup"):
            rows.append(
                (eid, d0 + datetime.timedelta(days=day), 2, t, 0.0, "{}")
            ); eid += 1
    # heavy but diverse: 20 events, 50/50 two types -> no flag (share 0.5)
    for i in range(20):
        rows.append((eid, d0, 3, "click" if i % 2 else "view", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r["user_id"]: r for r in QUERIES["q_events_bot_signals"](spark, d).collect()}
    bot, human, heavy = got[1], got[2], got[3]
    assert bot["bot_flag"] == 1 and bot["type_entropy"] == 0.0
    assert bot["top_type_share"] == 1.0 and bot["events_per_day"] == 25.0
    assert human["bot_flag"] == 0
    assert abs(human["type_entropy"] - math.log(4)) < 1e-6
    assert human["events_per_day"] == 4.0
    assert heavy["bot_flag"] == 0 and abs(heavy["type_entropy"] - math.log(2)) < 1e-6


def test_twap_weights_by_holding_time(spark):
    """Value 10 held 9 s then value 100 held 1 s -> TWAP 19; the trailing
    reading carries no weight; single-reading days are excluded."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, d0, 1, "gauge", 10.0, "{}"),
        (2, d0 + datetime.timedelta(seconds=9), 1, "gauge", 100.0, "{}"),
        (3, d0 + datetime.timedelta(seconds=10), 1, "gauge", 7.0, "{}"),  # trailing
        # a lonely reading on day 2: no interval -> excluded
        (4, d0 + datetime.timedelta(days=1), 1, "gauge", 55.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["event_type"], str(r["day"])): r
            for r in QUERIES["q_events_twap"](spark, d).collect()
        }
    assert set(got) == {("gauge", "2024-01-01")}
    r = got[("gauge", "2024-01-01")]
    assert r["n_intervals"] == 2
    assert abs(r["twap"] - (10.0 * 9 + 100.0 * 1) / 10) < 1e-6


def test_corpus_fingerprint_order_invariant_and_change_sensitive(spark):
    """Same rows in any order/partitioning -> same fingerprint; one edited
    row flips it; min/max ride along."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [(i, f"text number {i}", "en", "s", 1) for i in range(50)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def fp(data, parts):
        df = spark.createDataFrame(data, schema).repartition(parts)
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            return {
                r["source"]: tuple(r)
                for r in QUERIES["q_audit_corpus_fingerprint"](spark, d).collect()
            }

    a = fp(rows, 1)
    b = fp(list(reversed(rows)), 7)
    assert a == b  # order and layout cannot change the fingerprint
    edited = rows[:]
    edited[13] = (13, "text number 13 EDITED", "en", "s", 1)
    c = fp(edited, 1)
    assert c["s"] != a["s"]
    assert c["s"][1] == a["s"][1]  # same row count — only content moved


def test_type_correlation_extremes_and_zero_fill(spark):
    """Perfectly parallel series corr=1, mirrored series corr=-1, constant
    series NULL; a type absent on a day counts as 0, not a dropped day."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    up = [1, 2, 3, 4]       # 'a' and 'b' move together
    down = [4, 3, 2, 1]     # 'c' mirrors them
    for t, (u, dn) in enumerate(zip(up, down)):
        day = d0 + datetime.timedelta(days=t)
        for _ in range(u):
            rows.append((eid, day, 1, "a", 0.0, "{}")); eid += 1
            rows.append((eid, day, 1, "b", 0.0, "{}")); eid += 1
        for _ in range(dn):
            rows.append((eid, day, 1, "c", 0.0, "{}")); eid += 1
        # 'flat' fires twice every day -> zero variance -> NULL corr
        rows.append((eid, day, 1, "flat", 0.0, "{}")); eid += 1
        rows.append((eid, day, 1, "flat", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["type_a"], r["type_b"]): r
            for r in QUERIES["q_events_type_correlation"](spark, d).collect()
        }
    assert got[("a", "b")]["corr"] == 1.0
    assert got[("a", "c")]["corr"] == -1.0
    assert got[("a", "flat")]["corr"] is None
    assert all(r["n_days"] == 4 for r in got.values())


def test_type_correlation_absent_day_is_zero(spark):
    """A type missing an entire day gets x=0 for that day — the grid must
    0-fill rather than shrink the calendar."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 2, 1)
    rows = [
        (1, d0, 1, "a", 0.0, "{}"),
        (2, d0 + datetime.timedelta(days=1), 1, "a", 0.0, "{}"),
        (3, d0, 1, "b", 0.0, "{}"),
        # b absent on day 2 entirely
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = QUERIES["q_events_type_correlation"](spark, d).collect()
    r = got[0]
    # a is constant (1,1) -> zero variance -> NULL, but n_days must be 2
    assert r["n_days"] == 2 and r["corr"] is None


def test_churn_labels_gap_and_censoring(spark):
    """A user active Jan+Feb+Apr: Jan not churned, Feb churned (March gap
    despite the April return), Apr censored (corpus ends in April)."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        (1, datetime.datetime(2024, 1, 5), 1, "view", 0.0, "{}"),
        (2, datetime.datetime(2024, 2, 9), 1, "view", 0.0, "{}"),
        (3, datetime.datetime(2024, 4, 2), 1, "view", 0.0, "{}"),
        # user 2 active Jan only -> churned in Jan
        (4, datetime.datetime(2024, 1, 1), 2, "view", 0.0, "{}"),
        # user 3 keeps the corpus alive through April
        (5, datetime.datetime(2024, 3, 1), 3, "view", 0.0, "{}"),
        (6, datetime.datetime(2024, 4, 1), 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["user_id"], str(r["month"])): r
            for r in QUERIES["q_events_churn_labels"](spark, d).collect()
        }
    assert got[(1, "2024-01-01")]["churned"] == 0  # Feb follows
    assert got[(1, "2024-02-01")]["churned"] == 1  # March gap = churn
    assert got[(1, "2024-04-01")]["censored"] == 1
    assert got[(1, "2024-04-01")]["churned"] == 0  # censored, NOT churned
    assert got[(2, "2024-01-01")]["churned"] == 1
    assert got[(3, "2024-03-01")]["churned"] == 0
    assert got[(3, "2024-04-01")]["censored"] == 1


def test_kaplan_meier_hand_checked(spark):
    """Textbook KM with censoring: spells {1,1,2+censored,3}: S(1)=.5,
    censored spell leaves the risk set without dying, S(3)=0."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    def o(k, cust, y, m):
        return (k, cust, "O", 1.0, datetime.datetime(y, m, 1), "x")

    rows = [
        # cust 1: one-month spell (Jan 2020) -> dies at len 1
        o(1, 1, 2020, 1),
        # cust 2: one-month spell (Feb 2020) -> dies at len 1
        o(2, 2, 2020, 2),
        # cust 3: 3-month spell Jan-Mar 2020 -> dies at len 3
        o(3, 3, 2020, 1), o(4, 3, 2020, 2), o(5, 3, 2020, 3),
        # cust 4: spell touching the corpus max month (Apr-May 2020,
        # May is global max) -> len 2, censored
        o(6, 4, 2020, 4), o(7, 4, 2020, 5),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        got = {
            r["spell_months"]: r
            for r in QUERIES["q_survival_kaplan_meier"](spark, d).collect()
        }
    # len 1: at risk 4, 2 deaths -> S(1) = 1/2
    assert got[1]["n_at_risk"] == 4 and got[1]["n_churned"] == 2
    assert abs(got[1]["survival"] - 0.5) < 1e-6
    # len 2: at risk 2, 0 deaths, 1 censored -> S(2) = 1/2 still
    assert got[2]["n_at_risk"] == 2 and got[2]["n_churned"] == 0
    assert got[2]["n_censored"] == 1
    assert abs(got[2]["survival"] - 0.5) < 1e-6
    # len 3: at risk 1, 1 death -> extinction, exact 0
    assert got[3]["n_at_risk"] == 1 and got[3]["survival"] == 0.0


def test_info_gain_extremes(spark):
    """Perfectly predictive feature -> IG == H(label); independent feature
    -> IG == 0; single-label corpus -> H=0 and NULL ratio."""
    import math, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    def run(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            return QUERIES["q_doc_info_gain"](spark, d).collect()[0]

    # source names the language exactly (2 sources, 2 langs, balanced)
    r = run([(i, "t", "en" if i % 2 else "de", "s_en" if i % 2 else "s_de", 1)
             for i in range(8)])
    assert abs(r["h_label"] - math.log(2)) < 1e-6
    assert abs(r["info_gain"] - math.log(2)) < 1e-6
    assert abs(r["gain_ratio_of_entropy"] - 1.0) < 1e-6

    # source independent of language (each source half en, half de)
    r = run([(i, "t", "en" if i % 2 else "de", "a" if i < 4 else "b", 1)
             for i in range(8)])
    assert abs(r["h_label"] - math.log(2)) < 1e-6
    assert r["info_gain"] == 0.0

    # degenerate single-label corpus
    r = run([(i, "t", "en", "a" if i % 2 else "b", 1) for i in range(4)])
    assert r["h_label"] == 0.0 and r["info_gain"] == 0.0
    assert r["gain_ratio_of_entropy"] is None


def test_neyman_quotas_put_budget_where_variance_lives(spark):
    """Two equal-size strata, one 10x the spread: its quota dominates ~10:1;
    quotas sum exactly to the 1000 budget; singleton strata are excluded."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = []
    did = 0
    # stratum 'tight': 100 docs, lengths alternate 1000 +/- 10
    for i in range(100):
        rows.append((did, "t", "en", "tight", 1000 + (10 if i % 2 else -10))); did += 1
    # stratum 'wild': 100 docs, lengths alternate 1000 +/- 100
    for i in range(100):
        rows.append((did, "t", "en", "wild", 1000 + (100 if i % 2 else -100))); did += 1
    rows.append((did, "t", "en", "single", 777))  # excluded: no variance
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r
            for r in QUERIES["q_sample_neyman_quotas"](spark, d).collect()
        }
    assert set(got) == {"tight", "wild"}
    assert got["tight"]["quota"] + got["wild"]["quota"] == 1000
    # equal N, sd ratio exactly 10 -> quotas 10:1 up to the integerization
    assert got["wild"]["quota"] in (909, 910)
    assert abs(got["wild"]["std_chars"] / got["tight"]["std_chars"] - 10) < 1e-6


def test_yoy_growth_hand_checked(spark):
    """Known months: +50% growth, first year NULL, Dec->Jan boundary."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        (1, 1, "O", 100.0, datetime.datetime(2020, 1, 15), "x"),
        (2, 1, "O", 100.0, datetime.datetime(2020, 12, 15), "x"),
        (3, 1, "O", 150.0, datetime.datetime(2021, 1, 15), "x"),
        (4, 1, "O", 50.0, datetime.datetime(2021, 12, 15), "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        got = {str(r["month"]): r for r in QUERIES["q_orders_yoy_growth"](spark, d).collect()}
    assert got["2020-01-01"]["yoy_growth"] is None
    assert abs(got["2021-01-01"]["yoy_growth"] - 0.5) < 1e-6
    assert abs(got["2021-12-01"]["yoy_growth"] + 0.5) < 1e-6
    assert got["2021-01-01"]["revenue_sply"] == 100.0


def test_ltv_cohorts_hand_checked(spark):
    """Two-customer cohort: cumulative per-customer LTV telescopes over
    ages; the 11-month horizon cap drops later revenue."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        # cohort 2020-01 (mi 24241): custs 1, 2
        (1, 1, "O", 100.0, datetime.datetime(2020, 1, 5), "x"),   # age 0
        (2, 2, "O", 50.0, datetime.datetime(2020, 1, 20), "x"),   # age 0
        (3, 1, "O", 30.0, datetime.datetime(2020, 3, 1), "x"),    # age 2
        (4, 2, "O", 10.0, datetime.datetime(2021, 6, 1), "x"),    # age 17: dropped
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        got = {
            (r["cohort_month_index"], r["age_months"]): r
            for r in QUERIES["q_customer_ltv_cohorts"](spark, d).collect()
        }
    cm = 2020 * 12 + 1
    assert set(got) == {(cm, 0), (cm, 2)}
    assert got[(cm, 0)]["cohort_size"] == 2
    assert got[(cm, 0)]["revenue"] == 150.0
    assert abs(got[(cm, 0)]["cum_ltv_per_customer"] - 75.0) < 1e-6
    assert got[(cm, 2)]["revenue"] == 30.0
    assert abs(got[(cm, 2)]["cum_ltv_per_customer"] - 90.0) < 1e-6


def test_rolling_wau_hand_checked(spark):
    """User sets per day chosen so the 7-day union differs from any single
    day; a returning user is not double-counted inside a window."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1)
    day_users = {0: [1, 2], 3: [2, 3], 8: [4]}
    rows, eid = [], 0
    for t, users in day_users.items():
        for u in users:
            rows.append((eid, d0 + datetime.timedelta(days=t), u, "view", 0.0, "{}"))
            eid += 1
            # duplicate events same day must not matter
            rows.append((eid, d0 + datetime.timedelta(days=t), u, "click", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        base = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
        got = {
            r["day_index"] - base: r
            for r in QUERIES["q_events_rolling_wau"](spark, d).collect()
        }
    # day 0: window {day 0} -> {1,2}; day 3: window {0,3} -> {1,2,3} with
    # user 2 on both days counted once; day 8: window {3,8} -> {2,3,4}
    assert got[0]["wau"] == 2 and got[0]["dau"] == 2
    assert got[3]["wau"] == 3 and got[3]["dau"] == 2
    assert got[8]["wau"] == 3 and got[8]["dau"] == 1
    assert set(got) == {0, 3, 8}  # only observed days get a row


def test_session_quality_hand_checked(spark):
    """Bounce counting, day attribution to session START, exact-rank
    median over durations including the zero-duration bounce."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    d0 = datetime.datetime(2024, 1, 1, 23, 50)
    rows = [
        # user 1: session starting 23:50 Jan 1, spanning midnight (2 events)
        (1, d0, 1, "view", 0.0, "{}"),
        (2, d0 + datetime.timedelta(minutes=20), 1, "click", 0.0, "{}"),
        # user 2: bounce on Jan 1 at noon
        (3, datetime.datetime(2024, 1, 1, 12, 0), 2, "view", 0.0, "{}"),
        # user 1: separate session on Jan 2 (gap >> 30 min), 3 events, 10 min
        (4, datetime.datetime(2024, 1, 2, 9, 0), 1, "view", 0.0, "{}"),
        (5, datetime.datetime(2024, 1, 2, 9, 5), 1, "view", 0.0, "{}"),
        (6, datetime.datetime(2024, 1, 2, 9, 10), 1, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            str(r["day"]): r
            for r in QUERIES["q_events_session_quality"](spark, d).collect()
        }
    jan1 = got["2024-01-01"]
    # two sessions start Jan 1 (the midnight-spanning one counts HERE)
    assert jan1["n_sessions"] == 2 and jan1["n_bounces"] == 1
    assert abs(jan1["bounce_rate"] - 0.5) < 1e-6
    assert abs(jan1["events_per_session"] - 1.5) < 1e-6
    # durations on Jan 1: 0 (bounce) and 20 min -> exact-rank median = rank 1 -> 0
    assert jan1["p50_duration_us"] == 0
    jan2 = got["2024-01-02"]
    assert jan2["n_sessions"] == 1 and jan2["p50_duration_us"] == 600_000_000


def test_template_prefix_flags_boilerplate_source(spark):
    """A source whose docs share an opening template flags; a diverse
    source does not; short docs use their whole prefix."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = []
    did = 0
    # 'boiler': 4 of 5 docs share the same 8-token opening
    opening = "welcome to acme corp the leading provider of"
    for i in range(4):
        rows.append((did, opening + f" thing {i}", "en", "boiler", 1)); did += 1
    rows.append((did, "totally different text here", "en", "boiler", 1)); did += 1
    # 'varied': all distinct openings
    for i in range(5):
        rows.append((did, f"unique opening number {i} with words", "en", "varied", 1)); did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r
            for r in QUERIES["q_doc_template_prefix"](spark, d).collect()
        }
    b = got["boiler"]
    assert b["top_prefix"] == opening
    assert b["n_docs_sharing"] == 4 and b["n_docs"] == 5
    assert b["template_suspect"] == 1
    v = got["varied"]
    assert v["n_docs_sharing"] == 1 and v["template_suspect"] == 0


def test_encoding_audit_synthetic_mojibake(spark):
    """Planted damage: accented chars count as non-ASCII mass, a NUL byte
    trips the control flag, U+FFFD trips the replacement flag, tabs and
    newlines do NOT count as non-ASCII."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        (1, "clean ascii text\twith tab\nand newline", "en", "ok", 1),
        (2, "café naïve résumé", "en", "accents", 1),  # 4 non-ascii
        (3, "binary\x00leak", "en", "ctrl", 1),
        (4, "lost � data � here", "en", "repl", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r
            for r in QUERIES["q_doc_encoding_audit"](spark, d).collect()
        }
    assert got["ok"]["n_non_ascii"] == 0
    assert got["ok"]["n_docs_control_chars"] == 0
    assert got["accents"]["n_non_ascii"] == 4
    assert got["accents"]["n_docs_control_chars"] == 0
    assert got["ctrl"]["n_docs_control_chars"] == 1
    assert got["ctrl"]["n_non_ascii"] == 1  # the NUL itself is non-printable
    assert got["repl"]["n_docs_replacement_char"] == 1
    assert got["repl"]["n_non_ascii"] == 2


def test_cross_source_rate_hand_checked(spark):
    """Two identical docs in one source + one identical doc in another:
    3 pairs total, 1 within-source, 2 cross-source."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, text, "en", "a", 1),
        (2, text, "en", "a", 1),
        (3, text, "en", "b", 1),
        (4, "completely unrelated content with different words", "en", "b", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        r = QUERIES["q_dedup_cross_source_rate"](spark, d).collect()[0]
    assert r["n_pairs"] == 3
    assert r["n_within_source"] == 1  # (1,2)
    assert r["n_cross_source"] == 2   # (1,3), (2,3)
    assert abs(r["cross_source_rate"] - 2 / 3) < 1e-6


def test_volume_price_decomposition_hand_checked(spark):
    """Jan: 2 orders x 100; Feb: 3 orders x 120 -> delta 160 = volume 100
    + price 60; the identity bit holds."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        (1, 1, "O", 100.0, datetime.datetime(2024, 1, 3), "x"),
        (2, 1, "O", 100.0, datetime.datetime(2024, 1, 9), "x"),
        (3, 1, "O", 120.0, datetime.datetime(2024, 2, 1), "x"),
        (4, 1, "O", 120.0, datetime.datetime(2024, 2, 2), "x"),
        (5, 1, "O", 120.0, datetime.datetime(2024, 2, 3), "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        got = QUERIES["q_orders_volume_price_decomp"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["revenue_delta"] == 160.0
    assert abs(r["volume_effect"] - 100.0) < 1e-6   # (3-2) x 100
    assert abs(r["price_effect"] - 60.0) < 1e-6     # 3 x (120-100)
    assert r["decomposition_exact"] == 1


def test_heaps_fit_recovers_planted_exponent(spark):
    """A corpus built so V(N) = N^0.5 exactly at every checkpoint must fit
    beta ~= 0.5 with r2 ~= 1; a closed-vocabulary corpus fits beta ~= 0."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    def run(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
            return QUERIES["q_vocab_heaps_fit"](spark, d).collect()[0]

    # doc k (1-based) carries exactly one UNSEEN token plus 2k-2 repeats of
    # doc 1's token: cum_tokens = k^2, cum_vocab = k -> V = N^0.5 exactly
    # at every checkpoint
    rows = []
    for k in range(1, 31):
        toks = [f"new{k:03d}"] + ["new001"] * (2 * k - 2)
        rows.append((k, " ".join(toks), "en", "s", 1))
    r = run(rows)
    assert r["n_checkpoints"] == 30
    assert r["total_tokens"] == 900 and r["total_vocab"] == 30
    assert abs(r["heaps_beta"] - 0.5) < 1e-6
    assert r["r2"] > 0.999999

    # closed vocabulary: every doc the same 5 tokens -> V flat after doc 1
    rows = [(k, "a b c d e", "en", "s", 1) for k in range(1, 21)]
    r = run(rows)
    assert r["total_vocab"] == 5
    assert abs(r["heaps_beta"]) < 0.15


def test_mahalanobis_flags_jointly_impossible_point(spark):
    """A point unremarkable on each axis but off the correlation line must
    out-rank marginal extremes; values match a numpy reference."""
    import datetime, os, tempfile

    import numpy as np

    from plenario_mapper_spark.plans.registry import QUERIES

    # strongly correlated cloud: y = 100*x (+/- small), x in 2..11;
    # plus the joint outlier (6, 1100): mid x, mid-ish y, but far OFF the line
    pts = [(i, 2 + (i % 10), 100.0 * (2 + (i % 10)) + (1 if i % 2 else -1))
           for i in range(1, 41)]
    pts.append((99, 6, 1100.0))
    o_rows, li_rows = [], []
    for k, nl, total in pts:
        o_rows.append((k, 1, "O", total / 100.0, datetime.datetime(2024, 1, 1), "x"))
        for j in range(nl):
            li_rows.append((k, j + 1, 1, j + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    orders = spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        got = QUERIES["q_orders_mahalanobis_outliers"](spark, d).collect()
    top = got[0]
    assert top["orderkey"] == 99  # the off-line point wins
    # numpy reference for its distance
    xs = np.array([nl for _, nl, _ in pts], dtype=float)
    ys = np.array([round(t) for _, _, t in pts], dtype=float)  # cents = total here
    X = np.stack([xs, ys], axis=1)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    inv = np.linalg.inv(cov)
    dv = np.array([6.0, 1100.0]) - mu
    ref = float(dv @ inv @ dv)
    assert abs(top["mahalanobis_sq"] - ref) < 1e-4


def test_interpurchase_time_order_statistics(spark):
    """Gaps engineered to 1..8 days across two customers: exact-rank
    quartiles at ranks 2/4/6; single-order customers contribute nothing."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows, key = [], 0
    d0 = datetime.date(2024, 1, 1)

    def add(cust, dates):
        nonlocal key
        for dt in dates:
            key += 1
            rows.append(
                (key, cust, "O", 1.0,
                 datetime.datetime(dt.year, dt.month, dt.day), "x")
            )

    # customer 1: gaps 1, 2, 3, 4 days; customer 2: gaps 5, 6, 7, 8
    days1 = [d0]
    for gp in (1, 2, 3, 4):
        days1.append(days1[-1] + datetime.timedelta(days=gp))
    days2 = [d0]
    for gp in (5, 6, 7, 8):
        days2.append(days2[-1] + datetime.timedelta(days=gp))
    add(1, days1)
    add(2, days2)
    add(3, [d0])  # single order -> no gap
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        r = QUERIES["q_orders_interpurchase_time"](spark, d).collect()[0]
    assert r["n_gaps"] == 8 and r["n_repeat_cust"] == 2
    # ranks: ceil(8/4)=2 -> 2 days; ceil(8/2)=4 -> 4; ceil(24/4)=6 -> 6
    assert (r["p25_days"], r["p50_days"], r["p75_days"]) == (2, 4, 6)


def test_unseen_mass_hand_checked(spark):
    """All-hapax source -> P_unseen = 1; no-hapax source -> 0; mixed source
    matches N1/N exactly."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = [
        (1, "a b c d", "en", "fresh", 1),          # all hapax -> 1.0
        (2, "x x y y", "en", "stable", 1),          # no hapax -> 0.0
        (3, "p p p q r", "en", "mixed", 1),         # N1=2 (q,r), N=5, dis=0
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["source"]: r for r in QUERIES["q_doc_unseen_mass"](spark, d).collect()
        }
    assert got["fresh"]["p_unseen_gt"] == 1.0 and got["fresh"]["n_hapax"] == 4
    assert got["stable"]["p_unseen_gt"] == 0.0
    assert got["stable"]["n_dis_legomena"] == 2
    assert abs(got["mixed"]["p_unseen_gt"] - 2 / 5) < 1e-6


def test_term_burstiness_discriminates_function_vs_bursty(spark):
    """Equal total frequency, opposite dispersion: the sprinkled word has
    burstiness 1 and full coverage; the stacked word has burstiness 6 and
    low coverage."""
    import os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    rows = []
    # 'the' once in each of 6 docs; 'spam' 6 times inside doc 0 only
    for i in range(6):
        text = "the pad" + (" spam" * 6 if i == 0 else "")
        rows.append((i, text, "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["token"]: r
            for r in QUERIES["q_vocab_term_burstiness"](spark, d).collect()
        }
    assert got["the"]["tf"] == 6 and got["spam"]["tf"] == 6
    assert got["the"]["burstiness"] == 1.0 and got["the"]["doc_coverage"] == 1.0
    assert got["spam"]["burstiness"] == 6.0
    assert abs(got["spam"]["doc_coverage"] - 1 / 6) < 1e-6


def test_session_gap_boundary_is_microsecond_exact(spark):
    """A gap of 1800.3s must BREAK the 30-min session, and a gap of exactly
    1800.0s must NOT (strict >) — in whole-second arithmetic both truncate
    to 1800 and merge, which diverged from the oracle's micro-exact INTERVAL
    comparison on jittered timestamps (fuzz_parity seed 202, r9). Pins both
    q_events_sessionize and q_events_session_quality's gap chain."""
    import datetime, os, tempfile

    from plenario_mapper_spark.plans.registry import QUERIES

    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0, 500000)
    rows = [
        # user 1: 1800.3s gap -> two sessions
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=1800, microseconds=300000), 1, "view", 0.0, "{}"),
        # user 2: exactly 1800.0s gap -> one session (strict >)
        (3, t0, 2, "view", 0.0, "{}"),
        (4, t0 + datetime.timedelta(seconds=1800), 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        sess = QUERIES["q_events_sessionize"](spark, d).collect()
        per_user = {}
        for r in sess:
            per_user.setdefault(r["user_id"], []).append(r)
        assert len(per_user[1]) == 2  # 1800.3s gap broke the session
        assert len(per_user[2]) == 1  # exactly 1800s did not (strict >)
