"""The mapper pipeline: normalize → validate → coerce → split → route.

Reproduces app/mapper.js parse_data/insert_emit/format_obs semantics as ONE
shuffle-free DataFrame pipeline:

- normalization (lower-case node_id/sensor/data keys, app/mapper.js:60-68);
- validation (invalid_keys, app/mapper.js:411-419) and coercion-error detection
  (coerce_types, :192-243) via JVM map functions against a broadcast schema
  registry — the reference's in-memory `map`/`type_map` hash lookups;
- record split into a clean half and a misfit half (insert_emit, :251-271);
- routing: per-(network, feature) typed projections (feature_query_text, :319-358),
  a dead-letter projection (misfit_query_text, :306-310), and per-feature emit
  messages (format_obs, :365-403).

Scale notes: the only join is a broadcast against a KB-sized schema registry, so the
whole pipeline is narrow (no shuffle), pipelined inside whole-stage codegen, and
scales linearly with input splits. Routing to per-feature tables is filter+project
per registry entry (registry is small by construction); the lake-mode sink is a
single write partitioned by (network, feature).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from plenario_mapper_spark.functions import coercion as C

ENVELOPE = ("node_id", "datetime", "meta_id", "sensor", "network")


def normalize(obs: DataFrame, data_col: str = "data") -> DataFrame:
    """Lower-case node_id, sensor, and every data key (values untouched) —
    app/mapper.js:60-68. `data` arrives as raw JSON object text and leaves as
    MAP<STRING, VARIANT> (JSON runtime types preserved for coercion).

    Duplicate keys after lowercasing follow the reference's in-place rewrite
    (app/mapper.js:63-68): it walks Object.keys(data) and reassigns ONLY keys
    that are not already lowercase (`if (key != key.toLowerCase())`), so a
    case-variant key ALWAYS overwrites a plain-lowercase key regardless of
    document position ({"Temp":1,"temp":2} -> temp=1 and {"temp":2,"Temp":1}
    -> temp=1), and among several case-variants the LAST in document order
    wins ({"TEMP":3,"Temp":1} -> temp=1). A variant map alone can't reproduce
    that — variant objects store fields sorted by name — so exact parity
    rebuilds the entry list from `json_object_keys` (document order) as
    plain-lowercase keys first, then non-lowercase keys in document order,
    with values probed from the variant map, and map_from_entries +
    mapKeyDedupPolicy=LAST_WIN (set by session.get_spark) applying the JS
    overwrite rule.

    Known divergence: JSON with duplicate SAME-case keys (which JSON.parse
    silently resolves last-wins before the reference's loop runs) is rejected
    by Spark's variant parser, so `data` becomes NULL here and the record
    dead-letters instead of proceeding with the deduped object.

    That rebuild costs a second JSON walk + one map probe per key — measured
    ~2.5x on the whole hot path — so it runs ONLY for rows that actually carry
    a case-collision. `when` evaluates branches lazily per row, and a collision
    is detectable for free: transform_keys under LAST_WIN dedupes colliding
    keys, so collision <=> size(cheap) != size(parsed). Collision-free rows
    (the steady state) pay exactly the old single transform_keys pass.

    The parse and the cheap map are staged through intermediate projections
    (variant expressions are interpreted, with no common-subexpression reuse
    inside one projection — inlining `parsed` at its three use sites re-parses
    the JSON three times per row; CollapseProject keeps non-cheap multi-use
    aliases in their own projection, making this a per-row let-binding, the
    same trick annotate() uses for its HOF pass).
    """
    parsed_c, cheap_c = f"_{data_col}_parsed", f"_{data_col}_cheap"
    df = obs.withColumn(
        parsed_c, F.try_parse_json(F.col(data_col)).cast("map<string, variant>")
    )
    p = F.col(parsed_c)
    df = df.withColumn(cheap_c, F.transform_keys(p, lambda k, _: F.lower(k)))
    c = F.col(cheap_c)
    keys = F.json_object_keys(F.col(data_col))
    exact = F.map_from_entries(
        F.transform(
            F.concat(
                F.filter(keys, lambda k: k == F.lower(k)),
                F.filter(keys, lambda k: k != F.lower(k)),
            ),
            lambda k: F.struct(
                F.lower(k).alias("key"), F.element_at(p, k).alias("value")
            ),
        )
    )
    return df.withColumns(
        {
            "node_id": F.lower("node_id"),
            "sensor": F.lower("sensor"),
            data_col: F.when(p.isNull(), F.lit(None).cast("map<string,variant>"))
            .when(F.size(c) == F.size(p), c)
            .otherwise(exact),
        }
    ).drop(parsed_c, cheap_c)


def _entry_info(kmap: Column, key: Column) -> Column:
    return F.element_at(kmap, key)


def annotate(obs: DataFrame, kmap_df: DataFrame) -> DataFrame:
    """Join the broadcast schema registry and derive the validation/split columns.

    Adds:
      kmap            raw_key -> (feature, property, type, fp) for this sensor
                      (NULL when the sensor is unknown — ref app/mapper.js:78)
      _ann            per-entry annotation array: (key, value, vt, info, unknown,
                      err) — computed in ONE pass over map_entries(data)
      invalid_keys    data keys absent from the registry (invalid_keys, :411-419)
      error_keys      known keys whose value fails JS coercion (:192-243)
      bad_keys        invalid ∪ error — drives the record split (:255)
      misfit_data     the bad half of `data` (dead-letter residue, :306-310)
      clean_data      the good half of `data`
      features        distinct features touched by clean_data (:275-281)

    Performance shape: HOF inputs are materialized arrays, so the nested
    transform acts as a let-binding — schema_of_variant and the registry lookup
    run once per entry, and every derived column is a cheap filter/transform of
    `_ann`. (The naive formulation — each derived column re-probing the variant
    map — re-evaluated the whole interpreted expression tree per column per key
    and was ~20x slower; variant + HOF expressions do not enter whole-stage
    codegen, so tree size IS the runtime.)
    """
    df = obs.join(F.broadcast(kmap_df), "sensor", "left")

    kmap = F.col("kmap")
    data = F.col("data")

    raw = F.transform(
        F.map_entries(data),
        lambda e: F.struct(
            e["key"].alias("key"),
            e["value"].alias("value"),
            C.vtype(e["value"]).alias("vt"),
            F.element_at(kmap, e["key"]).alias("info"),
        ),
    )
    ann = F.transform(
        raw,
        lambda a: F.struct(
            a["key"].alias("key"),
            a["value"].alias("value"),
            a["vt"].alias("vt"),
            a["info"].alias("info"),
            (kmap.isNull() | a["info"].isNull()).alias("unknown"),
            F.when(kmap.isNull() | a["info"].isNull(), F.lit(False))
            .otherwise(~C.coerce_ok_vt(a["value"], a["vt"], a["info"]["type"]))
            .alias("err"),
        ),
    )
    df = df.withColumn("_ann", ann)

    a = F.col("_ann")
    df = (
        df.withColumn(
            "invalid_keys",
            F.transform(F.filter(a, lambda x: x["unknown"]), lambda x: x["key"]),
        )
        .withColumn(
            "error_keys",
            F.transform(F.filter(a, lambda x: x["err"]), lambda x: x["key"]),
        )
        .withColumn("bad_keys", F.concat("invalid_keys", "error_keys"))
        .withColumn(
            "misfit_data",
            F.map_from_entries(
                F.transform(
                    F.filter(a, lambda x: x["unknown"] | x["err"]),
                    lambda x: F.struct(x["key"], x["value"]),
                )
            ),
        )
        .withColumn(
            "clean_data",
            F.map_from_entries(
                F.transform(
                    F.filter(a, lambda x: ~(x["unknown"] | x["err"])),
                    lambda x: F.struct(x["key"], x["value"]),
                )
            ),
        )
        .withColumn(
            "features",
            F.array_distinct(
                F.transform(
                    F.filter(a, lambda x: ~(x["unknown"] | x["err"])),
                    lambda x: x["info"]["feature"],
                )
            ),
        )
    )
    return df


def dead_letter(annotated: DataFrame) -> DataFrame:
    """Rows for <network>__unknown_feature: the misfit residue as a JSON object
    string — JSON.stringify of the bad half (app/mapper.js:306-310). Emitted once
    per record that has any bad key (insert_emit split, :251-268)."""
    return annotated.filter(F.size("bad_keys") > 0).select(
        "network",
        "node_id",
        "datetime",
        "meta_id",
        "sensor",
        F.to_json("misfit_data").alias("data"),
    )


def clean_rows(annotated: DataFrame) -> DataFrame:
    """Records (post-split) that carry at least one clean key — the recursion input
    of insert_emit (app/mapper.js:269-271)."""
    return annotated.filter(F.size("clean_data") > 0)


def feature_rows(
    annotated: DataFrame, feature: str, properties: list[tuple[str, str]]
) -> DataFrame:
    """Typed projection for one feature table (<network>__<feature>).

    Only properties observed in the record get values; the rest are NULL —
    NULL-filling proven by tests/travis_tests/integration_tests.js:354-370.
    `properties` is [(name, metadata_type)] from the registry; the type is static
    here so coercion compiles to plain typed columns.
    """
    fp_map = F.map_from_entries(
        F.transform(
            F.filter(F.col("_ann"), lambda x: ~(x["unknown"] | x["err"])),
            lambda x: F.struct(
                x["info"]["fp"].alias("fp"),
                F.struct(x["value"].alias("v"), x["vt"].alias("vt")).alias("pv"),
            ),
        )
    )
    df = clean_rows(annotated).filter(F.array_contains("features", feature))
    df = df.withColumn("_fp", fp_map)
    cols = [F.col(c) for c in ENVELOPE]
    for prop, typ in properties:
        e = F.element_at("_fp", F.lit(f"{feature}.{prop}"))
        cols.append(
            F.when(e.isNotNull(), C.coerce_typed_vt(e["v"], e["vt"], typ)).alias(prop)
        )
    return df.select(*cols)


def emit_messages(annotated: DataFrame) -> DataFrame:
    """Per-feature socket messages (format_obs, app/mapper.js:365-403; emit
    :292-296): one row per (record, feature) with results = {property: coerced}
    as a JSON object string. Only the clean half emits; a record whose data was
    entirely bad emits nothing (insert_emit recursion guard, :269-271)."""
    df = clean_rows(annotated).select(
        *ENVELOPE,
        "_ann",
        F.explode("features").alias("feature"),
    )
    # clean entries of THIS feature, rendered "property":<json literal> — one
    # filter+transform over the already-annotated entries
    pieces = F.transform(
        F.filter(
            F.col("_ann"),
            lambda x: ~(x["unknown"] | x["err"])
            & (x["info"]["feature"] == F.col("feature")),
        ),
        lambda x: F.concat(
            C.json_quote(x["info"]["property"]),
            F.lit(":"),
            C.coerced_json_literal_vt(x["value"], x["vt"], x["info"]["type"]),
        ),
    )
    # results as a JSON object keyed by property name
    results_json = F.concat(F.lit("{"), F.concat_ws(",", pieces), F.lit("}"))
    return df.select(
        F.col("node_id").alias("node"),
        "datetime",
        "sensor",
        "network",
        "feature",
        results_json.alias("results"),
    )


@dataclass
class MapperResult:
    """All outputs of one mapper pass over a batch of observations."""

    annotated: DataFrame
    dead_letter: DataFrame
    emits: DataFrame
    features: dict[str, DataFrame] = field(default_factory=dict)


def run_mapper(
    obs: DataFrame, kmap_df: DataFrame, registry: list[dict]
) -> MapperResult:
    """Full batch pass: normalize + annotate once, then derive every output.

    `registry` comes from metadata.feature_registry; each entry yields one typed
    per-feature DataFrame keyed "<feature>" (callers prepend the network when
    materializing per-(network, feature) tables, or write the lot as one lake table
    partitioned by (network, feature))."""
    ann = annotate(normalize(obs), kmap_df)
    return MapperResult(
        annotated=ann,
        dead_letter=dead_letter(ann),
        emits=emit_messages(ann),
        features={
            entry["feature"]: feature_rows(ann, entry["feature"], entry["properties"])
            for entry in registry
        },
    )
