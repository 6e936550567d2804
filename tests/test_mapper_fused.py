"""The fused annotate pass (r14): every sink-ready rendition is derived in
annotate's single variant/HOF pass, and sinks consume plain fields only.

Parity is pinned two ways: (1) the renditions must equal a re-derivation from
the carried variant values with the pre-r14 per-sink formulas (this file), and
(2) the six q_mapper_* oracle queries stay byte-identical vs DuckDB (t2 gate).
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from plenario_mapper_spark.functions import coercion as C
from plenario_mapper_spark.operators import mapper as M


def _ann_full(obs_df, kmap_df):
    # every rendition plus the carried variant fields (for re-derivation)
    return M.annotate(
        M.normalize(obs_df), kmap_df,
        typed=True, emit=True, misfit=True, alert=True, carry_variant=True,
    )


def test_misfit_json_matches_variant_map_render(obs_df, kmap_df):
    ann = _ann_full(obs_df, kmap_df)
    bad = ann.filter(
        F.col("misfit_json") != F.to_json("misfit_data")
    ).count()
    assert bad == 0
    # and the NULL-data guard: both NULL together
    drift = ann.filter(
        F.col("misfit_json").isNull() != F.to_json("misfit_data").isNull()
    ).count()
    assert drift == 0


def test_typed_renditions_match_per_sink_coercion(obs_df, kmap_df):
    """typed.{s,i,d,b} must equal the pre-r14 sink-side coerce_typed_vt of the
    carried variant value against the entry's own metadata type family."""
    ann = _ann_full(obs_df, kmap_df)
    checks = F.transform(
        F.filter(F.col("_ann"), lambda x: ~(x["unknown"] | x["err"])),
        lambda x: F.struct(
            (
                x["typed"]["s"].eqNullSafe(
                    F.when(C._is_in(x["typ"], C.STRING_TYPES),
                           C.js_string_vt(x["value"], x["vt"]))
                )
            ).alias("s_ok"),
            (
                x["typed"]["i"].eqNullSafe(
                    F.when(C._is_in(x["typ"], C.INT_TYPES),
                           C.coerce_int_vt(x["value"], x["vt"])[1])
                )
            ).alias("i_ok"),
            (
                x["typed"]["d"].eqNullSafe(
                    F.when(C._is_in(x["typ"], C.FLOAT_TYPES),
                           C.coerce_double_vt(x["value"], x["vt"])[1])
                )
            ).alias("d_ok"),
            (
                x["typed"]["b"].eqNullSafe(
                    F.when(C._is_in(x["typ"], C.BOOL_TYPES),
                           C.coerce_bool_vt(x["value"], x["vt"])[1])
                )
            ).alias("b_ok"),
        ),
    )
    bad = ann.select(
        F.size(
            F.filter(
                checks,
                lambda c: ~(c["s_ok"] & c["i_ok"] & c["d_ok"] & c["b_ok"]),
            )
        ).alias("n_bad")
    ).agg(F.sum("n_bad")).collect()[0][0]
    assert not bad


def test_emit_and_alert_renditions_match(obs_df, kmap_df):
    ann = _ann_full(obs_df, kmap_df)
    jq = C.json_quote
    piece_bad = ann.select(
        F.size(
            F.filter(
                F.filter(F.col("_ann"), lambda x: ~(x["unknown"] | x["err"])),
                lambda x: ~x["jpiece"].eqNullSafe(
                    F.concat(
                        jq(x["info"]["property"]),
                        F.lit(":"),
                        C.coerced_json_literal_vt(x["value"], x["vt"], x["info"]["type"]),
                    )
                ),
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert not piece_bad

    alert_bad = ann.select(
        F.size(
            F.filter(
                F.filter(F.col("_ann"), lambda x: x["err"]),
                lambda x: ~(
                    x["orig"].eqNullSafe(C.js_string_vt(x["value"], x["vt"]))
                    & x["tof"].eqNullSafe(C.js_typeof_vt(x["value"], x["vt"]))
                ),
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert not alert_bad


def test_variant_free_annotate_holds_no_variant(obs_df, kmap_df):
    """The streaming cache projection must be variant-free: with
    carry_variant=False, no VariantType survives anywhere in the sink columns
    (this is what keeps the per-batch cache plain and cheap to (de)serialize)."""
    slim = M.sink_projection(
        M.annotate(
            M.normalize(obs_df), kmap_df,
            typed=True, emit=True, misfit=True, alert=True, carry_variant=False,
        )
    )

    def has_variant(dt) -> bool:
        if isinstance(dt, T.VariantType):
            return True
        if isinstance(dt, T.StructType):
            return any(has_variant(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return has_variant(dt.elementType)
        if isinstance(dt, T.MapType):
            return has_variant(dt.keyType) or has_variant(dt.valueType)
        return False

    assert not any(has_variant(f.dataType) for f in slim.schema.fields)


def test_variant_free_sinks_match_default_path(obs_df, kmap_df, registry):
    """All sinks produce identical rows from the variant-free pre-rendered
    annotate (streaming's cached form — sinks read plain fields) and the
    default one (sinks derive from the carried variant values)."""
    full = M.annotate(M.normalize(obs_df), kmap_df)  # default: legacy sink path
    slim = M.sink_projection(
        M.annotate(
            M.normalize(obs_df), kmap_df,
            typed=True, emit=True, misfit=True, alert=True, carry_variant=False,
        )
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(M.dead_letter(full)) == rows(M.dead_letter(slim))
    assert rows(M.emit_messages(full)) == rows(M.emit_messages(slim))
    for entry in registry:
        f, props = entry["feature"], entry["properties"]
        assert rows(M.feature_rows(full, f, props)) == rows(
            M.feature_rows(slim, f, props)
        ), f


def test_alert_messages_match_between_paths(spark, obs_df, kmap_df):
    """Alert derivation (incl. the per-key coercion messages) is identical on
    the legacy variant-probing path and the pre-rendered _errs path, for both
    the steady-state and the empty-stale-registry (startup) branches."""
    from plenario_mapper_spark import metadata
    from plenario_mapper_spark.operators import alerts as AL

    full = M.annotate(M.normalize(obs_df), kmap_df)
    slim = M.sink_projection(
        M.annotate(
            M.normalize(obs_df), kmap_df,
            typed=True, emit=True, misfit=True, alert=True, carry_variant=False,
        )
    )
    empty = metadata.empty_kmap(spark)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for stale_frame_of in (lambda a: a, None):
        for a, b in [(full, slim)]:
            if stale_frame_of is None:
                # startup branch: stale side empty, derived from the fresh one
                ev_a, _ = AL.derive_alerts(a, a, AL.empty_blacklist(spark),
                                           stale_all_discrepant=True)
                ev_b, _ = AL.derive_alerts(b, b, AL.empty_blacklist(spark),
                                           stale_all_discrepant=True)
            else:
                ev_a, _ = AL.derive_alerts(a, a, AL.empty_blacklist(spark))
                ev_b, _ = AL.derive_alerts(b, b, AL.empty_blacklist(spark))
            assert rows(ev_a) == rows(ev_b)
    _ = empty  # the startup branch above models the empty registry state
