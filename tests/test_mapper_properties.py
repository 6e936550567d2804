"""Property-based tests of the mapper split invariants (hypothesis).

The reference has no randomized tests (SURVEY §5); these pin the structural
contract of annotate() for ARBITRARY observations — any JSON scalar payload,
known and unknown sensors, mixed-case keys:

  I1  clean_data ∪ misfit_data == data (keys partition exactly; no loss, no dup)
  I2  invalid_keys ∩ error_keys == ∅ and bad_keys == invalid ∪ error
  I3  unknown sensor ⇒ every key invalid (app/mapper.js:78-84 routes the whole
      record to dead-letter)
  I4  features == distinct registry features of the clean keys
  I5  dead_letter emits exactly the rows with bad keys; emit_messages exactly
      one row per (record, feature)

Each hypothesis example generates a BATCH of observations and runs ONE Spark
job asserting violation counts are zero — per-example JVM round trips would
make example counts uneconomical.
"""

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import mapper as M

KNOWN_SENSORS = ["htu21d", "HMC5883L", "camera"]
KNOWN_KEYS = [
    "Temp", "temperature", "Humidity", "x", "Y", "z",
    "standing_water", "cloud_type", "traffic_density", "num_pedestrians",
]

json_scalar = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.text(alphabet="abcXY019. -px", max_size=8),
)

obs_strategy = st.fixed_dictionaries(
    {
        "sensor": st.one_of(
            st.sampled_from(KNOWN_SENSORS), st.text(alphabet="abcz19", min_size=1, max_size=6)
        ),
        "data": st.dictionaries(
            st.one_of(st.sampled_from(KNOWN_KEYS), st.text(alphabet="abkXz_1", min_size=1, max_size=6)),
            json_scalar,
            min_size=1,
            max_size=6,
        ),
    }
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(batch=st.lists(obs_strategy, min_size=1, max_size=12))
def test_split_invariants(spark, kmap_df, batch):
    rows = [
        (i, "n1", 1.0, "2017-01-01T00:00:00", o["sensor"], "net", json.dumps(o["data"]))
        for i, o in enumerate(batch)
    ]
    obs = spark.createDataFrame(
        rows,
        "seq int, node_id string, meta_id double, datetime string, sensor string, "
        "network string, data string",
    )
    ann = M.annotate(M.normalize(obs), kmap_df)

    checks = ann.select(
        # I1: key partition — clean ∪ misfit == data keys, disjoint by size
        (
            F.size("data")
            == F.size("clean_data") + F.size("misfit_data")
        ).alias("i1_sizes"),
        (
            F.size(
                F.array_except(
                    F.map_keys("data"),
                    F.concat(F.map_keys("clean_data"), F.map_keys("misfit_data")),
                )
            )
            == 0
        ).alias("i1_cover"),
        # I2: invalid/error disjoint and bad = union
        (
            F.size(F.array_intersect("invalid_keys", "error_keys")) == 0
        ).alias("i2_disjoint"),
        (
            F.size(F.array_except("bad_keys", F.concat("invalid_keys", "error_keys")))
            == 0
        ).alias("i2_union"),
        # I3: unknown sensor => all keys invalid
        (
            F.col("kmap").isNotNull()
            | (F.size("invalid_keys") == F.size("data"))
        ).alias("i3_unknown"),
        # I4: features derived from clean entries only
        (
            F.size(
                F.array_except(
                    F.col("features"),
                    F.array_distinct(
                        F.transform(
                            F.filter(
                                F.col("_ann"), lambda x: ~(x["unknown"] | x["err"])
                            ),
                            lambda x: x["info"]["feature"],
                        )
                    ),
                )
            )
            == 0
        ).alias("i4_features"),
    )
    agg = checks.agg(
        *[
            F.sum(F.when(F.col(c), 0).otherwise(1)).alias(c)
            for c in checks.columns
        ]
    ).collect()[0]
    assert all(v == 0 for v in agg.asDict().values()), agg.asDict()

    # I5: dead-letter rows == rows with bad keys; emits == sum(|features|)
    n_bad = ann.filter(F.size("bad_keys") > 0).count()
    assert M.dead_letter(ann).count() == n_bad
    n_emits = ann.filter(F.size("clean_data") > 0).agg(
        F.sum(F.size("features"))
    ).collect()[0][0]
    assert M.emit_messages(ann).count() == (n_emits or 0)
