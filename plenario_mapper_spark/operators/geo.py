"""Geospatial operators: grid-cell blocking for radius joins and
spatio-temporal rollups.

The reference system (plenario-mapper) feeds the Plenario platform, whose
core query shapes are spatial: "observations within R of a sensor node" and
"counts per grid cell per time bucket". The driver tables carry no
coordinates, so the operators take coordinate COLUMNS as input and the
registered queries derive deterministic synthetic coordinates from row keys
(the same md5 idiom as operators/sampling — engine-independent, so the DuckDB
oracle reproduces every coordinate bit-for-bit). A production deployment maps
its real lat/lon into the same integer micro-degree domain.

Design for 100 TB:
- All coordinates are INTEGER micro-degrees (1e-6 deg). Cell assignment is
  integer division, distance is integer squared-euclidean (max |dx| <
  3.6e8 -> dx^2 < 1.3e17, the sum < 2.6e17, comfortably inside int64) — zero
  floating-point anywhere, so blocking and the final filter are exact and
  engine-independent.
- `grid_radius_join` is the classic cell-blocking join: the SMALL side
  (sensor nodes / centers — thousands, not billions) explodes to its 3x3
  neighbor cells and is BROADCAST; the big points side computes its cell in a
  narrow projection and never shuffles. Cell size == radius guarantees every
  true within-radius pair shares one of the 9 blocks (no recall loss); the
  exact integer distance filter removes false candidates.
- `grid_timeseries` is a single hash-aggregate over (cell_x, cell_y, bucket)
  — partial aggregation map-side, one shuffle, the standard scalable rollup.

Planar grid: the synthetic domain treats lon as non-wrapping (documented
limitation; a geodesic deployment adds the +/-180 modular neighbor cells to
the explode list — same plan shape, 3 extra rows on the broadcast side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Micro-degree domain sizes.
LON_DOMAIN_UDEG = 360_000_000
LAT_DOMAIN_UDEG = 180_000_000
_HASH_DOMAIN = 1 << 32


def _hash_u32(key: Column, salt: str) -> Column:
    """md5-backed uniform 32-bit integer (same contract as operators/sampling:
    engine-independent, NULL-safe via the '<null>' sentinel)."""
    canon = F.coalesce(key.cast("string"), F.lit("<null>"))
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), canon)), 1, 8), 16, 10
    ).cast("long")


def derive_coords_udeg(
    df: DataFrame, key_col: str, salt: str = "geo", prefix: str = ""
) -> DataFrame:
    """Deterministic synthetic coordinates in integer micro-degrees:
    x in [0, 360e6) (lon-like), y in [0, 180e6) (lat-like), each a pure
    function of md5(salt|axis|key). `(h * DOMAIN) >> 32` keeps everything in
    exact int64 (h < 2^32, so the product < 1.6e18). DuckDB mirror:
    `(CAST(('0x' || substr(md5('geo|x|' || CAST(k AS VARCHAR)), 1, 8)) AS
    BIGINT) * 360000000) >> 32`."""
    hx = _hash_u32(F.col(key_col), f"{salt}|x")
    hy = _hash_u32(F.col(key_col), f"{salt}|y")
    return df.withColumns(
        {
            f"{prefix}x_u": F.shiftrightunsigned(hx * F.lit(LON_DOMAIN_UDEG), 32),
            f"{prefix}y_u": F.shiftrightunsigned(hy * F.lit(LAT_DOMAIN_UDEG), 32),
        }
    )


def with_cell(df: DataFrame, cell_udeg: int, x="x_u", y="y_u") -> DataFrame:
    """Integer grid-cell assignment (floor division; coordinates are
    non-negative by domain construction, so `div` == floor)."""
    return df.withColumns(
        {
            "cell_x": F.expr(f"{x} div {cell_udeg}"),
            "cell_y": F.expr(f"{y} div {cell_udeg}"),
        }
    )


def grid_radius_join(
    points: DataFrame,
    centers: DataFrame,
    radius_udeg: int,
    point_cols: tuple[str, str] = ("x_u", "y_u"),
    center_cols: tuple[str, str] = ("cx_u", "cy_u"),
) -> DataFrame:
    """All (point, center) pairs with squared-euclidean distance <=
    radius_udeg^2, via 3x3 cell blocking.

    The centers side (small) explodes to its 9 neighbor cells and is
    broadcast; the points side adds one narrow cell projection. With cell
    size == radius, any pair within the radius differs by < 1 cell per axis,
    so the candidate set has perfect recall; the integer distance predicate
    then gives perfect precision. Returns the input columns of both sides
    plus `dist_sq` (exact BIGINT).

    At 100 TB: zero shuffle of the points side (broadcast hash join over a
    narrow projection); the only data movement is the 9x-exploded center
    table, KB-scale for realistic sensor-network sizes.
    """
    px, py = point_cols
    cx, cy = center_cols
    p = with_cell(points, radius_udeg, x=px, y=py)
    offsets = F.array([F.lit(d) for d in (-1, 0, 1)])
    c = (
        with_cell(centers, radius_udeg, x=cx, y=cy)
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .withColumns(
            {"cell_x": F.col("cell_x") + F.col("dx"), "cell_y": F.col("cell_y") + F.col("dy")}
        )
        .drop("dx", "dy")
    )
    joined = p.join(F.broadcast(c), ["cell_x", "cell_y"])
    dist_sq = (F.col(px) - F.col(cx)) * (F.col(px) - F.col(cx)) + (
        F.col(py) - F.col(cy)
    ) * (F.col(py) - F.col(cy))
    return (
        joined.withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= F.lit(radius_udeg * radius_udeg))
        .drop("cell_x", "cell_y")
    )


def grid_timeseries(
    points: DataFrame,
    cell_udeg: int,
    ts_col: str = "ts",
    bucket: str = "day",
    value_col: str | None = None,
) -> DataFrame:
    """Observation counts (and optional value sum) per (cell_x, cell_y,
    time-bucket) — the Plenario explorer's heatmap query. One narrow
    projection + one hash aggregate; partial aggregation runs map-side, so
    the shuffle carries only the (cells x buckets) key space."""
    g = with_cell(points, cell_udeg).withColumn(
        "bucket_start", F.date_trunc(bucket, F.col(ts_col))
    )
    aggs = [F.count("*").alias("n_obs")]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value")
        )
    return g.groupBy("cell_x", "cell_y", "bucket_start").agg(*aggs)
