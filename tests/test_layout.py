"""Z-order layout: Morton-key correctness and measured row-group skipping."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from plenario_mapper_spark.operators import layout as LY


def test_interleave_bits_known_values(spark):
    """Hand-checked Morton codes: bit b of col j lands at b*n + j."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 0), (2, 3)], "x long, y long"
    )
    out = df.select(
        "x", "y", LY.interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    )
    got = {(r["x"], r["y"]): r["z"] for r in out.collect()}
    # z = sum over bits: x_b -> 2b, y_b -> 2b+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(3, 0)] == 0b0101      # x bits at lanes 0 and 2
    assert got[(2, 3)] == 0b1110      # x=10 -> lane2; y=11 -> lanes 1,3


def test_interleave_guards(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        LY.interleave_bits([], 4)
    with _pytest.raises(ValueError):
        LY.interleave_bits([F.col("x"), F.col("y")], 32)  # 64 > 62


def _rowgroup_overlap_fraction(path, x_range, y_range):
    """Fraction of row groups whose (x, y) min/max stats overlap the box —
    exactly the pruning decision a parquet reader makes."""
    total = hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx = g.column(cols["x"]).statistics
            sy = g.column(cols["y"]).statistics
            total += 1
            if (
                sx.min <= x_range[1] and sx.max >= x_range[0]
                and sy.min <= y_range[1] and sy.max >= y_range[0]
            ):
                hit += 1
    assert total > 0
    return hit / total


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The measured claim: after z-ordering on (x, y), a small box predicate
    on EITHER/both dimensions overlaps far fewer row groups than the
    unsorted layout, and fewer than a single-column sort can offer for the
    other column."""
    n = 1 << 16
    df = (
        spark.range(n)
        .select(
            # pseudo-random uniform grid, deterministic
            (F.xxhash64(F.col("id")) % 256).alias("x"),
            (F.xxhash64(F.col("id") + 7919) % 256).alias("y"),
        )
        .select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    )
    # 8 files per layout; stats prune at file granularity here (each file is a
    # single row group at this size), row-group granularity in general
    raw = str(tmp_path / "raw")
    df.repartition(8).write.parquet(raw)
    zed = str(tmp_path / "zed")
    LY.zorder_write(df, zed, ("x", "y"), bits=8, num_files=8)
    box = ((10, 40), (200, 230))  # ~1.4% of the (x, y) domain
    frac_raw = _rowgroup_overlap_fraction(raw, *box)
    frac_z = _rowgroup_overlap_fraction(zed, *box)
    # unsorted: every row group spans the whole domain -> ~all overlap
    assert frac_raw > 0.9
    assert frac_z < 0.5 * frac_raw, (frac_raw, frac_z)
    # rows survive the rewrite intact
    a = spark.read.parquet(raw).groupBy().agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
    b = spark.read.parquet(zed).groupBy().agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
    assert a == b
