"""Z-order clustering: correctness of the transform + the actual
file-skipping payoff, measured against real parquet footer statistics.

The point of the layout is that per-file min-max stats become selective
in EVERY clustered dimension; the key test writes the same data x-sorted
and z-ordered and counts which files a range predicate could prune,
straight from the parquet metadata Spark's scan uses.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.plans.zorder import ZDim, cluster_by_zorder, write_zordered


def _file_bounds(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-parquet-file min/max for ``cols`` from footer statistics."""
    import glob
    import os

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                name = c.path_in_schema
                if name in cols and c.statistics is not None:
                    s = c.statistics
                    lo[name] = s.min if name not in lo else min(lo[name], s.min)
                    hi[name] = s.max if name not in hi else max(hi[name], s.max)
        if lo:
            out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _files_overlapping(bounds, col, q_lo, q_hi) -> int:
    return sum(1 for b in bounds if not (b[col][1] < q_lo or b[col][0] > q_hi))


@pytest.fixture(scope="module")
def grid_df(spark):
    # two genuinely independent dimensions (a full 200x200 grid) — the
    # worst case for single-column sort.  (id*K % 200 would NOT be
    # independent of id % 200: it's a permutation of it.)
    return spark.range(0, 40_000).select(
        F.col("id"),
        (F.col("id") % 200).cast("double").alias("x"),
        ((F.col("id") / 200).cast("long") % 200).cast("double").alias("y"),
    )


def test_roundtrip_preserves_rows(spark, grid_df, tmp_path):
    out = str(tmp_path / "z")
    write_zordered(grid_df, out, [ZDim("x", 0, 200), ZDim("y", 0, 200)], bits=8)
    back = spark.read.parquet(out)
    assert back.count() == grid_df.count()
    assert back.agg(F.sum("id")).collect()[0][0] == grid_df.agg(F.sum("id")).collect()[0][0]
    assert set(back.columns) == set(grid_df.columns)  # key col dropped


def test_zorder_skips_files_in_both_dims(spark, grid_df, tmp_path):
    nfiles = 16
    x_path = str(tmp_path / "xsort")
    z_path = str(tmp_path / "zsort")
    grid_df.repartitionByRange(nfiles, "x").sortWithinPartitions("x").write.parquet(x_path)
    write_zordered(
        grid_df,
        z_path,
        [ZDim("x", 0, 200), ZDim("y", 0, 200)],
        bits=8,
        num_partitions=nfiles,
    )
    xb = _file_bounds(x_path, ["x", "y"])
    zb = _file_bounds(z_path, ["x", "y"])
    assert len(xb) >= nfiles // 2 and len(zb) >= nfiles // 2

    # a 10%-wide y-range: the x-sorted layout cannot prune (every file
    # spans all of y); the z-ordered layout must prune at least half
    y_all = _files_overlapping(xb, "y", 40.0, 60.0)
    y_z = _files_overlapping(zb, "y", 40.0, 60.0)
    assert y_all == len(xb)
    assert y_z <= len(zb) // 2

    # and the z layout still prunes on x too (a box query touches few files)
    x_z = _files_overlapping(zb, "x", 40.0, 60.0)
    assert x_z <= len(zb) // 2


def test_measured_bounds_mode(spark, grid_df):
    # no explicit bounds: approxQuantile path; result must still be a
    # valid permutation of the input
    out = cluster_by_zorder(grid_df, [ZDim("x"), ZDim("y")], bits=6, keep_key=True)
    assert out.count() == grid_df.count()
    assert out.filter(F.col("__zorder").isNull()).count() == 0


def test_null_values_cluster_low(spark):
    df = spark.range(0, 100).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 50).cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    out = cluster_by_zorder(df, [ZDim("x", 0, 50), ZDim("y", 0, 7)], keep_key=True)
    nulls = out.filter(F.col("x").isNull())
    # NULL x buckets to 0: its interleaved x-bits contribute nothing above
    # the y bits, so the key equals the key of x=0 rows with the same y
    assert nulls.count() == 10
    assert out.count() == 100


def test_zorder_key_matches_python_morton_on_integer_dims(spark):
    """With power-of-two bounds on integer dims the bucket id equals the
    value (IEEE-exact (v-0)/2^16*2^16), so zorder_key reduces to a pure
    Morton interleave — pinned against a Python reference, including
    clamping above the bound."""
    from remote_shuffle_spark.plans.zorder import zorder_key

    def morton(x: int, y: int, bits: int = 16) -> int:
        x, y = min(x, (1 << bits) - 1), min(y, (1 << bits) - 1)  # clamp
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (65535, 65535),
           (70000, 2), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z",
        zorder_key([(F.col("x"), 0.0, 65536.0), (F.col("y"), 0.0, 65536.0)], bits=16),
    )
    got = {(r.x, r.y): r.z for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == morton(x, y), (x, y)


def test_zorder_oracle_sql_equals_column_tree(spark):
    """The DuckDB-side emitter (_zorder_oracle) must compute the same
    codes as the Column tree — evaluated by Spark itself via expr(),
    over both integer and fractional inputs."""
    from remote_shuffle_spark.ext_queries import _zorder_oracle
    from remote_shuffle_spark.plans.zorder import zorder_key

    df = spark.range(2000).select(
        (F.col("id") % 300).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 3.0).alias("y"),
    )
    dims_col = [(F.col("x"), 0.0, 300.0), (F.col("y"), 0.0, 334.0)]
    dims_sql = [("x", 0.0, 300.0), ("y", 0.0, 334.0)]
    mism = (
        df.withColumn("a", zorder_key(dims_col, bits=8))
        .withColumn("b", F.expr(_zorder_oracle(8, dims_sql)))
        .filter("a != b")
        .count()
    )
    assert mism == 0
