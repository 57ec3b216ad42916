"""Z-order layout (functions/zorder.py): code correctness against a
pure-Python Morton reference, file-level stats separability (the
mechanism data skipping relies on), and equality with the unclustered
result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from remote_shuffle_spark.functions.zorder import z_value, z_value_sql, write_zordered
from remote_shuffle_spark.sources.tables import load_table


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    x %= 1 << bits
    y %= 1 << bits
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (65535, 65535),
           (65536, 2), (12345, 54321), (99999, 7)]  # incl. >2^16 masking
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", z_value(F.col("x"), F.col("y"), bits=16)
    )
    got = {(r.x, r.y): r.z for r in df.collect()}
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_z_value_sql_is_same_formula(spark):
    """The oracle-side SQL emitter must agree with the Column tree —
    evaluated here by Spark itself via expr()."""
    df = spark.range(500).select(
        F.col("id").alias("x"), F.pmod(F.xxhash64("id"), F.lit(70000)).alias("y")
    )
    sql = z_value_sql("x", "y", bits=16)
    mism = df.withColumn("a", z_value(F.col("x"), F.col("y"), bits=16)).withColumn(
        "b", F.expr(sql)
    ).filter("a != b").count()
    assert mism == 0


def test_zordered_files_are_stats_separable(spark, sf_smoke, tmp_path):
    """After z-clustering, each file's (x, y) min-max box must be tight
    enough that a small 2-D box query's stats-intersecting file set is a
    strict minority — the property file/row-group skipping prunes by —
    and reading only those files must still give the full answer."""
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.pmod("event_id", F.lit(1024)).alias("bucket")
    )
    out = str(tmp_path / "zev")
    write_zordered(ev, out, "user_id", "bucket", bits=16, num_files=16)
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) >= 8
    lo_u, hi_u, lo_b, hi_b = 3, 7, 100, 300
    touching = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        umin = bmin = 1 << 62
        umax = bmax = -1
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "user_id":
                    umin, umax = min(umin, st.min), max(umax, st.max)
                elif name == "bucket":
                    bmin, bmax = min(bmin, st.min), max(bmax, st.max)
        if umin <= hi_u and umax >= lo_u and bmin <= hi_b and bmax >= lo_b:
            touching.append(f)
    assert len(touching) < len(files) / 2, (len(touching), len(files))
    # pruned read completeness: the touching files alone hold every match
    full = (
        spark.read.parquet(out)
        .filter(f"user_id between {lo_u} and {hi_u} and bucket between {lo_b} and {hi_b}")
        .count()
    )
    pruned = (
        spark.read.parquet(*touching)
        .filter(f"user_id between {lo_u} and {hi_u} and bucket between {lo_b} and {hi_b}")
        .count()
    )
    base = ev.filter(
        f"user_id between {lo_u} and {hi_u} and bucket between {lo_b} and {hi_b}"
    ).count()
    assert full == pruned == base > 0
