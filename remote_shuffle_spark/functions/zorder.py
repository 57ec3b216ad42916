"""Z-order (Morton) multi-dimensional clustering — data-skipping layout
for 100 TB scans.

A single-column sort gives parquet row-group/file min-max stats that
prune ONE predicate dimension; queries filtering two dimensions (user ×
time, tenant × day) scan everything for the second.  Interleaving the
bits of both keys into one Morton code and range-partitioning + sorting
by it makes file/row-group stats tight in BOTH dimensions at once — a
2-D box query then touches only the files whose z-interval intersects
the box (the Delta/Iceberg `ZORDER BY` layout, public technique;
Morton 1966).

Everything here is a pure JVM expression tree (shifts/masks — no UDF),
and the SAME bit formula is emitted as SQL by :func:`z_value_sql` so a
DuckDB oracle can recompute codes exactly.

Scale notes: the layout write is one range-exchange + local sort (same
cost as any global sort); skipping benefits then repeat on every read.
Keys must be non-negative and fit in ``bits`` bits — the helpers
pre-mask (`pmod`) so callers can pass raw ids; widening ``bits`` trades
code length for resolution (16+16 → one BIGINT code).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints (x even bits, y odd) —
    a pure expression tree: 2·bits shift/mask/or terms, whole-stage
    codegen friendly, no Python in the path."""
    xm = F.pmod(x.cast("long"), F.lit(1 << bits))
    ym = F.pmod(y.cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(x_expr: str, y_expr: str, *, bits: int = 16) -> str:
    """The identical Morton formula as portable SQL (DuckDB oracle
    side): same pre-mask, same bit placement, integer ops only."""
    m = 1 << bits
    xs = f"(({x_expr}) % {m})"
    ys = f"(({y_expr}) % {m})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Materialize ``df`` z-clustered on (x_col, y_col): range-partition
    by the Morton code into ``num_files`` DISJOINT z-intervals, sort
    within each, write parquet.  Every file's (x, y) min-max stats are
    then tight boxes, so both file-level skipping (planner) and
    row-group skipping (parquet pushdown) prune 2-D predicates."""
    z = z_value(F.col(x_col), F.col(y_col), bits=bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
