"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet file skipping works off per-file/rowgroup min-max statistics,
which a single-column sort makes selective on ONE column only: a 100 TB
table sorted by user_id answers user_id point queries by reading a few
files, but a value-range filter still scans everything.  Interleaving
the bits of several bucketed dimensions into one Morton key and
range-sorting by it gives every file a TIGHT bounding box in all
clustered dimensions at once — the standard Z-ORDER layout optimization
(Delta/Iceberg expose the same idea as a table service; here it is a
plain DataFrame transform + writer usable on vanilla parquet).

Everything is whole-stage-codegen JVM expressions: per-dimension
fixed-width bucketing (explicit bounds, or measured once via
approxQuantile — a driver-side cut list, never a per-row Python call),
then bit interleaving as ``bits x dims`` shift/mask/OR terms.  The only
shuffle is the range partition that the clustered write needs anyway.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ZDim", "zorder_key", "cluster_by_zorder", "write_zordered"]


@dataclass(frozen=True)
class ZDim:
    """One clustered dimension: column + value bounds for bucketing.

    ``lo``/``hi`` may be None to have :func:`cluster_by_zorder` measure
    robust bounds (0.1%/99.9% approxQuantile) in one cheap driver-side
    job.  Values outside the bounds clamp into the edge buckets — an
    outlier degrades ITS OWN file's bounding box, never the layout.
    """

    col: str
    lo: float | None = None
    hi: float | None = None


def _bucket(col: Column, lo: float, hi: float, n: int) -> Column:
    """Fixed-width bucket id in [0, n): floor((v-lo)/(hi-lo)*n), clamped.

    Plain floor arithmetic (not width_bucket) so a SQL oracle can
    reproduce the exact integer result with the same IEEE operations.
    NULL buckets to 0: NULLs cluster together at the low edge, which
    keeps them out of every other file's bounding box.
    """
    if not hi > lo:
        return F.lit(0)
    scaled = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * n)
    return F.coalesce(
        F.least(F.lit(n - 1), F.greatest(F.lit(0), scaled.cast("int"))), F.lit(0)
    )


def zorder_key(dims: list[tuple[Column, float, float]], *, bits: int = 16) -> Column:
    """Morton interleave of the dims' bucket ids as one bigint Column.

    ``bits`` per dimension; ``bits * len(dims)`` must fit a long.  Term
    count is bits x dims literal shift/mask expressions — 16 x 2 = 32
    terms, all codegen'd (constant shifts, so no expression-tree blowup;
    contrast the IVF centroid-literal trap, where the tree grew with
    DATA-derived K).
    """
    ndims = len(dims)
    if ndims < 1:
        raise ValueError("zorder_key needs at least one dimension")
    if bits * ndims > 62:
        raise ValueError(f"bits={bits} x {ndims} dims exceeds a long")
    n = 1 << bits
    buckets = [_bucket(c, lo, hi, n) for c, lo, hi in dims]
    terms = []
    for b in range(bits):
        for d, bk in enumerate(buckets):
            # bit b of dim d lands at interleaved position b*ndims + d
            terms.append(
                F.shiftleft(
                    F.shiftright(bk.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * ndims + d,
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def cluster_by_zorder(
    df: DataFrame,
    dims: list[ZDim],
    *,
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "__zorder",
    keep_key: bool = False,
) -> DataFrame:
    """Return ``df`` re-laid-out in Z-order (ready to write).

    Missing bounds are measured with one approxQuantile pass (0.1%/99.9%
    — robust to outliers; the cut list is per-COLUMN driver state, a few
    doubles).  The layout move is ``repartitionByRange +
    sortWithinPartitions`` on the Morton key: each output partition (→
    parquet file) covers a contiguous z-range, i.e. a small bounding box
    in every clustered dimension.
    """
    need = [d.col for d in dims if d.lo is None or d.hi is None]
    measured: dict[str, tuple[float, float]] = {}
    if need:
        qs = df.approxQuantile(need, [0.001, 0.999], 0.001)
        measured = {c: (q[0], q[1]) for c, q in zip(need, qs)}
    resolved = [
        (F.col(d.col), *(measured[d.col] if d.lo is None or d.hi is None else (d.lo, d.hi)))
        for d in dims
    ]
    keyed = df.withColumn(key_col, zorder_key(resolved, bits=bits))
    parted = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions
        else keyed.repartitionByRange(key_col)
    )
    out = parted.sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[ZDim],
    *,
    bits: int = 16,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Z-order-clustered parquet at ``path``."""
    cluster_by_zorder(df, dims, bits=bits, num_partitions=num_partitions).write.mode(
        mode
    ).parquet(path)
