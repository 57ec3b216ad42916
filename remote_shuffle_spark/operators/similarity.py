"""Similarity search over embedding columns (EXT — SURVEY §2.3).

Two paths, same contract (return the top-k neighbors of a query vector):

- :func:`brute_force_topk` — exact cosine against every row; one narrow
  pass + TakeOrdered.  The correctness baseline, and still the right
  choice when the query set is small and the scan is already happening.
- :func:`ivf_topk` — inverted-file approximate search: vectors are
  assigned to their nearest of K centroids once (narrow after a broadcast
  of K centroids), the query probes only ``nprobe`` nearest cells.  At
  100 TB the assignment is written as a bucketed/partitioned table so a
  query touches K/nprobe-th of the data.

All vector math is JVM-side higher-order expressions (functions.vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remote_shuffle_spark.functions.vectors import cosine_similarity, to_double_array


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to the (single-row) query vector.

    ``query_df`` must have one row with column ``vec_col``; it is
    broadcast, so the big side never shuffles — the plan is
    scan → broadcast nested loop (1 row) → project cosine → TakeOrdered(k).
    Ordering ties are broken by id for determinism.
    """
    q = F.broadcast(query_df.select(to_double_array(vec_col).alias("_qvec")))
    cos = cosine_similarity(to_double_array(vec_col), F.col("_qvec"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        df.crossJoin(q)
        .select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def assign_ivf_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids_df: DataFrame,
    *,
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cvec",
    _collected_centroids: list | None = None,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF build step).

    Centroids are driver-collected (K rows — tiny by construction) and
    inlined as literals, so the argmax is computed per row as an
    expression (array of (sim, cid) structs → array_max) and the build is
    a single narrow pass over the corpus.  Returns df + ``cell`` column;
    at scale, persist this partitioned by ``cell``.
    """
    cents = (
        _collected_centroids
        if _collected_centroids is not None
        else [
            (r[centroid_id_col], r[centroid_vec_col])
            for r in centroids_df.select(centroid_id_col, centroid_vec_col).collect()
        ]
    )
    v = to_double_array(vec_col)
    scored = F.array(
        *[
            F.struct(
                cosine_similarity(v, F.array(*[F.lit(float(x)) for x in cvec])).alias("s"),
                F.lit(int(cid)).alias("c"),
            )
            for cid, cvec in cents
        ]
    )
    return df.withColumn("cell", F.array_max(scored)["c"])


def seed_centroids(df: DataFrame, id_col: str, vec_col: str, *, k: int) -> DataFrame:
    """Deterministic centroid seeds: the k smallest ids (k-means init
    stand-in; a real pipeline would run k-means|| — pyspark.ml KMeans —
    but the IVF mechanics are identical)."""
    return (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.monotonically_increasing_id().cast("int").alias("cid"),
            to_double_array(vec_col).alias("cvec"),
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 4,
    round_to: int | None = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` cells nearest the query.

    Recall < 1 by design; with nprobe == num_cells this degrades to exact.
    The pruning predicate is ``cell IN (probed)`` — on a cell-partitioned
    table that is partition pruning, i.e. the scan itself shrinks.
    ``centroids`` (cid, cvec) overrides the deterministic seeds — plug in
    operators.clustering.kmeans_centroids for trained cells.
    """
    cents = centroids if centroids is not None else seed_centroids(df, id_col, vec_col, k=num_cells)
    # ONE driver collect of the (tiny, K-row) centroid table serves both
    # the per-row assignment expression and the query-side cell ranking —
    # ranking nprobe cells against one query vector is driver-side math,
    # not a Spark job, so the whole probe is two jobs (query collect +
    # pruned scan) instead of four
    cent_rows = [
        (int(r["cid"]), list(r["cvec"])) for r in cents.select("cid", "cvec").collect()
    ]
    assigned = assign_ivf_cells(
        df, id_col, vec_col, cents, _collected_centroids=cent_rows
    )
    q = query_df.select(to_double_array(vec_col).alias("qv")).collect()[0]["qv"]
    qcol = F.array(*[F.lit(float(x)) for x in q])

    import math

    def _cos(a: list, b: list) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    ranked = sorted(cent_rows, key=lambda c: (-_cos(c[1], list(q)), c[0]))
    probed = [cid for cid, _ in ranked[:nprobe]]
    pruned = assigned.filter(F.col("cell").isin(probed))
    cos = cosine_similarity(to_double_array(vec_col), qcol)
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        pruned.select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
