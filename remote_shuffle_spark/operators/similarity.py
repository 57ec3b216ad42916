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
- :func:`lsh_topk` — random-hyperplane LSH buckets, no training step:
  sign-bit signatures are pure expressions, the query probes buckets
  within a Hamming radius of its own.  The right scale path when a
  k-means build pass is not worth it (write-once corpora, ad-hoc probes).

All vector math is JVM-side higher-order expressions (functions.vectors).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
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


# K at or below this uses the pure-expression argmax (no Python workers to
# spin up — right for tiny frames/tests); above it an Arrow-batched pandas
# UDF over a broadcast numpy centroid matrix does one matmul per batch.
# The crossover is LOW: higher-order array lambdas evaluate interpreted
# (not codegen'd), so the expr argmax measured 10x slower than the Arrow
# matmul already at K=16 × 2000 rows × dim 64 — and the literal plan also
# blows past JVM codegen limits for K in the thousands (docs/scale.md
# prescribes K ≈ √corpus-rows).
_EXPR_MAX_CENTROIDS = 8


def assign_ivf_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids_df: DataFrame,
    *,
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cvec",
    method: str = "auto",
    round_to: int | None = None,
    _collected_centroids: list | None = None,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF build step).

    Both paths are NARROW (no shuffle) single passes over the corpus;
    returns df + ``cell`` column (at scale, persist partitioned by cell):

    - ``method="expr"`` — centroids inlined as literals, per-row argmax as
      an ``array_max`` over (sim, cid) structs.  Fully codegen'd, but the
      plan is O(K·dim) literals: right for small K only.
    - ``method="pandas"`` — centroids broadcast once as a unit-normalized
      numpy matrix; an iterator pandas UDF computes each Arrow batch's
      argmax with one (batch × K) matmul.  This is the 100 TB path for
      K ≈ √corpus-rows (thousands+), where the literal plan can't compile.
    - ``method="auto"`` (default) — expr for K ≤ _EXPR_MAX_CENTROIDS (8,
      the measured crossover), pandas above.

    Tie-break in both paths: equal similarity → larger cid wins (the
    struct-max ordering of the expr form, emulated in the pandas form by
    ordering centroid columns by cid descending before argmax).
    ``round_to`` rounds each similarity before the argmax so the
    assignment is reproducible by an external engine computing cosine
    with a different accumulation order (semantic_dedup's oracle).
    """
    cents = (
        _collected_centroids
        if _collected_centroids is not None
        else [
            (r[centroid_id_col], r[centroid_vec_col])
            for r in centroids_df.select(centroid_id_col, centroid_vec_col).collect()
        ]
    )
    if method == "auto":
        method = "expr" if len(cents) <= _EXPR_MAX_CENTROIDS else "pandas"

    if method == "expr":
        v = to_double_array(vec_col)

        def _sim(cvec):
            s = cosine_similarity(v, F.array(*[F.lit(float(x)) for x in cvec]))
            return F.round(s, round_to) if round_to is not None else s

        scored = F.array(
            *[
                F.struct(_sim(cvec).alias("s"), F.lit(int(cid)).alias("c"))
                for cid, cvec in cents
            ]
        )
        return df.withColumn("cell", F.array_max(scored)["c"])

    if method != "pandas":
        raise ValueError(f"unknown method {method!r}; use 'auto', 'expr', or 'pandas'")

    # cid-DESCENDING column order: np.argmax returns the FIRST max, so on
    # exact similarity ties the largest cid wins — same as the expr form.
    order = sorted(((int(c), list(v)) for c, v in cents), key=lambda cv: -cv[0])
    cids = np.array([c for c, _ in order], dtype=np.int64)
    mat = np.array([v for _, v in order], dtype=np.float64)  # K × dim
    cnorm = np.linalg.norm(mat, axis=1)
    matn = mat / np.where(cnorm > 0.0, cnorm, 1.0)[:, None]
    matn[cnorm == 0.0] = 0.0  # zero centroid → cosine 0 (guard parity)
    bc = df.sparkSession.sparkContext.broadcast((cids, matn))

    @F.pandas_udf("int")
    def _cell(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cids_, matn_ = bc.value
        for s in batches:
            if len(s) == 0:
                yield pd.Series([], dtype="int32")
                continue
            # single C-level conversion: a per-row np.asarray loop here
            # measured 13x slower and dominated the assignment pass at 2M
            # vectors (docs/scale.md 10x probe)
            V = np.array(s.tolist(), dtype=np.float64)
            vnorm = np.linalg.norm(V, axis=1)
            Vn = V / np.where(vnorm > 0.0, vnorm, 1.0)[:, None]
            Vn[vnorm == 0.0] = 0.0  # zero vector → all sims 0, max-cid cell
            sims = Vn @ matn_.T  # batch × K
            if round_to is not None:
                sims = np.round(sims, round_to)
            yield pd.Series(cids_[np.argmax(sims, axis=1)], dtype="int64").astype("int32")

    return df.withColumn("cell", _cell(to_double_array(vec_col)))


def seed_centroids(df: DataFrame, id_col: str, vec_col: str, *, k: int) -> DataFrame:
    """Deterministic centroid seeds: the k smallest ids (k-means init
    stand-in; a real pipeline would run k-means|| — pyspark.ml KMeans —
    but the IVF mechanics are identical).

    cid is ``row_number() over (order by id)`` — a plan-independent
    function of the data.  (An earlier version used
    monotonically_increasing_id() after orderBy().limit(k), which is
    stable only while the limit collapses to one partition — a plan
    change would silently renumber the cells.)"""
    w = W.orderBy(F.col(id_col))
    return (
        df.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(w) - F.lit(1)).cast("int").alias("cid"),
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
    assign_method: str = "auto",
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
        df, id_col, vec_col, cents, method=assign_method, _collected_centroids=cent_rows
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


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 10,
    dim: int,
    num_planes: int = 8,
    hamming_radius: int = 1,
    round_to: int | None = 6,
) -> DataFrame:
    """LSH-bucketed approximate top-k: probe only buckets within
    ``hamming_radius`` sign-bit flips of the query's bucket.

    The scale path next to :func:`ivf_topk` (no training step): every
    vector gets a ``num_planes``-bit random-hyperplane signature — a pure
    expression, no stored matrix (operators/dedup.py
    _hyperplane_sign_bit) — and the query joins only the probed buckets.
    The probe set (sum of C(planes, i) for i <= radius masks XOR'd onto
    the query bucket) is data-INDEPENDENT, enumerated driver-side, and
    broadcast: on a bucket-partitioned table the bucket equi-join is
    partition pruning, exactly like IVF's cell pruning.  Recall rises
    with the radius; ``hamming_radius=num_planes`` probes every bucket
    and degrades to exact search — the oracle hook (the whole pipeline
    signature → probe → join → cosine → top-k is then hash-verified
    against brute force, same pattern as ext_similarity_ivf).

    Returns (id_col, cos_sim), deterministic tie-break on id.
    """
    from itertools import combinations

    from remote_shuffle_spark.operators.dedup import _hyperplane_sign_bit

    if not 0 <= hamming_radius <= num_planes:
        raise ValueError(f"hamming_radius must be in [0, {num_planes}]")

    def bucket_of(vec: F.Column) -> F.Column:
        b = F.lit(0).cast("long")
        for p in range(num_planes):
            b = F.shiftleft(b, 1).bitwiseOR(
                _hyperplane_sign_bit(vec, p, dim).cast("long")
            )
        return b

    masks = [0] + [
        sum(1 << bit for bit in bits)
        for r in range(1, hamming_radius + 1)
        for bits in combinations(range(num_planes), r)
    ]
    q = query_df.select(
        to_double_array(vec_col).alias("_qvec"),
        bucket_of(to_double_array(vec_col)).alias("_qb"),
    )
    probes = q.select(
        "_qvec",
        F.explode(
            F.array(*[F.col("_qb").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("_bucket"),
    )
    # materialize the double-array ONCE before the 8 sign-bit lambdas —
    # HOF lambdas re-evaluate inlined subtrees per element (round-2
    # lesson, functions.hashing.word_shingles_from_tokens), so inlining
    # the cast into bucket_of costs 8 redundant conversions per row
    data = (
        df.select(F.col(id_col), to_double_array(vec_col).alias("_vec"))
        .select(F.col(id_col), "_vec", bucket_of(F.col("_vec")).alias("_bucket"))
    )
    cos = cosine_similarity(F.col("_vec"), F.col("_qvec"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        data.join(F.broadcast(probes), "_bucket")
        .select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries_df: DataFrame,
    query_id_col: str,
    *,
    k: int = 10,
    round_to: int | None = 6,
    num_subgroups: int = 64,
) -> DataFrame:
    """Batch exact k-NN join: EVERY query vector gets its ``k`` nearest
    corpus rows by cosine — the many-probe sibling of
    :func:`brute_force_topk` (training-data pipelines rarely probe one
    vector; they attach neighbors to a whole eval batch at once).

    Plan shape: the query batch is broadcast (bounded — a batch, not a
    second corpus), the corpus side stays NARROW through scoring
    (scan → broadcast nested loop → project cosine), and top-k is
    TWO-PHASE so no reducer ever sorts a corpus-sized slice: rows first
    shuffle on (query, subgroup = id-hash % ``num_subgroups``) for a
    per-subgroup window top-k — reducer work is corpus/num_subgroups —
    then the Q × num_subgroups × k survivors take a second, tiny window
    for the final per-query top-k.  A single-phase window on query alone
    would hand each of Q reducers the whole corpus (the classic top-k
    skew); with Q queries and 32 reducers that is the difference between
    minutes and a stuck stage at 100 TB.  For corpus sizes where even
    the scoring scan is too much per query batch, compose
    :func:`lsh_topk`/:func:`ivf_topk` per query instead (partition
    pruning replaces the scan; this operator is the exact baseline).

    Zero-norm vectors score 0.0 (the module's guard).  Similarities are
    rounded (``round_to``) BEFORE ranking and ties break on corpus id,
    so the selected ids are reproducible by an engine accumulating the
    dot product in a different order.  Returns (query_id, rank, id,
    cos_sim), rank 1..k.
    """
    q = F.broadcast(
        queries_df.select(
            F.col(query_id_col).alias("_qid"),
            to_double_array(vec_col).alias("_qvec"),
        )
    )
    cos = cosine_similarity(to_double_array(vec_col), F.col("_qvec"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = df.crossJoin(q).select(
        F.col("_qid"),
        F.col(id_col).alias("_id"),
        cos.alias("cos_sim"),
        F.pmod(F.xxhash64(id_col), F.lit(num_subgroups)).alias("_sub"),
    )
    w1 = W.partitionBy("_qid", "_sub").orderBy(F.col("cos_sim").desc(), F.col("_id"))
    survivors = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_sub")
    )
    w2 = W.partitionBy("_qid").orderBy(F.col("cos_sim").desc(), F.col("_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            "rank",
            F.col("_id").alias(id_col),
            "cos_sim",
        )
    )


def knn_join_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries_df: DataFrame,
    query_id_col: str,
    *,
    k: int = 10,
    dim: int,
    num_planes: int = 8,
    hamming_radius: int = 1,
    round_to: int | None = 6,
    num_subgroups: int = 64,
) -> DataFrame:
    """Batch LSH k-NN join — the SUBLINEAR path next to the exact
    :func:`knn_join`: many query vectors share ONE bucketed corpus scan
    instead of per-query probes.

    Plan shape: the corpus gets its ``num_planes``-bit hyperplane
    signature once (pure expression, no stored matrix); each query
    explodes into its probe-bucket set (bucket XOR the data-independent
    Hamming-radius masks, enumerated driver-side) and the bounded
    (query × probes) table is BROADCAST onto a bucket EQUI-join — so the
    corpus side is scored only on candidate rows (expected corpus ×
    probes / 2^planes), not crossJoined.  Each corpus row lives in
    exactly one bucket and a query's probe buckets are distinct, so no
    (query, row) pair is scored twice — no dedup stage needed.  Top-k is
    the same two-phase window as :func:`knn_join` (per-(query, id-hash
    subgroup), then the tiny final window): candidate sets can still be
    corpus-sized at full radius, and the skew-free shape costs nothing
    when they are small.

    ``hamming_radius=num_planes`` probes every bucket and degrades to
    the exact join — the oracle hook (ext_knn_join_lsh hash-verifies the
    whole signature → probe → join → two-phase-top-k pipeline against
    brute force); smaller radii trade recall for a corpus-sublinear
    scan, with recall@k pinned in tests/test_operators_similarity.py.

    Returns (query_id, rank, id_col, cos_sim), rank 1..k within the
    probed candidates.
    """
    from itertools import combinations

    from remote_shuffle_spark.operators.dedup import _hyperplane_sign_bit

    if not 0 <= hamming_radius <= num_planes:
        raise ValueError(f"hamming_radius must be in [0, {num_planes}]")

    def bucket_of(vec: F.Column) -> F.Column:
        b = F.lit(0).cast("long")
        for p in range(num_planes):
            b = F.shiftleft(b, 1).bitwiseOR(
                _hyperplane_sign_bit(vec, p, dim).cast("long")
            )
        return b

    masks = [0] + [
        sum(1 << bit for bit in bits)
        for r in range(1, hamming_radius + 1)
        for bits in combinations(range(num_planes), r)
    ]
    q = queries_df.select(
        F.col(query_id_col).alias("_qid"),
        to_double_array(vec_col).alias("_qvec"),
    ).select("_qid", "_qvec", bucket_of(F.col("_qvec")).alias("_qb"))
    # TWO broadcasts instead of one: the probe table carries only
    # (_qid, _bucket) — broadcasting the 64-double vector duplicated per
    # probe would inflate the broadcast by the probe factor (up to
    # 2^num_planes at full radius: 10k queries x 256 probes x 512 B
    # ≈ 1.3 GB); the vectors ship ONCE in a second Q-row broadcast
    # attached by _qid after the bucket join prunes candidates.
    probes = q.select(
        "_qid",
        F.explode(
            F.array(*[F.col("_qb").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("_bucket"),
    )
    qvecs = q.select("_qid", "_qvec")
    data = df.select(F.col(id_col), to_double_array(vec_col).alias("_vec")).select(
        F.col(id_col), "_vec", bucket_of(F.col("_vec")).alias("_bucket")
    )
    cos = cosine_similarity(F.col("_vec"), F.col("_qvec"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = data.join(F.broadcast(probes), "_bucket").join(
        F.broadcast(qvecs), "_qid"
    ).select(
        F.col("_qid"),
        F.col(id_col).alias("_id"),
        cos.alias("cos_sim"),
        F.pmod(F.xxhash64(id_col), F.lit(num_subgroups)).alias("_sub"),
    )
    w1 = W.partitionBy("_qid", "_sub").orderBy(F.col("cos_sim").desc(), F.col("_id"))
    survivors = (
        scored.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_sub")
    )
    w2 = W.partitionBy("_qid").orderBy(F.col("cos_sim").desc(), F.col("_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            "rank",
            F.col("_id").alias(id_col),
            "cos_sim",
        )
    )


def quantization_recall_at_k(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probes_df: DataFrame,
    probe_id_col: str,
    *,
    k: int = 10,
    coarse_scale: int = 127,
    fine_scale: int = 1 << 20,
    num_subgroups: int = 64,
) -> DataFrame:
    """Embedding-quantization quality evaluation: per probe, recall@k of
    the COARSE-quantized (int8-style, ``floor(v * coarse_scale)``) dot-
    product ranking against the FINE-quantized reference ranking
    (``fine_scale`` defaults to 2^20 — beyond float32 mantissa precision
    for unit-scale embeddings, i.e. the exact ranking).  This is the
    measurement that gates an int8 ANN index rollout in an embedding
    pipeline: how much ranking quality does 8-bit storage give up.

    Everything is INTEGER arithmetic end-to-end — both rankings order by
    exact integer dot products with id tie-breaks — so the result is
    bit-reproducible across engines regardless of float summation order
    (the reason the reference ranking is fine-QUANTIZED rather than raw
    float).  Returns (probe_id, hits, recall_at_k) per probe.

    Scale shape: probes broadcast; the corpus stays narrow through
    scoring; both top-ks use the same two-phase (probe, id-hash subgroup)
    window as :func:`knn_join`, so no reducer sorts a corpus-sized slice.
    A full-corpus evaluation pass is a diagnostic; at 100 TB run it over
    a sampled corpus slice (the measurement, a recall ratio, is stable
    under sampling).
    """
    q = F.broadcast(
        probes_df.select(
            F.col(probe_id_col).alias("_pid"),
            to_double_array(vec_col).alias("_pvec"),
        )
    )

    def _qdot(scale: int):
        return F.aggregate(
            F.zip_with(
                to_double_array(vec_col),
                F.col("_pvec"),
                lambda a, b: F.floor(a * scale).cast("long")
                * F.floor(b * scale).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = (
        df.crossJoin(q)
        .filter(F.col(id_col) != F.col("_pid"))
        .select(
            "_pid",
            F.col(id_col).alias("_id"),
            _qdot(coarse_scale).alias("_dc"),
            _qdot(fine_scale).alias("_df"),
            F.pmod(F.xxhash64(id_col), F.lit(num_subgroups)).alias("_sub"),
        )
    )

    def _topk(dot_col: str) -> DataFrame:
        w1 = W.partitionBy("_pid", "_sub").orderBy(F.col(dot_col).desc(), "_id")
        survivors = (
            scored.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        w2 = W.partitionBy("_pid").orderBy(F.col(dot_col).desc(), "_id")
        return (
            survivors.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k)
            .select("_pid", "_id")
        )

    hits = (
        _topk("_dc")
        .join(_topk("_df"), ["_pid", "_id"])
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        q.select("_pid")
        .join(hits, "_pid", "left")
        .select(
            F.col("_pid").alias("probe_id"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(k))
            .cast("double")
            .alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )


def pq_recall_at_k(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probes_df: DataFrame,
    probe_id_col: str,
    *,
    k: int = 10,
    dim: int = 64,
    num_subspaces: int = 8,
    num_centroids: int = 16,
    scale: int = 127,
    num_subgroups: int = 64,
) -> DataFrame:
    """Product-quantization ANN evaluation: per probe, recall@k of the
    PQ/ADC ranking against the exact (quantized-integer) L2 ranking —
    the compression rung of the similarity family (IVF prunes WHICH
    vectors to score; PQ compresses HOW each vector is stored:
    ``num_subspaces`` one-byte codes per vector instead of ``dim``
    floats, a 32x storage cut at these defaults).

    Mechanics (all INTEGER arithmetic, so rankings are bit-reproducible
    across engines — the same discipline as
    :func:`quantization_recall_at_k`):
      1. vectors are quantized to ints (``floor(v*scale)``) and split
         into ``num_subspaces`` contiguous subvectors;
      2. the codebook is the first ``num_centroids`` corpus vectors'
         subvectors (a deterministic stand-in for the k-means-trained
         codebooks of real PQ — the ENCODE/LUT/ADC machinery this
         operator exercises is identical either way, and determinism is
         what makes the result oracle-checkable);
      3. encode: each corpus subvector gets the id of its nearest
         centroid subvector (exact integer L2, ties to smallest id) —
         one broadcast join against the ``num_centroids x
         num_subspaces`` codebook + a map-side-combinable min(struct)
         argmin;
      4. query time: per probe, an ADC lookup table (distance from the
         probe's subvector to every centroid subvector — tiny,
         broadcast), and each vector's approximate distance is the SUM
         of ``num_subspaces`` LUT entries selected by its codes;
      5. recall@k: ADC top-k vs exact top-k (two-phase subgroup top-k on
         both sides, no reducer sorts a corpus-sized slice).

    Scale shape: the corpus crosses the encode join once (narrow rows:
    id + one subvector), codes are ``num_subspaces`` small ints per
    vector — the structure a 100 TB vector store persists INSTEAD of raw
    floats; probes and LUTs broadcast.  Returns
    (probe_id, hits, recall_at_k).

    Plan shape (same fold as :func:`_ivf_encode` / the indexed probe
    path): the codebook is folded into ONE broadcast row of per-subspace
    (j, cv) arrays, each corpus vector computes its m code argmins as a
    per-row array expression, and ADC scoring is a per-row
    ``aggregate(zip_with(codes, _lut))`` fold against a per-probe LUT-map
    row — the corpus side plans no aggregation exchange.  A first cut
    exploded every vector ×m subspaces against the codebook and
    re-aggregated through ``groupBy(_id, _s)``, then re-aggregated ADC
    through ``groupBy(_pid, _id)``; the argmin algebra is identical
    (``array_min`` over (dist, id) structs ≡ ``min(struct)``:
    lexicographic, ties to smallest id) and (_pid, _id) was unique under
    the old grouping with exactly m integer addends, so the per-row fold
    computes the identical sum — results unchanged.
    """
    d_sub = dim // num_subspaces
    m = num_subspaces

    def _qvec(col):
        return F.transform(
            to_double_array(col), lambda x: F.floor(x * scale).cast("long")
        )

    def _sub_explode(frame: DataFrame, key_out: str, key_col: str) -> DataFrame:
        """(key, s, subvec): contiguous d_sub-wide integer subvectors."""
        return frame.select(
            F.col(key_col).alias(key_out),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.slice(_qvec(vec_col), s * d_sub + 1, d_sub),
                )
            ).alias("_s", "_sv"),
        )

    def _l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # Codebook = the num_centroids smallest-id corpus vectors (ordered
    # TakeOrderedAndProject, not filter(id < num_centroids)): with sparse
    # or non-zero-based ids a value filter silently shrinks (or empties)
    # the codebook and recall quietly degrades to 0 — ordered-limit gives
    # exactly num_centroids rows for any id domain.  On dense 0-based ids
    # (the fixture, and the oracle's WHERE id < n mirror) the two are
    # identical sets.
    book = F.broadcast(
        _fold_codebook(
            _sub_explode(
                df.orderBy(id_col).limit(num_centroids), "_j", id_col
            ).select(
                F.col("_j").alias("j"), F.col("_s").alias("s"), F.col("_sv").alias("cv")
            )
        ).filter(F.size(F.col("_book")) > 0)
    )

    def _codes_expr(vec):
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.array_min(
                F.transform(
                    F.element_at(F.col("_book"), s + 1),
                    lambda e: F.struct(
                        _l2(F.slice(vec, s * d_sub + 1, d_sub), e["cv"]).alias("_d"),
                        e["j"].alias("_j"),
                    ),
                )
            )["_j"],
        )

    codes = (
        df.select(F.col(id_col).alias("_id"), _qvec(vec_col).alias("_cq"))
        .crossJoin(book)
        .select("_id", _codes_expr(F.col("_cq")).alias("_codes"))
    )

    def _lut_expr(vec):
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.map_from_entries(
                F.transform(
                    F.element_at(F.col("_book"), s + 1),
                    lambda e: F.struct(
                        e["j"].alias("_code"),
                        _l2(F.slice(vec, s * d_sub + 1, d_sub), e["cv"]).alias("_ld"),
                    ),
                )
            ),
        )

    plut = F.broadcast(
        probes_df.select(
            F.col(probe_id_col).alias("_pid"), _qvec(vec_col).alias("_ppq")
        )
        .crossJoin(book)
        .select("_pid", _lut_expr(F.col("_ppq")).alias("_lut"))
    )

    adc = (
        codes.crossJoin(plut)
        .filter(F.col("_id") != F.col("_pid"))
        .select(
            "_pid",
            "_id",
            F.aggregate(
                F.zip_with(
                    F.col("_codes"), F.col("_lut"), lambda c, mp: F.element_at(mp, c)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("_dist"),
        )
    )

    q = F.broadcast(
        probes_df.select(
            F.col(probe_id_col).alias("_pid"), _qvec(vec_col).alias("_pq")
        )
    )
    exact = (
        df.select(F.col(id_col).alias("_id"), _qvec(vec_col).alias("_xq"))
        .crossJoin(q)
        .filter(F.col("_id") != F.col("_pid"))
        .select("_pid", "_id", _l2("_xq", "_pq").alias("_dist"))
    )

    def _topk(scored: DataFrame) -> DataFrame:
        sub = scored.withColumn(
            "_sub", F.pmod(F.xxhash64("_id"), F.lit(num_subgroups))
        )
        w1 = W.partitionBy("_pid", "_sub").orderBy("_dist", "_id")
        survivors = (
            sub.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        w2 = W.partitionBy("_pid").orderBy("_dist", "_id")
        return (
            survivors.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k)
            .select("_pid", "_id")
        )

    hits = (
        _topk(adc)
        .join(_topk(exact), ["_pid", "_id"])
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        q.select("_pid")
        .join(hits, "_pid", "left")
        .select(
            F.col("_pid").alias("probe_id"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(k))
            .cast("double")
            .alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )


def ivf_pq_recall_at_k(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probes_df: DataFrame,
    probe_id_col: str,
    *,
    k: int = 10,
    dim: int = 64,
    num_subspaces: int = 8,
    num_centroids: int = 16,
    num_cells: int = 8,
    nprobe: int = 2,
    scale: int = 127,
    num_subgroups: int = 64,
    cell_centroids: DataFrame | None = None,
) -> DataFrame:
    """IVFADC — the composed IVF + PQ layout every production vector
    store actually runs: IVF cells prune WHICH vectors are scored
    (``nprobe`` of ``num_cells`` cells per probe), then the ADC scan
    runs ONLY over the pruned candidates' 8-byte PQ codes.  This is what
    makes PQ's 32x storage cut pay at query time: the scan fraction is
    ~``nprobe / num_cells`` of the corpus instead of all of it.

    Mechanics — all INTEGER arithmetic (bit-reproducible across engines,
    same discipline as :func:`pq_recall_at_k`):
      1. cell centroids = the ``num_cells`` smallest-id vectors
         (quantized; a deterministic k-means stand-in — pass
         ``cell_centroids`` (cid, cvec double array) to plug in
         operators.clustering.kmeans_centroids for trained cells; the
         prune/scan machinery is identical either way);
      2. every vector joins the broadcast centroid table once and keeps
         its argmin cell (min(struct(dist, cid)) — map-side combinable,
         ties to smallest cid);
      3. per probe, cells are ranked by exact integer L2
         (probes x num_cells rows — tiny) and the ``nprobe`` nearest
         become the probe's candidate cells;
      4. candidates = vectors assigned to a probed cell (broadcast join
         against the (pid, cid) probe list); ``scanned`` counts them —
         the audit column that shows the nprobe/num_cells scan fraction;
      5. PQ encode / LUT / ADC exactly as :func:`pq_recall_at_k`
         (codebook = first ``num_centroids`` vectors' subvectors), but
         the ADC sum runs only over candidate (probe, vector) pairs;
      6. recall@k = overlap of the candidate-restricted ADC top-k with
         the EXACT full-corpus top-k — so the number prices BOTH losses
         (cell pruning + code compression) against ground truth.
         With ``nprobe == num_cells`` the candidate set is the whole
         corpus and the result degrades exactly to plain PQ
         (pytest-pinned).

    Scale shape: the corpus crosses the cell-assignment broadcast join
    and the encode join once each (narrow rows); codes are
    ``num_subspaces`` small ints; probe-side tables (probed cells, LUTs)
    broadcast; the exact side is the evaluation harness — production
    persists codes + cell ids and skips it.  Returns
    (probe_id, scanned, hits, recall_at_k).

    Plan shape (same fold as :func:`_ivf_encode`): cells + codebook fold
    into ONE broadcast model row; each vector computes its cell argmin
    and all m code argmins per-row (no ``groupBy(_id)`` cell-assignment
    exchange, no ``groupBy(_id, _s)`` encode exchange), the candidate
    join carries (id, codes) directly, and ADC is a per-row
    ``aggregate(zip_with)`` fold against per-probe LUT maps (no
    ``groupBy(_pid, _id)`` exchange).  Argmin/tie/sum algebra identical
    to the old shuffled shape — see :func:`pq_recall_at_k`."""
    d_sub = dim // num_subspaces
    m = num_subspaces

    def _qvec(col):
        return F.transform(
            to_double_array(col), lambda x: F.floor(x * scale).cast("long")
        )

    def _sub_explode(frame: DataFrame, key_out: str, key_col: str) -> DataFrame:
        return frame.select(
            F.col(key_col).alias(key_out),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.slice(_qvec(vec_col), s * d_sub + 1, d_sub),
                )
            ).alias("_s", "_sv"),
        )

    def _l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qdf = df.select(F.col(id_col).alias("_id"), _qvec(vec_col).alias("_q"))
    if cell_centroids is not None:
        cellc = cell_centroids.select(
            F.col("cid").cast("long").alias("_cid"),
            F.transform(
                F.col("cvec"), lambda x: F.floor(x * scale).cast("long")
            ).alias("_cv"),
        )
    else:
        cellc = (
            qdf.orderBy("_id")
            .limit(num_cells)
            .select(F.col("_id").alias("_cid"), F.col("_q").alias("_cv"))
        )

    book = _fold_codebook(
        _sub_explode(
            df.orderBy(id_col).limit(num_centroids), "_j", id_col
        ).select(
            F.col("_j").alias("j"), F.col("_s").alias("s"), F.col("_sv").alias("cv")
        )
    )
    cells_arr = cellc.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_cid"), F.col("_cv")))
        ).alias("_cells")
    )
    model = F.broadcast(
        cells_arr.crossJoin(book).filter(
            (F.size(F.col("_cells")) > 0) & (F.size(F.col("_book")) > 0)
        )
    )
    best = F.array_min(
        F.transform(
            F.col("_cells"),
            lambda c: F.struct(
                _l2(F.col("_q"), c["_cv"]).alias("_cd"), c["_cid"].alias("_cid")
            ),
        )
    )
    codes_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.array_min(
            F.transform(
                F.element_at(F.col("_book"), s + 1),
                lambda e: F.struct(
                    _l2(F.slice(F.col("_q"), s * d_sub + 1, d_sub), e["cv"]).alias(
                        "_d"
                    ),
                    e["j"].alias("_j"),
                ),
            )
        )["_j"],
    )
    enc = qdf.crossJoin(model).select(
        "_id", best["_cid"].alias("_cell"), codes_expr.alias("_codes")
    )

    pq_probe = probes_df.select(
        F.col(probe_id_col).alias("_pid"), _qvec(vec_col).alias("_pq")
    )
    probecells = F.broadcast(
        pq_probe.crossJoin(F.broadcast(cellc))
        .select("_pid", "_cid", _l2("_pq", "_cv").alias("_cd"))
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("_pid").orderBy("_cd", "_cid")),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("_pid", F.col("_cid").alias("_cell"))
    )
    cand = (
        enc.join(probecells, "_cell")
        .filter(F.col("_id") != F.col("_pid"))
        .select("_pid", "_id", "_codes")
    )
    scanned = cand.groupBy("_pid").agg(
        F.count(F.lit(1)).cast("long").alias("scanned")
    )

    plut = F.broadcast(
        pq_probe.crossJoin(F.broadcast(book))
        .select(
            "_pid",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.map_from_entries(
                    F.transform(
                        F.element_at(F.col("_book"), s + 1),
                        lambda e: F.struct(
                            e["j"].alias("_code"),
                            _l2(
                                F.slice(F.col("_pq"), s * d_sub + 1, d_sub), e["cv"]
                            ).alias("_ld"),
                        ),
                    )
                ),
            ).alias("_lut"),
        )
    )
    adc = (
        cand.join(plut, "_pid")
        .select(
            "_pid",
            "_id",
            F.aggregate(
                F.zip_with(
                    F.col("_codes"), F.col("_lut"), lambda c, mp: F.element_at(mp, c)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("_dist"),
        )
    )

    q = F.broadcast(
        probes_df.select(
            F.col(probe_id_col).alias("_pid"), _qvec(vec_col).alias("_pq")
        )
    )
    exact = (
        df.select(F.col(id_col).alias("_id"), _qvec(vec_col).alias("_xq"))
        .crossJoin(q)
        .filter(F.col("_id") != F.col("_pid"))
        .select("_pid", "_id", _l2("_xq", "_pq").alias("_dist"))
    )

    def _topk(scored: DataFrame) -> DataFrame:
        sub = scored.withColumn(
            "_sub", F.pmod(F.xxhash64("_id"), F.lit(num_subgroups))
        )
        w1 = W.partitionBy("_pid", "_sub").orderBy("_dist", "_id")
        survivors = (
            sub.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        w2 = W.partitionBy("_pid").orderBy("_dist", "_id")
        return (
            survivors.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k)
            .select("_pid", "_id")
        )

    hits = (
        _topk(adc)
        .join(_topk(exact), ["_pid", "_id"])
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        q.select("_pid")
        .join(scanned, "_pid", "left")
        .join(hits, "_pid", "left")
        .select(
            F.col("_pid").alias("probe_id"),
            F.coalesce(F.col("scanned"), F.lit(0)).cast("long").alias("scanned"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(k))
            .cast("double")
            .alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )


def mmr_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    *,
    k: int = 4,
    pool: int = 12,
    scale: int = 127,
    num_subgroups: int = 64,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998)
    — the standard greedy diverse-top-k used for retrieval result
    diversification and diverse training-sample curation: pick the most
    relevant item first, then repeatedly the item maximizing
    ``relevance - max-similarity-to-already-selected`` (the lambda=1/2
    MMR objective scaled by 2, so everything stays INTEGER and
    bit-reproducible under floor(v*scale) quantization; ties to
    smallest id).

    Returns (rank, id, rel, mmr_score) for the ``k`` selected items
    (rank 1's mmr_score is its relevance — no selected set yet).

    Scale shape: relevance is one narrow corpus pass against the
    broadcast query; the candidate POOL (top ``pool`` by relevance) is
    cut with a subgroup top-k + TakeOrdered (no corpus-wide
    single-partition window); the pool's pairwise similarity matrix
    (pool^2 <= 144 integer dots) is computed distributedly and the
    greedy loop itself runs on that COLLECTED bounded matrix —
    driver-side math over a K-row object, the ivf_topk precedent
    (driver ranks nprobe cells), never a corpus-sized collect."""

    def _qvec(col):
        return F.transform(
            to_double_array(col), lambda x: F.floor(x * scale).cast("long")
        )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    spark = df.sparkSession
    q = F.broadcast(query_df.select(_qvec(vec_col).alias("_mq")).limit(1))
    scored = (
        df.select(F.col(id_col).alias("_id"), _qvec(vec_col).alias("_xq"))
        .crossJoin(q)
        .select("_id", "_xq", _dot(F.col("_xq"), F.col("_mq")).alias("_rel"))
    )
    sub = scored.withColumn("_sub", F.pmod(F.xxhash64("_id"), F.lit(num_subgroups)))
    w1 = W.partitionBy("_sub").orderBy(F.col("_rel").desc(), "_id")
    pool_df = (
        sub.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= pool)
        .orderBy(F.col("_rel").desc(), "_id")
        .limit(pool)
        .select("_id", "_xq", "_rel")
        .localCheckpoint(eager=True)  # bounded: `pool` rows
    )
    a = pool_df.select(F.col("_id").alias("_a"), F.col("_xq").alias("_qa"))
    b = pool_df.select(F.col("_id").alias("_b"), F.col("_xq").alias("_qb"))
    sims = {
        (r._a, r._b): r._s
        for r in a.crossJoin(b)
        .filter(F.col("_a") != F.col("_b"))
        .select("_a", "_b", _dot(F.col("_qa"), F.col("_qb")).alias("_s"))
        .collect()
    }
    cands = {r._id: r._rel for r in pool_df.select("_id", "_rel").collect()}

    selected: list[tuple[int, int, int, int]] = []  # (rank, id, rel, score)
    chosen: list[int] = []
    for rank in range(1, min(k, len(cands)) + 1):
        best = None
        for cid, rel in cands.items():
            if cid in chosen:
                continue
            msim = max((sims[(cid, s)] for s in chosen), default=None)
            score = rel if msim is None else rel - msim
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, rel, score)
        _, cid, rel, score = best
        chosen.append(cid)
        selected.append((rank, cid, rel, score))
    id_type = df.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        selected, f"rank int, {id_col} {id_type}, rel long, mmr_score long"
    )


# --------------------------------------------------------------------------
# Persisted IVF/PQ index with partition-pruned probes
# --------------------------------------------------------------------------

def _ivfq(col, scale: int):
    """floor(v*scale) integer quantization — the shared discipline of the
    whole PQ family (bit-reproducible across engines)."""
    return F.transform(
        to_double_array(col), lambda x: F.floor(x * scale).cast("long")
    )


def _ivfl2(a, b):
    """Exact integer squared L2 between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ivf_pq_write_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    *,
    dim: int = 64,
    num_subspaces: int = 8,
    num_centroids: int = 16,
    num_cells: int = 8,
    scale: int = 127,
) -> None:
    """Materialize the IVFADC index LAYOUT that makes
    :func:`ivf_pq_recall_at_k`'s pruning a property of the STORAGE, not
    the query: the encoded corpus — ``(id, codes array<long>)``, 8 small
    ints per vector — written ``partitionBy(cell)``, so a probe's
    nprobe/num_cells scan fraction becomes parquet PARTITION PRUNING
    (directories never listed) instead of a post-scan filter.  The tiny
    model tables ride along under the same root (``centroids/``,
    ``codebook/``) so a query needs no access to the raw corpus at all.

    Same deterministic model as ivf_pq_recall_at_k (cell centroids = the
    ``num_cells`` smallest-id vectors, codebook = the first
    ``num_centroids`` vectors' subvectors — k-means stand-ins; the
    layout machinery is identical with trained models) and the same
    integer algebra, so a DuckDB oracle can replay the index content
    exactly.  One corpus pass computes assignment + codes (two broadcast
    joins, one narrow write shuffle on cell).

    docs/scale.md:53's promise, measured: scan fraction == probed
    cells' share of files (tests/test_operators_similarity.py pins the
    PartitionFilters plan node and the on-disk fraction;
    ext_ivf_pq_indexed is the gate query)."""
    d_sub = dim // num_subspaces
    m = num_subspaces

    qdf = df.select(F.col(id_col).alias("_id"), _ivfq(vec_col, scale).alias("_q"))
    # model tables are <= num_centroids rows but DERIVE from a full-corpus
    # top-k — materialize each once so the encode job, and the two model
    # writes below, don't re-run that scan (3x measured before; the build
    # is then the advertised single corpus pass plus tiny-frame jobs)
    cellc = (
        qdf.orderBy("_id")
        .limit(num_cells)
        .select(F.col("_id").alias("cid"), F.col("_q").alias("cv"))
        .localCheckpoint(eager=True)
    )
    cents = (
        qdf.orderBy("_id")
        .limit(num_centroids)
        .select(
            F.col("_id").alias("j"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.slice(F.col("_q"), s * d_sub + 1, d_sub),
                )
            ).alias("s", "cv"),
        )
        .localCheckpoint(eager=True)
    )
    codes = _ivf_encode(qdf, cellc, cents, m=m, d_sub=d_sub)
    codes.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    cellc.write.mode("overwrite").parquet(f"{path}/centroids")
    cents.write.mode("overwrite").parquet(f"{path}/codebook")


def _fold_codebook(cents: DataFrame) -> DataFrame:
    """Fold the (j, s, cv) subspace codebook — ≤ num_centroids ×
    num_subspaces rows — into ONE row holding ``_book``: an array indexed
    by subspace ``s`` (ascending) of ``(j, cv)`` struct arrays sorted by
    ``j``.  The fold is a constant-size aggregation (the exchanges it
    plans carry ≤ m·k rows regardless of corpus size); broadcast-joining
    the folded row lets encode and ADC scoring run as pure per-row array
    math with NO corpus-proportional shuffle."""
    return (
        cents.groupBy("s")
        .agg(F.array_sort(F.collect_list(F.struct(F.col("j"), F.col("cv")))).alias("_e"))
        .agg(F.array_sort(F.collect_list(F.struct(F.col("s"), F.col("_e")))).alias("_sb"))
        .select(F.transform(F.col("_sb"), lambda x: x["_e"]).alias("_book"))
    )


def _ivf_encode(
    qdf: DataFrame, cellc: DataFrame, cents: DataFrame, *, m: int, d_sub: int
) -> DataFrame:
    """Shared IVFADC encode stage: quantized vectors ``(_id, _q)`` against
    a centroid table ``(cid, cv)`` and a subspace codebook ``(j, s, cv)``
    — argmin cell assignment (ties to smallest cid) plus per-subspace
    argmin PQ codes, returned as ``(id, cell, codes array<long>)``.
    Both :func:`ivf_pq_write_index` (model trained from the corpus) and
    :func:`ivf_pq_upsert` (model FROZEN, read back from the index) run
    exactly this — the encode math cannot drift between build and
    ingest.

    Plan shape: the model tables are folded into ONE broadcast row of
    arrays (constant-size aggregations) and every vector computes its
    cell argmin and all m code argmins as per-row array expressions —
    the corpus side is exchange-free.  A first cut cross-joined each
    vector against the centroid table and re-aggregated through
    ``groupBy(_id)``, then exploded m subspaces against the codebook
    through two more shuffled groupBys (~m·num_centroids× row expansion
    through 3 corpus-wide exchanges); the argmin algebra here is
    identical (``array_min`` over (dist, id) structs ≡ ``min(struct)``:
    lexicographic, ties to smallest id) so results are unchanged.
    An EMPTY centroid table yields zero output rows (the crossJoin
    filter), exactly as the old inner-join pipeline did."""
    cells_arr = cellc.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cid"), F.col("cv")))).alias("_cells")
    )
    model = F.broadcast(
        cells_arr.crossJoin(_fold_codebook(cents)).filter(F.size(F.col("_cells")) > 0)
    )
    best = F.array_min(
        F.transform(
            F.col("_cells"),
            lambda c: F.struct(
                _ivfl2(F.col("_q"), c["cv"]).alias("_cd"), c["cid"].alias("_cid")
            ),
        )
    )
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.array_min(
            F.transform(
                F.element_at(F.col("_book"), s + 1),
                lambda e: F.struct(
                    _ivfl2(F.slice(F.col("_q"), s * d_sub + 1, d_sub), e["cv"]).alias(
                        "_d"
                    ),
                    e["j"].alias("_j"),
                ),
            )
        )["_j"],
    )
    return qdf.crossJoin(model).select(
        F.col("_id").alias("id"), best["_cid"].alias("cell"), codes.alias("codes")
    )


def ivf_pq_upsert(
    spark,
    path: str,
    delta_df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int = 64,
    num_subspaces: int = 8,
    scale: int = 127,
) -> None:
    """Incremental INGEST into a persisted :func:`ivf_pq_write_index`
    layout: the delta is encoded against the index's FROZEN model tables
    (centroids + codebook read back from ``path`` — never retrained, so
    existing codes stay valid and comparable) and its code rows are
    APPENDED into only the touched ``cell=`` partition directories — the
    vector-index twin of the incremental dedup band index, and the same
    materialized-state thesis: index built once, every ingest pays only
    delta-proportional encode + append, and probes see old and new
    vectors through one partition-pruned scan.

    At lake scale appends accumulate small files per cell; compact a
    cell by rewriting just its directory (partition-scoped overwrite) —
    the model tables never change until a full re-train/re-build."""
    cellc = spark.read.parquet(f"{path}/centroids")
    cents = spark.read.parquet(f"{path}/codebook")
    d_sub = dim // num_subspaces
    qdf = delta_df.select(
        F.col(id_col).alias("_id"), _ivfq(vec_col, scale).alias("_q")
    )
    codes = _ivf_encode(qdf, cellc, cents, m=num_subspaces, d_sub=d_sub)
    codes.write.mode("append").partitionBy("cell").parquet(f"{path}/codes")


def ivf_pq_indexed_topk(
    spark,
    path: str,
    probes_df: DataFrame,
    probe_id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    nprobe: int = 2,
    dim: int = 64,
    num_subspaces: int = 8,
    scale: int = 127,
    num_subgroups: int = 64,
) -> DataFrame:
    """ADC top-k over a PERSISTED :func:`ivf_pq_write_index` layout with
    PARTITION-PRUNED probes: the probed cell ids (at most
    nprobe x probes, itself capped by the index's num_cells — a bounded
    driver list by construction) are pushed as a static IN filter on the
    ``cell`` partition column, so Spark lists ONLY the probed cell
    directories (PartitionFilters in the scan node — plan-pinned) and
    the scan cost is the nprobe/num_cells fraction of the index, with
    the raw corpus never touched.

    Returns (probe_id, scanned, rank, id, adc_dist) — ``scanned`` is the
    per-probe candidate count (the row-level pruning audit), ranks 1..k
    by integer ADC distance with ties to smallest id.  A probe whose
    probed cells hold NO other vectors yields no output rows (a top-k
    table has nowhere to put an empty result): callers that must
    distinguish "no neighbors" from "request lost" should left-join
    their probe list against the result, exactly as the oracle does not
    need to — the contract is symmetric on both engines.

    Scale shape: model tables (centroids, codebook, per-probe LUT maps)
    broadcast; the pruned code scan is ``num_subspaces`` small ints per
    row; ADC scoring is a per-row array fold against the broadcast LUT
    (no corpus-fraction shuffle — the only aggregation over candidates
    is the combinable ``scanned`` count); top-k uses the subgroup
    two-stage window (no single-partition sort)."""
    cents = spark.read.parquet(f"{path}/centroids")
    book = spark.read.parquet(f"{path}/codebook")
    d_sub = dim // num_subspaces
    m = num_subspaces

    pq = probes_df.select(
        F.col(probe_id_col).alias("_pid"), _ivfq(vec_col, scale).alias("_pq")
    )
    probecells = (
        pq.crossJoin(F.broadcast(cents))
        .select("_pid", "cid", _ivfl2("_pq", "cv").alias("_cd"))
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("_pid").orderBy("_cd", "cid")),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("_pid", F.col("cid").alias("cell"))
        # lazy (probes x nprobe rows; read twice): the cells collect is
        # the sole first consumer — one job computes + persists; the
        # broadcast build below reads the persisted blocks
        .localCheckpoint(eager=False)
    )
    cells = [r[0] for r in probecells.select("cell").distinct().collect()]

    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin(cells)
    )
    cand = (
        codes.join(F.broadcast(probecells), "cell")
        .filter(F.col("id") != F.col("_pid"))
        .select("_pid", "id", "codes")
    )
    scanned = cand.groupBy("_pid").agg(
        F.count(F.lit(1)).cast("long").alias("scanned")
    )

    # per-probe ADC lookup table as ONE row per probe: _lut[s] is a
    # (code j → partial distance) map for subspace s, built against the
    # folded codebook (constant-size fold, broadcast).  Each candidate
    # then scores itself per-row — sum over s of _lut[s][codes[s]] — so
    # the only corpus-fraction work is a broadcast hash join on _pid
    # plus an array fold per row.  A first cut exploded every candidate
    # ×m subspaces against a (probe, s, code) LUT and re-aggregated
    # through groupBy(_pid, id); (_pid, id) is unique in cand (one code
    # row per id per probed cell) and integer addition is exact and
    # commutative, so the per-row fold computes the identical sum.
    plut = F.broadcast(
        pq.crossJoin(F.broadcast(_fold_codebook(book)))
        .select(
            "_pid",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.map_from_entries(
                    F.transform(
                        F.element_at(F.col("_book"), s + 1),
                        lambda e: F.struct(
                            e["j"].alias("_code"),
                            _ivfl2(
                                F.slice(F.col("_pq"), s * d_sub + 1, d_sub), e["cv"]
                            ).alias("_ld"),
                        ),
                    )
                ),
            ).alias("_lut"),
        )
    )
    adc = (
        cand.join(plut, "_pid")
        .select(
            "_pid",
            "id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("_lut"), lambda c, mp: F.element_at(mp, c)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )

    sub = adc.withColumn("_sub", F.pmod(F.xxhash64("id"), F.lit(num_subgroups)))
    w1 = W.partitionBy("_pid", "_sub").orderBy("adc_dist", "id")
    survivors = (
        sub.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_sub")
    )
    w2 = W.partitionBy("_pid").orderBy("adc_dist", "id")
    topk = (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
    return (
        topk.join(scanned, "_pid")
        .select(
            F.col("_pid").alias("probe_id"),
            "scanned",
            F.col("rank").cast("int").alias("rank"),
            "id",
            F.col("adc_dist").cast("long").alias("adc_dist"),
        )
        .orderBy("probe_id", "rank")
    )


def ivf_pq_compact_cells(
    spark,
    path: str,
    *,
    cells: list[int] | None = None,
    num_files_per_cell: int = 1,
) -> None:
    """Compact the small files that :func:`ivf_pq_upsert` appends — each
    ingest adds a file generation to every touched ``cell=`` directory,
    and a probe's cost per cell is (files x footer) + rows, so periodic
    compaction keeps the pruned-scan promise honest.  Uses DYNAMIC
    partition overwrite (``spark.sql.sources.partitionOverwriteMode =
    dynamic``): the rewrite job's output replaces ONLY the cell
    partitions it writes — untouched cells' files are left byte-for-byte
    alone (pytest-pinned), which is what makes per-cell compaction safe
    to run concurrently with probes of other cells.  ``cells=None``
    compacts every cell; content is unchanged either way (the operator
    is a pure layout rewrite — probe results before == after,
    pytest-pinned).

    At lake scale, schedule by files-per-cell threshold and compact the
    worst offenders first; the model tables never participate."""
    codes_path = f"{path}/codes"
    df = spark.read.parquet(codes_path)
    if cells is not None:
        df = df.filter(F.col("cell").isin([int(c) for c in cells]))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(num_files_per_cell, "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(codes_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
