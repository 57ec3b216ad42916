"""Training-data pipeline utilities (EXT): deterministic splits, global
row indexing, quantile binning, vocabulary building, stratified sampling.

These are the glue operators a 100 TB training corpus pipeline needs
between dedup and export.  Design invariants:

- determinism is *data-derived*, never RNG-state-derived: splits and
  samples hash stable ids, so re-running on a grown corpus keeps every
  previously-assigned row in its split (randomSplit does not);
- nothing funnels through a single task: global row numbering uses the
  two-phase partition-offset pattern, not a one-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_split(
    df: DataFrame,
    id_col: str,
    *,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign a stable split label from a hash of the id (+ salt).

    ``weights`` maps label → fraction (must sum to ~1).  Unlike
    ``randomSplit`` this is a pure projection: reproducible across runs,
    sessions, and partitionings, and rows keep their split when the
    corpus grows — the property training pipelines actually need.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    # uniform in [0,1): low 31 bits of the salted hash (always nonneg)
    u = (F.xxhash64(F.col(id_col), F.lit(salt)).bitwiseAND(F.lit((1 << 31) - 1))) / F.lit(
        float(1 << 31)
    )
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        cond = u < acc
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])
    return df.withColumn("split", expr)


def with_global_index(df: DataFrame, *, out_col: str = "row_index") -> DataFrame:
    """Contiguous 0-based global row index without a global sort.

    Two-phase: count rows per partition (tiny driver-side array) →
    broadcast the cumulative offsets → per-partition local index + offset.
    O(rows) work, no single-task bottleneck; the assignment follows the
    current partition order (apply after an explicit sort if a semantic
    order is needed).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    schema = StructType(df.schema.fields + [StructField(out_col, LongType(), False)])

    counts = df.rdd.mapPartitionsWithIndex(
        lambda pid, it: iter([(pid, sum(1 for _ in it))])
    ).collect()
    offsets = {}
    running = 0
    for pid, n in sorted(counts):
        offsets[pid] = running
        running += n
    boffsets = spark.sparkContext.broadcast(offsets)

    def tag(pid, it):
        base = boffsets.value[pid]
        for i, row in enumerate(it):
            yield (*row, base + i)

    return spark.createDataFrame(df.rdd.mapPartitionsWithIndex(tag), schema)


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    *,
    num_buckets: int = 10,
    relative_error: float = 0.001,
    out_col: str = "bucket",
) -> DataFrame:
    """Equi-depth binning: bucket i holds ~1/num_buckets of the rows.

    Cutpoints come from approxQuantile (Greenwald-Khanna, one pass,
    mergeable — the scalable choice); the bucket assignment is a pure
    projection against the broadcast cutpoints.
    """
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = df.approxQuantile(value_col, qs, relative_error)
    # monotone assignment: count of cutpoints below the value
    b = F.lit(0)
    for c in cuts:
        b = b + F.when(F.col(value_col) > F.lit(float(c)), 1).otherwise(0)
    return df.withColumn(out_col, b.cast("int"))


def build_vocab(
    df: DataFrame,
    text_col: str,
    *,
    min_count: int = 1,
    max_size: int | None = None,
) -> DataFrame:
    """Frequency-ordered vocabulary: (token, count, token_id) with id 0 =
    most frequent; ties break lexicographically.

    One explode + one combinable count shuffle, then ranking WITHOUT a
    single-partition window (a global ``row_number()`` funnels the whole
    vocab through one task — fine for dictionary vocabs, fatal for the
    ~10^8-distinct-token vocabs web corpora produce): range-partition by
    the sort key, sort within partitions, and assign contiguous ids with
    the two-phase partition-offset pattern (:func:`with_global_index`).
    """
    from remote_shuffle_spark.functions.hashing import tokens

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    ordered = counts.repartitionByRange(
        F.col("count").desc(), F.col("token")
    ).sortWithinPartitions(F.col("count").desc(), "token")
    vocab = with_global_index(ordered, out_col="token_id")
    if max_size is not None:
        vocab = vocab.filter(F.col("token_id") < max_size)
    return vocab


def encode_tokens(df: DataFrame, id_col: str, text_col: str, vocab: DataFrame) -> DataFrame:
    """Map each document to its token-id sequence using the vocab
    (broadcast for dictionary-sized vocabularies): (id, token_ids).

    Exploded join + ordered re-assembly; unknown tokens drop (add a
    sentinel row to ``vocab`` for UNK behavior)."""
    from remote_shuffle_spark.functions.hashing import tokens

    pos = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    )
    joined = pos.join(F.broadcast(vocab.select("token", "token_id")), "token")
    return (
        joined.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "token_id"))).alias("pt"))
        .select(
            F.col(id_col),
            F.transform("pt", lambda s: s["token_id"]).alias("token_ids"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    *,
    fractions: dict,
    id_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Hash-deterministic per-stratum sampling (same stability story as
    :func:`deterministic_split`; ``sampleBy`` is seed-stable but
    partitioning-sensitive)."""
    u = (F.xxhash64(F.col(id_col), F.lit(salt)).bitwiseAND(F.lit((1 << 31) - 1))) / F.lit(
        float(1 << 31)
    )
    frac = None
    for stratum, f in fractions.items():
        frac = (
            F.when(F.col(strata_col) == stratum, F.lit(float(f)))
            if frac is None
            else frac.when(F.col(strata_col) == stratum, F.lit(float(f)))
        )
    frac = frac.otherwise(F.lit(0.0))
    return df.filter(u < frac)
