"""MERGE/upsert and SCD2 emulation over plain parquet (EXT sink semantics).

Delta/Iceberg jars are not in this container (sources.io gates them); the
engine still needs upsert semantics, so these compose them from anti-join
+ union — the classic pre-ACID pattern, and the exact logical plan a
MERGE INTO lowers to.  At scale both sides shuffle on the key once; with
key-bucketed tables (plans.shuffle_policy.write_bucketed) the exchange
disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """UPSERT: rows from ``updates`` win on key collision, unmatched
    target rows survive.  Equivalent to
    MERGE ... WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *."""
    kept = target.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "effective_from",
    end_col: str = "effective_to",
    change_ts_col: str = "change_ts",
    open_end_ts: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of each
    changed key (end = change ts) and append the new open version.

    ``current`` carries [key..., attrs..., effective_from, effective_to];
    ``changes`` carries [key..., attrs..., change_ts].  Unchanged keys and
    already-closed history pass through untouched.
    """
    open_end = F.lit(open_end_ts).cast("timestamp_ntz")
    # no .distinct(): changed_keys only ever feeds semi/anti joins, whose
    # right sides tolerate duplicate keys — the dedup aggregation cost an
    # Exchange + two HashAggregates per consuming join (r15)
    changed_keys = changes.select(*key_cols)

    untouched = current.join(changed_keys, on=key_cols, how="left_anti")
    closed_history = current.filter(F.col(end_col) != open_end).join(
        changed_keys, on=key_cols, how="left_semi"
    )
    newly_closed = (
        current.filter(F.col(end_col) == open_end)
        .join(changed_keys, on=key_cols, how="left_semi")
        .join(
            changes.select(*key_cols, F.col(change_ts_col).alias("_chg")), on=key_cols
        )
        .withColumn(end_col, F.col("_chg"))
        .drop("_chg")
    )
    new_open = (
        changes.withColumnRenamed(change_ts_col, ts_col)
        .withColumn(end_col, open_end)
        .select(*current.columns)
    )
    return untouched.unionByName(closed_history).unionByName(newly_closed).unionByName(new_open)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Dataset-version diff: one row per key that was added, removed, or
    changed between two snapshots — the audit primitive behind
    incremental publishing and reproducibility checks.

    Shape at scale: one full outer join on the key (both sides shuffle
    once; zero-exchange against key-bucketed snapshot layouts — see
    plans.shuffle_policy.write_bucketed), then a pure projection for the
    status.  Unchanged rows are filtered out BEFORE any downstream
    consumer, so the result is delta-sized, not snapshot-sized.  Change
    detection compares ``compare_cols`` with null-safe equality; at 100 TB
    compare a persisted row-hash column instead of wide payloads so the
    join carries (key, 8-byte hash) only.
    """
    o = old.select(*key_cols, *compare_cols)
    n = new.select(*key_cols, *compare_cols)
    o = o.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
    )
    n = n.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    old_present = F.col(f"_o_{key_cols[0]}").isNotNull()
    new_present = F.col(f"_n_{key_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(old_present & ~new_present, F.lit("removed"))
        .when(new_present & ~old_present, F.lit("added"))
        .when(~same, F.lit("changed"))
    )
    keys_out = [
        F.coalesce(F.col(f"_o_{c}"), F.col(f"_n_{c}")).alias(c) for c in key_cols
    ]
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys_out, "status")
    )


def merge_upsert_ordered(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Order-aware MERGE (CDC latest-wins): for each key, the row with the
    highest ``order_cols`` tuple survives, whichever side carries it.

    Unlike ``merge_upsert`` (arrival order wins), the result is
    independent of HOW the updates were batched — applying changelog
    batches in any interleaving converges to the same table, which is
    the property a CDC ingest needs when micro-batches are not
    time-ordered (file-arrival order, shuffled topics, backfills).
    Equivalent to MERGE ... WHEN MATCHED AND s.ord > t.ord THEN UPDATE.

    ``order_cols`` must be a total order per key (e.g. event time plus a
    unique id as tiebreak); otherwise the surviving row is
    undeterministic under ties.  Both sides shuffle once on the key for
    the window; with key-bucketed snapshots the exchange disappears.
    """
    from pyspark.sql.window import Window

    if not key_cols:
        raise ValueError("merge_upsert_ordered needs at least one key column")
    if not order_cols:
        raise ValueError(
            "merge_upsert_ordered needs at least one order column (latest-wins "
            "is undefined without an order)"
        )
    allr = target.select(*updates.columns).unionByName(updates)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        allr.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_point_in_time(
    dim: DataFrame,
    fact: DataFrame,
    key_cols: list[str],
    fact_ts_col: str,
    *,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time dimension lookup against an SCD2 table: each fact row
    joins the dimension VERSION that was valid at the fact's timestamp
    (``from <= ts < to`` — the half-open convention :func:`scd2_apply`
    writes, so a fact at exactly the change instant sees the NEW
    version).  This is the read side of SCD2 — the join every
    time-correct report runs against a versioned dimension.

    Plan shape: an EQUI-join on the dimension key with the interval
    predicate as a post-join filter — correct and cheap because SCD2
    guarantees few versions per key (fan-out = version count, then the
    filter keeps exactly one); a general interval/range join
    (operators/joins.py) is only needed when there is no equi-key.  At
    100 TB the dimension is broadcast when it fits, else both sides
    shuffle on the key.
    """
    cond = None
    for k in key_cols:
        c = fact[k] == dim[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (fact[fact_ts_col] >= dim[from_col])
        & (fact[fact_ts_col] < dim[to_col])
    )
    return fact.join(dim, cond, how).drop(*[dim[k] for k in key_cols])


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    features: list[tuple[str, "F.Column"]],
) -> DataFrame:
    """Distribution-drift report between two corpus snapshots — the
    MONITORING twin of the snapshot_diff row-level diff: one row per
    monitored feature with
    ``(feature, n_bins, psi, ks_stat)``.

    ``features`` is a list of (name, bin-key Column): the column maps
    each row to a BOUNDED bin key (a categorical value, or a bucketed
    numeric like ``floor(n_tokens/8)``) — the bin domain is the union of
    both snapshots' keys.

    Metrics (the standard model-monitoring pair):
      - **PSI** (population stability index) =
        sum over bins of (p_new - p_old) * ln(p_new / p_old), with
        Laplace-smoothed proportions ``p = (cnt + 1) / (total + n_bins)``
        so empty-on-one-side bins are defined without epsilon magic —
        the smoothing is exact integer arithmetic and therefore
        engine-replayable.  Each term is rounded to 6 decimals and
        DECIMAL-summed (the label_entropy float discipline: a double
        SUM's accumulation order is not engine-stable, a decimal sum of
        pre-rounded terms is).
      - **KS statistic** = max over the bin-ordered support of
        |CDF_old - CDF_new| (exact, since the support is the discrete
        bin domain; categorical features use their natural string order
        — an ordinal encoding, documented rather than hidden).  max() is
        SELECTION, not accumulation, so no decimal detour is needed;
        the output is rounded to 6 decimals.

    Scale: per feature, two combinable groupBy counts (bin-keyed
    shuffles), one full outer join on the bin key, one single-partition
    cumulative window — safe ONLY because the bin domain is bounded by
    construction (categoricals / buckets), never corpus-sized; that
    bound is the caller's contract, mirroring the KLL-sketch discipline
    for unbounded numerics."""
    from pyspark.sql import Window as W

    out = None
    for name, key in features:
        oc = old.select(key.alias("k")).groupBy("k").agg(
            F.count(F.lit(1)).alias("c_o")
        )
        nc = new.select(key.alias("k")).groupBy("k").agg(
            F.count(F.lit(1)).alias("c_n")
        )
        # eager checkpoint: `full` feeds both the totals aggregate and the
        # per-bin frame below; without it the corpus-sized two-groupBy +
        # outer-join subtree executes twice per feature.  Bounded by the
        # function's own bin-domain contract, so the materialization is a
        # few rows.
        full = oc.join(nc, "k", "full").select(
            "k",
            F.coalesce("c_o", F.lit(0)).alias("c_o"),
            F.coalesce("c_n", F.lit(0)).alias("c_n"),
        ).localCheckpoint(eager=True)
        tots = full.agg(
            F.sum("c_o").alias("t_o"),
            F.sum("c_n").alias("t_n"),
            F.count(F.lit(1)).alias("b"),
        )
        j = full.crossJoin(F.broadcast(tots))
        p_o = (F.col("c_o") + 1) / (F.col("t_o") + F.col("b"))
        p_n = (F.col("c_n") + 1) / (F.col("t_n") + F.col("b"))
        term = F.round((p_n - p_o) * F.log(p_n / p_o), 6).cast("decimal(18,6)")
        w = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
        d = F.abs(
            F.sum("c_o").over(w) / F.col("t_o")
            - F.sum("c_n").over(w) / F.col("t_n")
        )
        row = (
            j.select(term.alias("term"), d.alias("d"), F.col("b"))
            .agg(
                F.lit(name).alias("feature"),
                F.max("b").cast("long").alias("n_bins"),
                F.sum("term").cast("double").alias("psi"),
                F.round(F.max("d"), 6).alias("ks_stat"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out
