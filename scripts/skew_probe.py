"""Skewed-key probe for the round-5 join family (round-5 verdict item 6).

The 25x probes used UNIFORM keys; this one plants the regime salting
exists for — one key holding ``--hot-frac`` (default 20%) of all rows —
and measures, for salted_join vs the plain AQE path and for
interval_overlap_join:

- wall time;
- reducer balance: max/median ROW COUNT over the post-shuffle join
  partitions (the deterministic driver of reducer task time — wall-clock
  per task on a shared VM is noise, partition sizes are not).

Judgment recorded in docs/scale.md.  Synthetic inputs are distributed
(spark.range + expressions), deterministic, and sized by --scale
(5M events at 1.0).

Usage: python scripts/skew_probe.py [--scale 1.0] [--hot-frac 0.2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_skewed_events(spark, n: int, users: int, hot_frac: float):
    """n events; a hot_frac slice all on user 0, the rest uniform."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % int(1 / hot_frac) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(users)))
        .alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
    )


def partition_balance(df) -> dict:
    """max/median row count over the frame's current partitions."""
    sizes = sorted(
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    nonzero = [s for s in sizes if s] or [0]
    return {
        "partitions": len(sizes),
        "max": max(sizes),
        "median": nonzero[len(nonzero) // 2],
        "skew_ratio": round(max(sizes) / max(1, nonzero[len(nonzero) // 2]), 2),
    }


def _synth_docs(spark, n: int, *, core: str | None = None, tag: str, start: int = 0):
    """n synthetic documents: distinct 12-token texts derived from id; if
    ``core`` is given, every doc shares that token core and differs only
    in a trailing unique token (near-identical shingle sets — the planted
    hot band key)."""
    ids = spark.range(start, start + n)
    if core is None:
        body = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{j}x"),
                    F.pmod(F.xxhash64(F.col("id") + j * 7919), F.lit(997)),
                )
                for j in range(12)
            ],
        )
    else:
        body = F.concat(
            F.lit(core + " "), F.lit(tag), F.col("id").cast("string")
        )
    return ids.select(F.col("id").alias("doc_id"), body.alias("text"))


def index_paths_mode(spark, args, out, timed) -> None:
    """Round-11 verdict item 6: feed a planted ~100x hot key through the
    persisted-index operational paths and show wall stays bounded.

    Band index: a delta where one band key (a shared 30-token core ->
    near-identical MinHash signatures) holds half the delta rows,
    vs a uniform delta of the SAME size.  The index's build-time bucket
    cap bounds the corpus side of the hot join, so hot wall must stay
    within small-constant range of uniform wall.

    IVF: every probe routed to the SAME cell (probe vectors = the cell-0
    centroid) vs probes spread across cells.  Candidate fan-out per
    probe is (cell size), the probecells side is broadcast, and the ADC
    aggregate shuffles on the UNIFORM probe id — so hot-cell wall must
    track uniform wall."""
    import shutil
    import tempfile
    import uuid

    from remote_shuffle_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_index,
        write_minhash_band_index,
    )
    from remote_shuffle_spark.operators.similarity import (
        ivf_pq_indexed_topk,
        ivf_pq_write_index,
    )

    n_corpus = int(50_000 * args.scale)
    n_delta = int(4_000 * args.scale)
    root = tempfile.mkdtemp(prefix=f"index_skew_{uuid.uuid4().hex[:8]}_")
    try:
        corpus = _synth_docs(spark, n_corpus, tag="c")
        # plant the shared core in the corpus too (so the hot bucket exists
        # corpus-side and the build-time cap is what protects the join)
        core = " ".join(f"core{i} boiler{i}" for i in range(15))
        corpus = corpus.unionAll(
            _synth_docs(
                spark, 600, core=core, tag="cb", start=n_corpus
            )
        )
        idx_path = f"{root}/band_index"
        write_minhash_band_index(
            minhash_band_index(corpus, "doc_id", "text"), idx_path
        )
        band_index = spark.read.parquet(idx_path)

        delta_uniform = _synth_docs(
            spark, n_delta, tag="u", start=10_000_000
        )
        # hot delta: half the rows share the boilerplate core -> one band
        # key holds ~2000x the rows of any uniform key (>= the planted 100x)
        delta_hot = _synth_docs(
            spark, n_delta // 2, tag="h", start=20_000_000
        ).unionAll(
            _synth_docs(
                spark, n_delta // 2, core=core, tag="hb", start=21_000_000
            )
        )
        # under-cap regime: a SECOND corpus whose boilerplate group sits
        # just under the build-time bucket cap (60 < 64), so the hot delta
        # actually fans out (hot_rows x 60 candidate pairs -> Jaccard
        # verification) instead of being dropped at build
        core2 = " ".join(f"cap{i} under{i}" for i in range(15))
        corpus_undercap = _synth_docs(spark, n_corpus, tag="c").unionAll(
            _synth_docs(spark, 60, core=core2, tag="cu", start=n_corpus)
        )
        idx2_path = f"{root}/band_index_undercap"
        write_minhash_band_index(
            minhash_band_index(corpus_undercap, "doc_id", "text"), idx2_path
        )
        band_index2 = spark.read.parquet(idx2_path)
        delta_hot_undercap = _synth_docs(
            spark, n_delta // 2, tag="h2", start=22_000_000
        ).unionAll(
            _synth_docs(
                spark, n_delta // 2, core=core2, tag="h2b", start=23_000_000
            )
        )

        for label, delta, cp, bi in (
            ("uniform", delta_uniform, corpus, band_index),
            ("hot", delta_hot, corpus, band_index),
            ("hot_undercap", delta_hot_undercap, corpus_undercap, band_index2),
        ):
            timed(
                f"incremental_dedup_{label}_delta",
                lambda d=delta, c=cp, b=bi: {
                    "rows": incremental_minhash_dedup(
                        d, c, "doc_id", "text", band_index=b
                    ).count()
                },
            )
        u = out["incremental_dedup_uniform_delta"]["sec"]
        for label in ("hot", "hot_undercap"):
            out[f"band_{label}_over_uniform"] = round(
                out[f"incremental_dedup_{label}_delta"]["sec"] / max(u, 1e-9), 2
            )

        n_vec = int(100_000 * args.scale)
        vecs = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.pmod(
                    F.xxhash64(F.col("id") * 64 + i), F.lit(1000)
                ).cast("double")
                / 1000.0,
            ).alias("embedding"),
        )
        ivf_path = f"{root}/ivf"
        ivf_pq_write_index(vecs, "vec_id", "embedding", ivf_path)
        n_probe = int(400 * args.scale)
        probes_uniform = vecs.filter(
            F.col("vec_id") % (n_vec // max(n_probe, 1)) == 0
        ).limit(n_probe)
        # hot: every probe is (a copy of) vector 0 == cell-0 centroid, so
        # ALL probes route to the same nprobe cells
        v0 = vecs.filter(F.col("vec_id") == 0).select("embedding")
        probes_hot = (
            spark.range(n_probe)
            .select((F.col("id") + 30_000_000).alias("vec_id"))
            .crossJoin(F.broadcast(v0))
        )
        for label, probes in (
            ("uniform", probes_uniform),
            ("hot_cell", probes_hot),
        ):
            timed(
                f"ivf_indexed_topk_{label}",
                lambda p=probes: {
                    "rows": ivf_pq_indexed_topk(
                        spark, ivf_path, p, "vec_id", "embedding", k=10
                    ).count()
                },
            )
        u, h = (
            out["ivf_indexed_topk_uniform"]["sec"],
            out["ivf_indexed_topk_hot_cell"]["sec"],
        )
        out["ivf_hot_over_uniform"] = round(h / max(u, 1e-9), 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--driver-memory", default="8g")
    ap.add_argument(
        "--mode",
        choices=["joins", "index"],
        default="joins",
        help="joins = the round-5 salted/AQE probe; index = the round-12 "
        "persisted-index hot-key probe",
    )
    args = ap.parse_args()

    from remote_shuffle_spark import EngineConfig, get_session
    from remote_shuffle_spark.operators.joins import interval_overlap_join
    from remote_shuffle_spark.plans.shuffle_policy import salted_join

    spark = get_session(EngineConfig(app_name="skew_probe", driver_memory=args.driver_memory))

    if args.mode == "index":
        out: dict[str, object] = {"mode": "index", "scale": args.scale}

        def timed(name, fn):
            t0 = time.perf_counter()
            res = fn()
            out[name] = {"sec": round(time.perf_counter() - t0, 2), **res}
            print(f"  {name}: {out[name]}", file=sys.stderr)

        index_paths_mode(spark, args, out, timed)
        print(json.dumps(out))
        return

    n = int(5_000_000 * args.scale)
    events = synth_skewed_events(spark, n, users=20_000, hot_frac=args.hot_frac)
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("ue"))
    # force the dim past the broadcast path so the join actually shuffles
    # (the regime salting is for: right too big/mid to broadcast)
    dim = dim.hint("merge")

    out: dict[str, object] = {
        "scale": args.scale,
        "n_events": n,
        "hot_frac": args.hot_frac,
    }

    def timed(name, fn):
        t0 = time.perf_counter()
        res = fn()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), **res}
        print(f"  {name}: {out[name]}", file=sys.stderr)

    left = events.select("event_id", "user_id")

    # plain sort-merge join under AQE (skew-split enabled by EngineConfig)
    timed(
        "plain_aqe_join",
        lambda: {
            "rows": left.join(dim, "user_id").count(),
            **partition_balance(left.repartition(32, "user_id")),
        },
    )
    # salted: per-row unique salt (event_id) — the documented hot-dup fix
    timed(
        "salted_join",
        lambda: {
            "rows": salted_join(
                left,
                dim,
                "user_id",
                salt_buckets=8,
                salt_expr=F.col("event_id"),
            ).count(),
            **partition_balance(
                left.withColumn(
                    "_salt", F.pmod(F.col("event_id"), F.lit(8))
                ).repartition(32, "user_id", "_salt")
            ),
        },
    )

    # interval-overlap with the hot key: intervals on user 0 all coincide
    lhs = events.select(
        "user_id",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + 600_000_000).alias("end"),
    )
    rhs = events.filter(F.col("event_id") % 50 == 0).select(
        "user_id",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + 1_800_000_000).alias("end"),
    )
    timed(
        "interval_overlap_join_skewed",
        lambda: {
            "pairs": interval_overlap_join(
                lhs, rhs, on=["user_id"], chunk_us=1_800_000_000
            ).count()
        },
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
