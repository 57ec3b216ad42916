"""Scale probe: run the headline operators on synthetic data 10-100x the
sf0.1 fixtures to verify the shapes hold beyond fixture scale (results
recorded in docs/scale.md).

Synthetic inputs are generated distributed (spark.range + expressions —
no driver-side data), deterministic (hash-derived), and sized by
--scale.  This is an operator stress probe, not the correctness gate:
the driver's fixtures stay the only query inputs.

Usage: python scripts/scale_probe.py [--scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth_docs(spark, n: int, dup_fraction: float = 0.01):
    """n docs of ~40 vocab words; ~dup_fraction exact duplicates.

    The duplicate SEED COUNT scales with the corpus so planted group size
    stays ~206 (< the probes' max_bucket_size=256): with a fixed seed
    count, groups at --scale 25 grew past the hot-bucket cap and the
    guard (correctly) dropped every planted pair — the probe measured
    nothing.  ~206/group keeps pair counts linear in docs, which is what
    the pair-driven scaling judgment needs, and reproduces the recorded
    5x/10x corpora exactly (both resolve to the historical 97 seeds)."""
    vocab = 500
    n_dups = int(n * dup_fraction)
    seeds = max(97, n_dups // 206)
    every = int(1 / dup_fraction)
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # duplicate docs share a content seed; the seed is keyed on the
        # dup INDEX (id/every), not the raw id — raw multiples of `every`
        # cover only seeds/gcd(every, seeds) residues, silently collapsing
        # the group count (and blowing group size past the bucket cap)
        F.when(
            F.col("id") % every == 0, (F.col("id") / every).cast("long") % seeds
        ).otherwise(F.col("id")).alias("seed"),
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda k: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("seed"), k), F.lit(vocab))),
    )
    return base.select("doc_id", F.concat_ws(" ", words).alias("text"))


def synth_events(spark, n: int, users: int = 20_000):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(users)).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 50_000
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("error")),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10_000)) / 100.0).alias("value"),
    )


def synth_embeddings(spark, n: int, dim: int = 64):
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda k: (F.pmod(F.xxhash64(F.col("id"), k), F.lit(2_000_001)) - 1_000_000)
        / 1_000_000.0,
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


_ONLY: str | None = None


def probe(name, fn):
    if _ONLY is not None and not any(tok in name for tok in _ONLY.split(",")):
        return name, None, "skipped"
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {name}: {dt:.1f}s {out}", file=sys.stderr)
    return name, round(dt, 1), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    # local mode is ONE JVM for driver + all executor threads, so broadcast
    # builds compete with execution memory in a way a cluster driver never
    # sees; at --scale 10 the (cluster-correct, dictionary-sized) bigram-LM
    # broadcast needs headroom beyond the 8g throughput sweet spot
    ap.add_argument("--driver-memory", default="8g")
    ap.add_argument("--only", default=None, help="substring filter on probe names")
    args = ap.parse_args()
    s = args.scale
    global _ONLY
    _ONLY = args.only

    from remote_shuffle_spark import EngineConfig, get_session
    from remote_shuffle_spark.operators import dedup, joins, similarity
    from remote_shuffle_spark.streaming.sessionize import sessionize_batch

    # 8g: enough for the 5M-row shuffle-hash builds; bigger heaps measured
    # slower on this VM (see EngineConfig.driver_memory).  Shuffle
    # partitions scale with the input — the docs/scale.md sizing rule,
    # practiced: at --scale 10 the 50M-event shuffle-hash build OOMs the
    # fixture-sized 32 partitions (measured), while 32*ceil(scale)
    # keeps every per-partition build bounded and AQE coalesces the
    # small stages back down.
    import math

    spark = get_session(
        EngineConfig(
            driver_memory=args.driver_memory,
            shuffle_partitions=32 * max(1, math.ceil(s)),
        )
    )
    results = []

    docs = synth_docs(spark, int(200_000 * s))
    events = synth_events(spark, int(5_000_000 * s))
    emb = synth_embeddings(spark, int(200_000 * s))

    results.append(
        probe(
            "exact_dedup_200k_docs",
            lambda: {
                "dup_groups": dedup.exact_duplicates(docs, "doc_id", "text")
                .filter(F.col("dup_count") >= 2)
                .count()
            },
        )
    )
    results.append(
        probe(
            "minhash_200k_docs",
            lambda: {
                "pairs": dedup.minhash_candidates(
                    docs, "doc_id", "text", max_bucket_size=256
                ).count()
            },
        )
    )
    results.append(
        probe(
            "simhash_200k_docs",
            lambda: {
                "pairs": dedup.simhash_near_duplicates(
                    docs, "doc_id", "text", max_bucket_size=256
                ).count()
            },
        )
    )
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    results.append(
        probe(
            "asof_join_5m_events",
            lambda: {
                "rows": joins.asof_join(
                    clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
                    right_values=["value"],
                ).count()
            },
        )
    )
    errors = events.filter(F.col("event_type") == "error")
    results.append(
        probe(
            "range_join_5m_events",
            lambda: {
                "pairs": joins.range_join(
                    errors, events, on=["user_id"], left_ts="ts", right_ts="ts",
                    lower_us=-60_000_000, upper_us=60_000_000, right_values=[],
                ).count()
            },
        )
    )
    results.append(
        probe(
            "sessionize_5m_events",
            lambda: {"sessions": sessionize_batch(events, gap_minutes=30.0).count()},
        )
    )
    q = emb.filter(F.col("vec_id") == 0)
    results.append(
        probe(
            "bruteforce_topk_200k_vecs",
            lambda: {
                "top1": similarity.brute_force_topk(
                    emb, "vec_id", "embedding", q, k=10
                ).collect()[0].vec_id
            },
        )
    )

    # training-pipeline operators (round-1 additions)
    from remote_shuffle_spark.functions.hashing import tokens
    from remote_shuffle_spark.operators.pipeline import chunk_sequences, pack_sequences
    from remote_shuffle_spark.operators.text import repetition_features, tf_idf

    weighted = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    results.append(
        probe(
            "chunk_sequences_200k_docs",
            lambda: {
                "seqs": chunk_sequences(weighted, "doc_id", "n_tok", budget=2048)
                .agg(F.max("seq_id")).collect()[0][0]
            },
        )
    )
    results.append(
        probe(
            "pack_sequences_200k_docs",
            lambda: {
                "rows": pack_sequences(weighted, "doc_id", "n_tok", budget=2048).count()
            },
        )
    )
    results.append(
        probe(
            "tf_idf_200k_docs",
            lambda: {"doc_terms": tf_idf(docs, "doc_id", "text").count()},
        )
    )
    results.append(
        probe(
            "repetition_200k_docs",
            lambda: {"docs": repetition_features(docs, "doc_id", "text").count()},
        )
    )
    new_half = docs.filter(F.col("doc_id") % 2 == 1)
    corpus_half = docs.filter(F.col("doc_id") % 2 == 0)
    results.append(
        probe(
            "incremental_dedup_200k_docs",
            lambda: {
                "new": dedup.incremental_new_texts(new_half, corpus_half, "text").count()
            },
        )
    )
    # round-3 operators
    from remote_shuffle_spark.operators.funnel import funnel_counts
    from remote_shuffle_spark.operators.stats import chi_square_independence
    from remote_shuffle_spark.operators.text import bigram_lm_scores, bm25_scores

    n_vec = int(200_000 * s)
    k_cells = max(16, int(n_vec ** 0.5))  # docs/scale.md: K ~ sqrt(corpus)
    results.append(
        probe(
            f"semantic_dedup_{n_vec}_vecs_K{k_cells}",
            lambda: {
                "kept": dedup.semantic_dedup(
                    emb, "vec_id", "embedding",
                    threshold=0.95, num_cells=k_cells, max_cell_size=4096,
                ).count()
            },
        )
    )
    def _semantic_decontam_probe():
        # embedding-space decontamination (r13 verdict item 5): eval side
        # is a FIXED-size benchmark (10k vectors, the operator's actual
        # contract — a probe that grows eval with the corpus measures
        # n^2/K, not the operator), broadcast as per-cell matrices; the
        # train corpus streams through mapInPandas — wall should track
        # the train row count.
        from remote_shuffle_spark.operators.decontam import semantic_contamination_hits
        from remote_shuffle_spark.operators.similarity import seed_centroids

        cents = seed_centroids(emb, "vec_id", "embedding", k=k_cells)
        hits = semantic_contamination_hits(
            emb.filter(F.col("vec_id") >= 10_000),
            emb.filter(F.col("vec_id") < 10_000),
            cents,
            id_col="vec_id",
            vec_col="embedding",
            threshold=0.35,
        )
        return {"flagged": hits.count()}

    results.append(
        probe(f"semantic_decontam_{n_vec}_vecs_K{k_cells}", _semantic_decontam_probe)
    )
    results.append(
        probe(
            "bm25_200k_docs",
            lambda: {
                "scored": bm25_scores(
                    docs, "doc_id", "text", ("w1", "w2", "w3", "w4")
                ).count()
            },
        )
    )
    results.append(
        probe(
            "bigram_lm_200k_docs",
            lambda: {"scored": bigram_lm_scores(docs, "doc_id", "text").count()},
        )
    )
    results.append(
        probe(
            "funnel_5m_events",
            lambda: {
                "steps": funnel_counts(events, ("view", "click", "error")).collect()[0].asDict()
            },
        )
    )
    names = docs.select(
        "doc_id",
        F.concat(F.lit("entity-record-"), F.lpad(F.col("doc_id").cast("string"), 9, "0")).alias("nm"),
    )
    results.append(
        probe(
            "fuzzy_join_200k_names",
            lambda: {
                "pairs": joins.fuzzy_self_join_blocked(
                    names, "doc_id", "nm", block_prefix=19, max_distance=1
                ).count()
            },
        )
    )
    ev_labeled = events.select(
        "event_type", F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(20)).alias("shard")
    )
    results.append(
        probe(
            "chi_square_5m_events",
            lambda: {
                "chi2": chi_square_independence(ev_labeled, "event_type", "shard")
                .collect()[0].chi2
            },
        )
    )
    # round-4 additions: the two operators whose scale behavior the round-3
    # review flagged as the open question — iterative CC (job-count growth)
    # and IVF probe (centroid-count crossover)
    from remote_shuffle_spark.operators.graph import near_duplicate_groups

    results.append(
        probe(
            "dedup_groups_200k_docs",
            lambda: {
                "groups": near_duplicate_groups(
                    docs, "doc_id", "text", max_bucket_size=256
                )
                .filter(~F.col("is_keeper"))
                .count()
            },
        )
    )
    k_ivf = max(16, int(n_vec ** 0.5))
    results.append(
        probe(
            f"ivf_topk_{n_vec}_vecs_K{k_ivf}",
            lambda: {
                "top1": similarity.ivf_topk(
                    emb, "vec_id", "embedding", q,
                    k=10, num_cells=k_ivf, nprobe=max(4, k_ivf // 16),
                ).collect()[0].vec_id
            },
        )
    )
    results.append(
        probe(
            f"lsh_topk_{n_vec}_vecs_r2",
            lambda: {
                "top1": similarity.lsh_topk(
                    emb, "vec_id", "embedding", q,
                    k=10, dim=64, num_planes=12, hamming_radius=2,
                ).collect()[0].vec_id
            },
        )
    )
    from remote_shuffle_spark.operators.joins import interval_overlap_join

    results.append(
        probe(
            f"interval_overlap_{int(5_000_000 * s)}_events",
            lambda: {
                "pairs": interval_overlap_join(
                    events.select(
                        "user_id",
                        F.unix_micros("ts").alias("start"),
                        (F.unix_micros("ts") + 600_000_000).alias("end"),
                    ),
                    events.filter(F.col("event_type") == "error").select(
                        "user_id",
                        F.unix_micros("ts").alias("start"),
                        (F.unix_micros("ts") + 1_800_000_000).alias("end"),
                    ),
                    on=["user_id"],
                    chunk_us=1_800_000_000,
                ).count()
            },
        )
    )
    # pigeonhole-segment fuzzy join (round 6): high-entropy 12-char hex
    # strings keep blocks small (16^4 key space per segment), and every
    # 100th row is a PLANTED distance-2 partner of its predecessor (two
    # substitutions, one in the first segment and one in the last — the
    # exact pair class prefix/suffix blocking cannot see), so recalled
    # pairs scale linearly with rows and the probe measures the full
    # emit → block → verify pipeline, not just guarded-away emission
    def _fuzzy_segments_corpus(n: int):
        seed = F.col("id") - F.when(F.col("id") % 100 == 1, 1).otherwise(0)
        base = F.lower(F.lpad(F.hex(F.xxhash64(seed)), 16, "0")).substr(1, 12)
        edited = F.concat(
            base.substr(1, 3), F.lit("z"), base.substr(5, 5), F.lit("z"), base.substr(11, 2)
        )
        return spark.range(n).select(
            F.col("id"),
            F.when(F.col("id") % 100 == 1, edited).otherwise(base).alias("txt"),
        )

    results.append(
        probe(
            f"fuzzy_segments_{int(100_000 * s)}_ids",
            lambda: {
                "pairs": joins.fuzzy_self_join_segments(
                    _fuzzy_segments_corpus(int(100_000 * s)),
                    "id",
                    "txt",
                    max_distance=2,
                    max_block_size=512,
                ).count()
            },
        )
    )
    # round-6 iterative family: pagerank + BFS over a synthetic bipartite
    # trade graph (distinct edges ~ n_edges; degree ~ uniform)
    from remote_shuffle_spark.operators import graph as graph_ops

    n_edges = int(1_000_000 * s)
    gedges = spark.range(n_edges).select(
        (F.pmod(F.xxhash64("id"), F.lit(int(15_000 * s))) * 2).alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(int(1_000 * s))) * 2 + 1).alias("dst"),
    )
    results.append(
        probe(
            f"pagerank_{n_edges}_edges",
            lambda: {
                "nodes": graph_ops.pagerank(gedges, iterations=5).count()
            },
        )
    )
    results.append(
        probe(
            f"pagerank_directed_{n_edges}_edges",
            lambda: {
                # directed: every dst-side node dangles (bipartite src→dst),
                # so the dangling scalar agg carries real mass per iteration
                "nodes": graph_ops.pagerank_directed(gedges, iterations=5).count()
            },
        )
    )
    results.append(
        probe(
            f"bfs_{n_edges}_edges",
            lambda: {
                "reached": graph_ops.bfs_levels(gedges, 1).count()
            },
        )
    )
    results.append(
        probe(
            f"knn_join_{int(200_000 * s)}_vecs_q16",
            lambda: {
                "rows": similarity.knn_join(
                    emb,
                    "vec_id",
                    "embedding",
                    emb.filter(F.col("vec_id") < 16),
                    "vec_id",
                    k=10,
                ).count()
            },
        )
    )
    results.append(
        probe(
            f"knn_join_lsh_{int(200_000 * s)}_vecs_q16_r2",
            lambda: {
                "rows": similarity.knn_join_lsh(
                    emb,
                    "vec_id",
                    "embedding",
                    emb.filter(F.col("vec_id") < 16),
                    "vec_id",
                    k=10,
                    dim=64,
                    num_planes=8,
                    hamming_radius=2,
                ).count()
            },
        )
    )
    def _zorder_skip_probe():
        import shutil
        import tempfile

        from remote_shuffle_spark.plans.zorder import ZDim, write_zordered

        n = int(5_000_000 * s)
        base = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id"), F.lit(20_000)).alias("user_id"),
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1024)).alias("bucket"),
            F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1_000_000)).alias("payload"),
        )
        d = tempfile.mkdtemp(prefix="rss_zprobe_")
        zdir, rdir = os.path.join(d, "z"), os.path.join(d, "r")
        write_zordered(
            base,
            zdir,
            [ZDim("user_id", 0, 65536), ZDim("bucket", 0, 65536)],
            bits=16,
            num_partitions=64,
        )
        base.repartition(64).write.mode("overwrite").parquet(rdir)
        box = "user_id between 100 and 200 and bucket between 100 and 200"
        lo_u, hi_u, lo_b, hi_b = 100, 200, 100, 200

        def rg_touching(path):
            # mechanism-true skipping measure: row groups whose (user_id,
            # bucket) min-max stats intersect the box — what parquet
            # pushdown actually reads (timing at cache-resident probe
            # scale is dominated by task overhead, not IO)
            import pyarrow.parquet as pq

            tot = hit = 0
            for f in os.listdir(path):
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(path, f)).metadata
                for rg in range(md.num_row_groups):
                    row = md.row_group(rg)
                    s = {
                        row.column(ci).path_in_schema: row.column(ci).statistics
                        for ci in range(row.num_columns)
                    }
                    tot += 1
                    if (
                        s["user_id"].min <= hi_u
                        and s["user_id"].max >= lo_u
                        and s["bucket"].min <= hi_b
                        and s["bucket"].max >= lo_b
                    ):
                        hit += 1
            return hit, tot

        out = {}
        for tag, path in (("zordered", zdir), ("random", rdir)):
            cnt = 0
            for rep in range(2):  # second pass = steady (warm code/cache)
                t0 = time.perf_counter()
                cnt = spark.read.parquet(path).filter(box).count()
                dt = round(time.perf_counter() - t0, 2)
            hit, tot = rg_touching(path)
            out[tag] = {"s": dt, "rows": cnt, "rg_read": hit, "rg_total": tot}
        shutil.rmtree(d, ignore_errors=True)
        assert out["zordered"]["rows"] == out["random"]["rows"]
        # the layout's whole point: a strict minority of row groups match
        assert out["zordered"]["rg_read"] * 2 < out["zordered"]["rg_total"]
        return out

    results.append(probe(f"zorder_skip_{int(5_000_000 * s)}_rows", _zorder_skip_probe))

    from remote_shuffle_spark.plans.shuffle_policy import salted_join

    results.append(
        probe(
            f"salted_join_{int(5_000_000 * s)}_events",
            lambda: {
                "rows": salted_join(
                    events.select("event_id", "user_id", "event_type"),
                    events.groupBy("user_id").agg(F.count(F.lit(1)).alias("ue")),
                    "user_id",
                    salt_buckets=8,
                    salt_expr=F.pmod(F.col("event_id"), F.lit(8)),
                ).count()
            },
        )
    )
    # round-8 additions: segment dedup (hash-keyed shuffle of 24-byte
    # rows), triangle counting (wedge-join growth is the open scale
    # question), quantized recall (two integer dots per pair, two-phase
    # top-k fan-in)
    results.append(
        probe(
            f"segment_dedup_{int(200_000 * s)}_docs",
            lambda: {
                "dropped": dedup.segment_dedup_stats(docs, "doc_id", "text")
                .agg(
                    (F.sum("n_segments") - F.sum("kept_segments")).alias("d")
                )
                .collect()[0].d
            },
        )
    )
    # bounded-degree co-occurrence graph (mean degree ~10 at every scale):
    # probes EDGE-linear growth of the wedge joins.  Degree is the knob
    # that must stay bounded for triangle counting to scale — a densifying
    # graph is Θ(m^1.5) regardless of engine (see triangle_count docstring
    # and the sliced ext_triangle_count demo).
    tri_edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(int(200_000 * s))).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(int(200_000 * s))).alias("dst"),
    )
    results.append(
        probe(
            f"triangle_count_{n_edges}_edges",
            lambda: {
                "triangles": graph_ops.triangle_count(tri_edges)
                .collect()[0].n_triangles
            },
        )
    )
    results.append(
        probe(
            f"label_propagation_{n_edges}_edges_3it",
            lambda: {
                "communities": graph_ops.label_propagation(tri_edges, iterations=3)
                .select("label")
                .distinct()
                .count()
            },
        )
    )
    results.append(
        probe(
            f"quantized_recall_{n_vec}_vecs_q16",
            lambda: {
                "mean_hits": similarity.quantization_recall_at_k(
                    emb,
                    "vec_id",
                    "embedding",
                    emb.filter(F.col("vec_id") < 16),
                    "vec_id",
                    k=10,
                )
                .agg(F.sum("hits").alias("h"))
                .collect()[0].h
            },
        )
    )
    # BPE training is VOCAB-bounded: wall should stay ~flat as the corpus
    # grows at fixed vocabulary (the first aggregation collapses to
    # (word, count)); this probe is the assertion behind the operator's
    # scale claim.
    from remote_shuffle_spark.operators.text import bpe_train

    results.append(
        probe(
            f"bpe_train_{int(200_000 * s)}_docs_3merges",
            lambda: {
                "merges": [
                    (r.pair_a, r.pair_b)
                    for r in bpe_train(docs, "doc_id", "text", num_merges=3)
                    .orderBy("round")
                    .collect()
                ]
            },
        )
    )
    # round-9 additions: the r8 analytics queries that lacked probes
    # (winnowing, cohort retention, session funnel, market basket,
    # rollup+topk) plus the new exact-substring dedup tier.  Each uses
    # the same algebra as its ext_ query, on synthetic inputs sized by
    # --scale, so sublinear/linear wall growth is measurable.
    from remote_shuffle_spark.operators.text import winnowing_fingerprints

    results.append(
        probe(
            f"winnowing_{int(200_000 * s)}_docs",
            lambda: {
                "fps": winnowing_fingerprints(
                    docs, "doc_id", "text", k=4, window=5
                ).count()
            },
        )
    )
    results.append(
        probe(
            f"exact_substring_dedup_{int(200_000 * s)}_docs",
            lambda: {
                "dup_tokens": dedup.exact_substring_dedup_stats(
                    docs, "doc_id", "text", window_tokens=20
                )
                .agg(F.sum("dup_tokens").alias("d"))
                .collect()[0].d
            },
        )
    )

    def _cohort_probe():
        daily = events.select(
            "user_id", F.to_date("ts").alias("day")
        ).distinct()
        cohort = daily.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
        return {
            "cells": daily.join(cohort, "user_id")
            .groupBy(
                "cohort_day",
                F.datediff("day", "cohort_day").alias("day_offset"),
            )
            .agg(F.countDistinct("user_id").alias("n_users"))
            .count()
        }

    results.append(probe(f"cohort_retention_{int(5_000_000 * s)}_events", _cohort_probe))

    def _funnel_probe():
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("ts")
        prev = F.lag("ts").over(w)
        ns = (
            prev.isNull()
            | (F.unix_micros("ts") - F.unix_micros(prev) > 30 * 60 * 1_000_000)
        ).cast("long")
        sx = events.withColumn("session_id", F.sum(ns).over(w))
        g = sx.groupBy("user_id", "session_id").agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("lc"),
        )
        conv = g.groupBy("user_id").agg(
            F.sum(
                F.when(F.col("fv").isNotNull() & (F.col("lc") > F.col("fv")), 1)
                .otherwise(0)
            ).alias("n_converted")
        )
        return {"users": conv.count()}

    results.append(probe(f"session_funnel_{int(5_000_000 * s)}_events", _funnel_probe))

    def _basket_probe():
        # baskets of 5 items over a 2000-item catalog: the pair self-join
        # is bounded by BASKET size (5 choose 2 per order), so pair rows —
        # and wall — must grow linearly with orders, not quadratically
        n = int(2_000_000 * s)
        op = spark.range(n).select(
            (F.col("id") / 5).cast("long").alias("ok"),
            F.pmod(F.xxhash64("id"), F.lit(2000)).alias("pk"),
        ).distinct()
        n_orders = op.select("ok").distinct().count()
        item = op.groupBy("pk").agg(F.count(F.lit(1)).alias("cnt"))
        pair = (
            op.alias("a")
            .join(op.alias("b"), "ok")
            .filter(F.col("a.pk") < F.col("b.pk"))
            .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
            .agg(F.count(F.lit(1)).alias("both_cnt"))
            .filter(F.col("both_cnt") >= 3)
        )
        out = (
            pair.join(item.select(F.col("pk").alias("pa"), F.col("cnt").alias("ca")), "pa")
            .join(item.select(F.col("pk").alias("pb"), F.col("cnt").alias("cb")), "pb")
            .select(
                "pa", "pb",
                ((F.lit(n_orders) * F.col("both_cnt")).cast("double")
                 / (F.col("ca") * F.col("cb"))).alias("lift"),
            )
        )
        return {"pairs": out.count()}

    results.append(probe(f"market_basket_{int(2_000_000 * s)}_items", _basket_probe))

    def _rollup_topk_probe():
        from pyspark.sql import Window as W

        n = int(5_000_000 * s)
        orders = spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(5)).alias("prio"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3)).alias("status"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)) / 100.0).alias("price"),
        )
        a = orders.rollup("prio", "status").agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.sum("price").alias("sum_price"),
        )
        w = W.partitionBy("lvl", "prio").orderBy(
            F.col("sum_price").desc(), F.col("status").asc_nulls_first()
        )
        return {
            "rows": a.withColumn("rk", F.rank().over(w))
            .filter(F.col("rk") <= 2)
            .count()
        }

    results.append(probe(f"rollup_topk_{int(5_000_000 * s)}_orders", _rollup_topk_probe))

    def _kcore_probe():
        n = int(1_000_000 * s)
        tree = spark.range(1, n).select(
            F.col("id").alias("src"),
            (F.col("id") / 2).cast("long").alias("dst"),
        )
        rows = graph_ops.kcore_peel(tree, 3, rounds=4).collect()
        return {"removed_by_round": [int(r.removed_vertices) for r in rows]}

    results.append(probe(f"kcore_{int(1_000_000 * s)}_node_tree_4r", _kcore_probe))

    from remote_shuffle_spark.operators.pipeline import assign_training_shards

    def _shard_probe():
        w = docs.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4096)).alias("w")
        )
        out = assign_training_shards(w, "doc_id", "w", n_shards=64)
        loads = out.groupBy("shard").agg(F.sum("w").alias("t")).collect()
        ts = [r.t for r in loads]
        return {"shards": len(ts), "spread": int(max(ts) - min(ts))}

    results.append(probe(f"shard_assign_{int(200_000 * s)}_docs", _shard_probe))

    from remote_shuffle_spark.operators.text import bpe_apply

    results.append(
        probe(
            f"bpe_apply_{int(200_000 * s)}_docs_3merges",
            lambda: {
                "ratio_pct": int(
                    bpe_apply(
                        docs, "doc_id", "text",
                        [("w", "1"), ("w", "2"), ("w", "3")],
                    )
                    .agg(
                        (
                            F.sum("symbols_bpe") * 100 / F.sum("symbols_char")
                        ).cast("long").alias("r")
                    )
                    .collect()[0].r
                )
            },
        )
    )

    results.append(
        probe(
            f"pq_recall_{n_vec}_vecs_q8",
            lambda: {
                "mean_hits": similarity.pq_recall_at_k(
                    emb,
                    "vec_id",
                    "embedding",
                    emb.filter(F.col("vec_id") < 8),
                    "vec_id",
                    k=10,
                )
                .agg(F.sum("hits").alias("h"))
                .collect()[0].h
            },
        )
    )

    results.append(
        probe(
            f"ivf_pq_{n_vec}_vecs_q8_nprobe2of8",
            lambda: (
                lambda rows: {
                    "scanned_frac_pct": int(
                        100 * sum(r.scanned for r in rows)
                        / (8 * (int(200_000 * s) - 1))
                    ),
                    "hits": sum(r.hits for r in rows),
                }
            )(
                similarity.ivf_pq_recall_at_k(
                    emb, "vec_id", "embedding",
                    emb.filter(F.col("vec_id") < 8), "vec_id",
                    k=10, num_cells=8, nprobe=2,
                ).collect()
            ),
        )
    )

    # tier-4 reality: near-dup grouping AFTER exact tiers — corpus = docs
    # plus ~1% near copies (tokens 0/19/38 edited, so no 20-token window
    # survives the exact tiers); bucket cap raised to clear the ~206-member
    # planted exact-dup groups that remain in the synth corpus
    def _neardup_probe():
        near = (
            docs.filter(F.col("doc_id") % 100 == 1)
            .select(
                "doc_id",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t, i: F.when(
                            i % 19 == 0,
                            F.concat(F.lit("e"), F.col("doc_id").cast("string")),
                        ).otherwise(t),
                    ),
                ).alias("text"),
            )
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        )
        comps = dedup.minhash_components_md5(
            docs.unionAll(near), "doc_id", "text", max_bucket_size=256
        )
        r = comps.agg(
            F.count(F.lit(1)).alias("v"),
            (F.count(F.lit(1)) - F.countDistinct("root")).alias("removed"),
        ).collect()[0]
        return {"vertices": r.v, "removed": r.removed}

    results.append(
        probe(f"neardup_md5_{int(200_000 * s)}_docs", _neardup_probe)
    )

    results.append(
        probe(
            f"substring_apply_{int(200_000 * s)}_docs",
            lambda: {
                "dup_tokens_m": int(
                    dedup.exact_substring_dedup_apply(
                        docs, "doc_id", "text", window_tokens=20
                    )
                    .agg(F.sum("dup_tokens").alias("t"))
                    .collect()[0].t
                    / 1_000_000
                )
            },
        )
    )

    def _exact_rank_probe():
        # r12 verdict item 3: the exact-rank family (gini / rfm / gap
        # percentiles) must stay bounded when ENTITY count grows 10x —
        # probe the two rank disciplines directly on a synthetic
        # per-entity profile (1M entities at scale 1), with heavy value
        # ties so the histogram actually collapses.
        from remote_shuffle_spark.operators.pipeline import with_global_index
        from remote_shuffle_spark.operators.stats import histogram_cdf

        n_ent = int(1_000_000 * s)
        prof = spark.range(n_ent).select(
            F.col("id").alias("user_id"),
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500_000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1000)).alias("freq"),
        )
        # decimal(38,0) accumulation, same as ext_gini_index: the long
        # form of SUM(i*x) overflows right at this probe's 10x point
        # (n^2 * E[x] / 2 > 2^63 near 1e7 entities) — which is exactly
        # why the query accumulates in decimal.
        hist = histogram_cdf(prof, "x")
        d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        g = hist.agg(
            F.sum("cnt").alias("n"),
            F.sum(
                d(F.col("x"))
                * (
                    d(F.col("cnt")) * d(F.col("cum") - F.col("cnt"))
                    + d(F.expr("cnt * (cnt + 1) div 2"))
                )
            ).alias("six"),
        ).collect()[0]
        ranked = with_global_index(
            prof.repartitionByRange(32, "freq", "user_id").sortWithinPartitions(
                "freq", "user_id"
            ),
            out_col="r",
            order_by=["freq", "user_id"],
        )
        mx = ranked.agg(F.max("r").alias("m")).collect()[0].m
        assert int(g.n) == n_ent and int(mx) == n_ent - 1
        return {"entities": n_ent}

    results.append(probe(f"exact_rank_{int(1_000_000 * s)}_entities", _exact_rank_probe))

    def _hist_distinct_probe(domain):
        # r13 verdict item 6: histogram_cdf's range-exchange width is no
        # longer a hard-coded 32 — it follows the session's shuffle
        # partitions (AQE-coalescible).  This probe grows the DISTINCT
        # value count 10x at fixed entity count (the axis the fixed width
        # left unbounded: per-partition window input ~ distinct/width)
        # and checks wall stays bounded and the running total stays exact.
        def run():
            from remote_shuffle_spark.operators.stats import histogram_cdf

            n_ent = int(1_000_000 * s)
            x = (
                F.col("id")  # every value distinct: |hist| == entities
                if domain is None
                else F.pmod(F.xxhash64("id", F.lit(7)), F.lit(domain))
            )
            prof = spark.range(n_ent).select(
                F.col("id").alias("user_id"), x.alias("x")
            )
            hist = histogram_cdf(prof, "x")
            g = hist.agg(
                F.sum("cnt").alias("n"),
                F.count(F.lit(1)).alias("nv"),
                F.max("cum").alias("mx"),
            ).collect()[0]
            assert int(g.n) == n_ent and int(g.mx) == n_ent
            return {"entities": n_ent, "distinct_values": int(g.nv)}

        return run

    for dom, tag in ((100_000, "100k"), (None, "all")):
        results.append(probe(f"hist_cdf_distinct_{tag}", _hist_distinct_probe(dom)))

    def _running_total_probe():
        # r14: budget-cut primitive (ext_token_budget_select /
        # ext_lang_budget_select / ext_curation_pipeline) — exact
        # inclusive prefix sums must stay two-phase (range partitions +
        # broadcast offsets, no corpus-wide window) as rows grow 10x, in
        # both the global and the per-stratum form.  Exactness asserted
        # against independently-computed totals.
        from remote_shuffle_spark.operators.pipeline import running_total

        n = int(1_000_000 * s)
        df = spark.range(n).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id", F.lit(11)), F.lit(97)) + 1).alias("w"),
            F.pmod(F.xxhash64("id", F.lit(13)), F.lit(1000)).alias("score"),
            F.pmod(F.xxhash64("id", F.lit(17)), F.lit(8)).cast("string").alias("lang"),
        )
        tot = int(df.agg(F.sum("w")).collect()[0][0])
        cum = running_total(df, "w", [F.col("score").desc(), F.col("id")])
        assert int(cum.agg(F.max("cum")).collect()[0][0]) == tot
        gcum = running_total(
            df, "w", [F.col("score").desc(), F.col("id")], partition_by=["lang"]
        )
        gmax = gcum.groupBy("lang").agg(F.max("cum").alias("m"))
        gtot = df.groupBy("lang").agg(F.sum("w").alias("t"))
        assert gmax.join(gtot, "lang").filter(F.col("m") != F.col("t")).count() == 0
        return {"rows": n, "strata": 8}

    results.append(
        probe(f"running_total_{int(1_000_000 * s)}_rows", _running_total_probe)
    )

    print(json.dumps({"scale": s, "probes": [(n, t) for n, t, _ in results]}))



if __name__ == "__main__":
    main()
