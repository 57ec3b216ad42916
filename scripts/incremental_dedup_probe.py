"""Delta-proportionality probe for incremental MinHash dedup against a
persisted band index (operators/dedup.py:incremental_minhash_dedup).

The claim under test (round-10 verdict item #4): once the corpus band
index is materialized, deduping an arriving delta costs ~∝ DELTA, not
corpus — the engine-side analog of the reference's persisted-and-reused
map outputs.  The probe builds indexes over synthetic corpora at 1x and
10x, then dedups the SAME fixed-size delta against both on the
small-delta pushdown path (collected delta band keys pushed as an IN
filter into the bkey-sorted index scan, so parquet row-group/file
min-max stats skip the non-matching bulk) and reports the wall ratio.
PASS = the 10x-corpus dedup wall is < 3x the 1x wall (index build cost
excluded — it is the once-per-snapshot amortized step, reported
separately; a full re-dedup would instead scale ~10x with the corpus).

Synthetic inputs are generated distributed and deterministic (hash-
derived vocab picks, spark.range — no driver-side data).

Usage: python scripts/incremental_dedup_probe.py [--base 20000] [--delta 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from remote_shuffle_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_band_index,
    write_minhash_band_index,
)
from remote_shuffle_spark.session import get_session


def synth_corpus(spark, n: int):
    """n docs of 40 hash-picked words over a 4000-word vocabulary —
    diverse enough that band buckets stay small (no degenerate cap
    hits), deterministic for a given n."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(4000))
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def synth_delta(spark, corpus, n_delta: int, id_off: int = 10_000_000):
    """Fixed-size delta: half near-copies of the first corpus docs (every
    13th token replaced — jaccard ~0.85), half fresh docs."""
    half = n_delta // 2
    near = (
        corpus.filter(F.col("doc_id") < half)
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t, i: F.when(
                        i % 13 == 0,
                        F.concat(F.lit("e"), F.col("doc_id"), F.lit("p"), i),
                    ).otherwise(t),
                ),
            ).alias("text"),
        )
        .select((F.col("doc_id") + id_off).alias("doc_id"), "text")
    )
    fresh_words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("f"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(4000))
        ),
    )
    fresh = spark.range(half).select(
        (F.col("id") + id_off + half).alias("doc_id"),
        F.concat_ws(" ", fresh_words).alias("text"),
    )
    return near.unionAll(fresh)


def run_once(spark, n_corpus: int, n_delta: int) -> dict:
    corpus = synth_corpus(spark, n_corpus).localCheckpoint(eager=True)
    delta = synth_delta(spark, corpus, n_delta).localCheckpoint(eager=True)
    idx_path = os.path.join(
        tempfile.gettempdir(), f"rss_incprobe_{uuid.uuid4().hex[:8]}"
    )
    t0 = time.monotonic()
    write_minhash_band_index(
        minhash_band_index(corpus, "doc_id", "text"), idx_path, num_files=32
    )
    build_s = time.monotonic() - t0
    index = spark.read.parquet(idx_path)

    t0 = time.monotonic()
    res = (
        incremental_minhash_dedup(
            delta,
            corpus,
            "doc_id",
            "text",
            band_index=index,
            pushdown_keys_limit=50_000,
        )
        .groupBy("status")
        .count()
        .collect()
    )
    dedup_s = time.monotonic() - t0
    import shutil

    shutil.rmtree(idx_path, ignore_errors=True)
    return {
        "corpus": n_corpus,
        "delta": n_delta,
        "index_build_s": round(build_s, 2),
        "delta_dedup_s": round(dedup_s, 2),
        "statuses": {r["status"]: r["count"] for r in res},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=20_000)
    ap.add_argument("--delta", type=int, default=200)
    args = ap.parse_args()
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    r1 = run_once(spark, args.base, args.delta)
    r10 = run_once(spark, args.base * 10, args.delta)
    ratio = r10["delta_dedup_s"] / max(r1["delta_dedup_s"], 1e-9)
    out = {
        "probe": "incremental_minhash_delta_proportional",
        "at_1x": r1,
        "at_10x": r10,
        "dedup_wall_ratio_10x": round(ratio, 2),
        "pass": ratio < 3.0,
    }
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
