"""Plan probe for the per-generation corpus-hash-set shape of the
two-generation ingest loops (ext_dedup_index_refresh /
ext_stream_ingest_dedup).

Reproduces generation 2's `incremental_minhash_dedup` call (the
ext_dedup_index_refresh splits, materialize=False so the eager
checkpoints don't execute the subplan before it can be inspected) with
the corpus-hash set built both ways:

  before  ch1.union(hashes(new1)).distinct()        -- r14 shape
  after   ch1.union(hashes(new1, distinct=False))   -- plain union (r15)

and dumps both formatted physical plans.  The claim under test
(VERDICT r14, next-round item 1): the right side of the exact tier's
LEFT-ANTI join tolerates duplicate keys, so the `.distinct()` is pure
overhead — dropping it removes the per-generation Exchange +
HashAggregate over the unioned O(corpus) hash set from the plan.

Usage: python scripts/ingest_hashset_plan_probe.py <outdir> [sf_dir]
Writes <outdir>/ingest_hashset_g2_{before,after}.txt and prints the
Exchange / HashAggregate node counts of each.
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from remote_shuffle_spark import EngineConfig, get_session
from remote_shuffle_spark.operators.dedup import (
    corpus_text_hashes,
    incremental_minhash_dedup,
    minhash_band_index,
    write_minhash_band_index,
)
from remote_shuffle_spark.plans.explain import physical_plan
from remote_shuffle_spark.sources.tables import load_table


def node_count(plan: str, op: str) -> int:
    return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(
        EngineConfig(app_name="ingest_hashset_plan_probe", driver_memory="8g")
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(~F.pmod(F.col("doc_id"), F.lit(10)).isin(3, 7))
    delta1 = docs.filter(F.col("doc_id") % 10 == 3)
    delta2 = docs.filter(F.col("doc_id") % 10 == 7)

    path = os.path.join(tempfile.gettempdir(), f"hashprobe_{uuid.uuid4().hex}")
    import shutil

    try:
        write_minhash_band_index(
            minhash_band_index(corpus, "doc_id", "text"), path, num_files=4
        )
        index = spark.read.parquet(path)
        ch1 = corpus_text_hashes(corpus, "text").localCheckpoint(eager=False)
        # g1 anti-join materializes ch1, as in the declared query
        r1 = incremental_minhash_dedup(
            delta1, corpus, "doc_id", "text", band_index=index, corpus_hashes=ch1
        ).localCheckpoint(eager=True)
        new1 = delta1.join(
            r1.filter(F.col("status") == "new").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        corpus2 = corpus.unionAll(new1)

        shapes = {
            "before": ch1.union(corpus_text_hashes(new1, "text")).distinct(),
            "after": ch1.union(
                corpus_text_hashes(new1, "text", distinct=False)
            ),
        }
        for name, ch2 in shapes.items():
            g2 = incremental_minhash_dedup(
                delta2,
                corpus2,
                "doc_id",
                "text",
                band_index=index,
                corpus_hashes=ch2,
                materialize=False,
            )
            plan = physical_plan(g2)
            out = os.path.join(outdir, f"ingest_hashset_g2_{name}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(
                f"{name}: Exchange={node_count(plan, 'Exchange')} "
                f"HashAggregate={node_count(plan, 'HashAggregate')} "
                f"BroadcastExchange={node_count(plan, 'BroadcastExchange')} "
                f"-> {out}",
                flush=True,
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
