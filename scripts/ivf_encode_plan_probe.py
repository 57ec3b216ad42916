"""Dump the physical plan of the IVFADC ENCODE stage (similarity._ivf_encode)
— the stage shared by ivf_pq_write_index and ivf_pq_upsert, whose final
frame in the declared queries is checkpoint-backed (so dump_plans.py shows
only a LogicalRDD scan).  This probe explains the encode frame itself, the
surface the wave-4 optimization claims reference.

Usage: python scripts/ivf_encode_plan_probe.py <outfile>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from remote_shuffle_spark import EngineConfig, get_session
    from remote_shuffle_spark.operators import similarity as S
    from remote_shuffle_spark.plans.explain import physical_plan
    from remote_shuffle_spark.sources.tables import load_table

    spark = get_session(EngineConfig(app_name="ivf_encode_plan", driver_memory="8g"))
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 3)
    qdf = corpus.select(
        F.col("vec_id").alias("_id"), S._ivfq("embedding", 127).alias("_q")
    )
    cellc = (
        qdf.orderBy("_id")
        .limit(8)
        .select(F.col("_id").alias("cid"), F.col("_q").alias("cv"))
        .localCheckpoint(eager=True)
    )
    d_sub = 64 // 8
    cents = (
        qdf.orderBy("_id")
        .limit(16)
        .select(
            F.col("_id").alias("j"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda s: F.slice(F.col("_q"), s * d_sub + 1, d_sub),
                )
            ).alias("s", "cv"),
        )
        .localCheckpoint(eager=True)
    )
    codes = S._ivf_encode(qdf, cellc, cents, m=8, d_sub=d_sub)
    txt = physical_plan(codes)
    with open(out, "w") as fh:
        fh.write(txt)
    n_ex = txt.count("Exchange")
    print(f"wrote {out} ({len(txt)} bytes, {n_ex} Exchange nodes)", file=sys.stderr)


if __name__ == "__main__":
    main()
