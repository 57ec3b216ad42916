"""Shuffle-throughput parity bench — the PySpark analog of the reference's
PerformanceEvaluationTool (doc-only benchmark CLI, README.md:154-206: its
sample run is the ONLY performance number the reference publishes).

Reference geometry: 210 mappers x 70 reducers, random (incompressible)
records, measuring the shuffle WRITE phase and the shuffle READ phase
separately (README.md:178-206 reports 1429 MB/s write / 2534 MB/s read
raw on DAOS).  This harness reproduces that shape Spark-first:

- records are generated distributed (``spark.range`` + xxhash64 payload —
  pseudo-random longs compress ~0%, matching the tool's random blocks;
  no driver-side data);
- one hash-partition exchange (``repartition(R, key)``) — the same
  hash-partitioner geometry the tool drives through the plugin's writer;
- the map stage IS the shuffle-write phase and the reduce stage (noop
  sink) IS the shuffle-read phase; per-stage wall and bytes come from
  Spark's own stage metrics (UI REST API), so write/read throughput are
  measured independently, exactly like the tool's two passes.

Usage: python scripts/shuffle_bench.py [--gb 12.3] [--mappers 210]
       [--reducers 70] [--payload-longs 128]

Prints ONE JSON line with raw/stored bytes and MB/s per phase.  "raw" =
logical record bytes (the tool's "raw"), "stored" = post-serialization
compressed shuffle bytes (the tool's "stored").
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from datetime import datetime, timezone


def _rest(ui_url: str, app_id: str, path: str):
    with urllib.request.urlopen(f"{ui_url}/api/v1/applications/{app_id}/{path}") as r:
        return json.loads(r.read())


def _ts(s: str) -> float:
    # REST timestamps look like "2026-08-13T08:40:00.123GMT"
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=12.3, help="raw GB through the shuffle "
                    "(reference ran 123 GB; default is its 0.1x)")
    ap.add_argument("--mappers", type=int, default=210)
    ap.add_argument("--reducers", type=int, default=70)
    ap.add_argument("--payload-longs", type=int, default=128,
                    help="longs per record (~1 KB rows; the reference used "
                    "8 MB blocks, but Spark shuffles rows, not blocks)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    raw_bytes_per_row = 8 + 8 * args.payload_longs  # id + payload
    rows = int(args.gb * (1 << 30) / raw_bytes_per_row)

    spark = (
        SparkSession.builder.master(None or f"local[{__import__('os').cpu_count()}]")
        .appName("shuffle_bench")
        # AQE off: keep the clean 2-stage map/reduce geometry the
        # reference tool measures (AQE would coalesce the read side and
        # blur the phase boundary)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(args.reducers))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # payload: one xxhash64 seed per row XORed with a distinct 64-bit
    # constant per element position — pseudo-random to lz4 (no 4-byte
    # repeats within or across rows; stored ≈ raw, like the tool's random
    # blocks), overflow-free under ANSI mode, and near-zero compute so the
    # write phase measures the shuffle, not the generator.  The reference
    # tool likewise reused one random buffer per record (near-zero
    # generation cost inside its timed write phase).
    seed = F.xxhash64(F.col("id"))
    mix = 0x9E3779B97F4A7C15
    consts = []
    x = 0x243F6A8885A308D3
    for _ in range(args.payload_longs):
        x = (x * 6364136223846793005 + mix) & 0xFFFFFFFFFFFFFFFF
        consts.append(x - (1 << 64) if x >= (1 << 63) else x)
    payload = F.array(*[seed.bitwiseXOR(F.lit(c)) for c in consts])
    gen = spark.range(0, rows, 1, args.mappers).select("id", payload.alias("payload"))

    # calibration: generation-only pass (no exchange) — its wall bounds
    # how much of the write phase is the generator; also warms JIT
    t0 = time.perf_counter()
    gen.write.format("noop").mode("overwrite").save()
    gen_wall = time.perf_counter() - t0

    df = gen.repartition(args.reducers, F.col("id"))
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    total_wall = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    ui_url = spark.sparkContext.uiWebUrl
    stages = _rest(ui_url, app_id, "stages?status=complete")
    write_stage = max(stages, key=lambda s: s.get("shuffleWriteBytes", 0))
    read_stage = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))

    def phase(stage, byte_key):
        wall = _ts(stage["completionTime"]) - _ts(stage["submissionTime"])
        stored = stage[byte_key]
        raw = rows * raw_bytes_per_row
        return {
            "wall_s": round(wall, 2),
            "raw_mb": round(raw / 1e6, 1),
            "stored_mb": round(stored / 1e6, 1),
            "raw_mb_s": round(raw / 1e6 / wall, 1),
            "stored_mb_s": round(stored / 1e6 / wall, 1),
        }

    result = {
        "metric": "shuffle_throughput",
        "unit": "MB/s",
        "geometry": {
            "mappers": args.mappers,
            "reducers": args.reducers,
            "rows": rows,
            "raw_bytes_per_row": raw_bytes_per_row,
            "raw_gb": round(rows * raw_bytes_per_row / (1 << 30), 2),
        },
        "write": phase(write_stage, "shuffleWriteBytes"),
        "read": phase(read_stage, "shuffleReadBytes"),
        "generation_only_wall_s": round(gen_wall, 2),
        "total_wall_s": round(total_wall, 2),
        "reference": {  # README.md:178-206 sample run (123 GB on DAOS)
            "write_raw_mb_s": 1429.07,
            "read_raw_mb_s": 2533.67,
        },
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
