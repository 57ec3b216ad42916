"""Custom PYTHON DataSource (Spark 4 DataSource API) — the last source
surface next to the file formats in :mod:`sources.io`.

``rss_synth`` is a partitioned synthetic-telemetry generator: rows are a
PURE FUNCTION of the row index (documented congruences below), so the
source is (a) fully parallel — each ``InputPartition`` computes its own
index range, no driver data, the 100 TB shape for API-backed or
generated sources — and (b) externally reproducible: a SQL engine can
regenerate the identical rows from ``generate_series``, which is what
the declared query's DuckDB oracle does.  All arithmetic is integer and
stays far below 2⁶³ (id < 10⁶ ⇒ id·2654435761 < 2.7·10¹⁵), so no
overflow divergence between engines (the known id*PRIME trap).

Row model (id ∈ [0, n)):

    user_id = (id * 2654435761) % 999983 % users
    day     = id % 30
    metric  = (id * id) % 9973
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FORMAT_NAME = "rss_synth"
_MIX = 2654435761
_MOD = 999983
_METRIC_MOD = 9973


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("parts", 8))
        self.users = int(options.get("users", 500))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        lo = self.n * i // self.parts
        hi = self.n * (i + 1) // self.parts
        users = self.users
        for k in range(lo, hi):
            yield (k, (k * _MIX) % _MOD % users, k % 30, (k * k) % _METRIC_MOD)


class SynthTelemetrySource(DataSource):
    """spark.read.format("rss_synth").option("n", ...).option("parts", ...)"""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return "id bigint, user_id bigint, day int, metric bigint"

    def reader(self, schema):
        return _SynthReader(self.options)

    def simpleStreamReader(self, schema):
        return _SynthStreamReader(self.options)

    def writer(self, schema, overwrite):
        return _SynthSinkWriter(self.options, overwrite)


def register_synth_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SynthTelemetrySource)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the same row model: offsets are
    plain row positions, each micro-batch advances ``step`` rows until
    ``n`` — a bounded, exactly-replayable stream (readBetweenOffsets
    regenerates any range deterministically, which is precisely the
    replay contract Structured Streaming's WAL expects of a source)."""

    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.step = int(options.get("step", 2_500))
        self.users = int(options.get("users", 500))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST iterator, not a generator: the runner's prefetch cache
        # copy.copy()s and pickles the iterator, which generators can't
        # survive (TypeError: cannot pickle 'generator'); a batch is at
        # most ``step`` rows, so materializing is bounded by design
        users = self.users
        return iter(
            [
                (k, (k * _MIX) % _MOD % users, k % 30, (k * k) % _METRIC_MOD)
                for k in range(lo, hi)
            ]
        )

    def read(self, start):
        pos = start["pos"]
        end = min(self.n, pos + self.step)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["pos"], end["pos"])


# --------------------------------------------------------------- write path
#
# The WRITER half of the Python DataSource API (a separate planner path —
# PythonDataSourceWriter — from the readers above), implementing the same
# tmp+rename+manifest commit discipline as the engine's checkpoint_to /
# the reference's writeIndexFileAndCommit (RemoteShuffleUtils.scala): tasks
# write to a STAGING directory and return commit messages; only the
# driver-side commit() moves files into the target and stamps _SUCCESS, so
# a failed/speculative task can never leave half-written files visible,
# and abort() removes every staged file named by the surviving messages.

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _SinkCommitMessage(WriterCommitMessage):
    def __init__(self, staged_file: str, rows: int):
        self.staged_file = staged_file
        self.rows = rows


class _SynthSinkWriter(DataSourceWriter):
    """JSON-lines sink with atomic visibility: write(iterator) runs per
    task and stages one part file; commit(messages) (driver) renames the
    staged files into the target and writes a _SUCCESS manifest listing
    exactly the committed parts (readers select manifest files ONLY, so
    orphans from dead tasks are invisible even before cleanup).

    In append mode (``mode("append")``) the driver-side commit MERGES the
    existing _SUCCESS manifest's parts with the new batch's, so earlier
    committed data stays manifest-visible; overwrite replaces both the
    parts and the manifest.

    LOCAL-FILESYSTEM-ONLY fixture: tasks stage with ``open()`` on the
    executor's local disk and the driver commits with os/shutil, which is
    correct only when driver and executors share a filesystem (local /
    local-cluster mode, as in this harness).  The reference's equivalent
    (writeIndexFileAndCommit, RemoteShuffleUtils.scala) commits through a
    shared remote store; a cluster-grade port of this sink would carry the
    staged payload in the commit message or stage to shared storage."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rss_synth writer requires .option('path', ...)")
        self.overwrite = bool(overwrite)

    def write(self, iterator):
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _SinkCommitMessage(fname, n)

    def commit(self, messages):
        import json
        import os
        import shutil

        os.makedirs(self.path, exist_ok=True)
        final = []
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        else:
            # Append: earlier commits' parts must stay manifest-visible,
            # so seed the new manifest with the existing one's entries.
            manifest = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(manifest):
                with open(manifest) as f:
                    final.extend(json.load(f).get("parts", []))
        for m in messages:
            if m is None:
                continue
            dst = os.path.join(self.path, os.path.basename(m.staged_file))
            shutil.move(m.staged_file, dst)
            final.append({"file": os.path.basename(dst), "rows": m.rows})
        # Manifest write is atomic (temp + os.replace): a crash between the
        # part moves above and this point leaves the OLD manifest intact —
        # the new parts are orphaned-but-invisible, never half-listed.
        # Append mode still assumes a SINGLE writer per path (the
        # read-extend-replace is not serialized across concurrent commits;
        # same single-writer contract as Spark's own FileStreamSink log).
        tmp = os.path.join(self.path, f"_SUCCESS.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump({"parts": final}, f)
        os.replace(tmp, os.path.join(self.path, "_SUCCESS"))
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        for m in messages or []:
            if m is not None and os.path.exists(m.staged_file):
                os.remove(m.staged_file)
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


def committed_files(path: str) -> list[str]:
    """The manifest-visible part files of an rss_synth sink directory —
    readers must go through this (orphaned parts are invisible)."""
    import json
    import os

    with open(os.path.join(path, "_SUCCESS")) as f:
        manifest = json.load(f)
    return [os.path.join(path, p["file"]) for p in manifest["parts"]]
