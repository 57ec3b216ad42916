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
