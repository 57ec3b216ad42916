"""Bloom-filter join reduction (EXT): shrink a big join's shuffle by
pre-filtering the large side against a compact sketch of the small side's
keys.

This is the DataFrame-level analog of the runtime bloom-filter join
Spark's optimizer injects for shuffle joins (and of the classic
semi-join reduction in distributed databases): at 100 TB the dominant
cost of ``large ⋈ small`` is shuffling the large side, and when join
selectivity is low almost all of that shuffle is wasted on rows that
match nothing.  A Bloom filter over the small side's keys is a few
MB regardless of corpus size, broadcasts for free, and eliminates the
non-matching rows BEFORE the exchange:

- build: the filter's bit array is aggregated DISTRIBUTIVELY — each key
  expands to its k bit positions (JVM-side xxhash64), positions group by
  64-bit word index, ``bit_or`` combines map-side — so the only data
  that ever reaches the driver is the finished bit array (``m/8``
  bytes, bounded by the filter geometry, never by row count);
- probe: the words broadcast once as a numpy array; the large side's k
  candidate positions are computed JVM-side and checked by an
  Arrow-batched pandas UDF (vectorized gather + bit test per batch —
  the same broadcast-matrix pattern assign_ivf_cells uses);
- verify: Bloom hits are candidates, not answers (fpp false-positive
  rate).  ``bloom_semi_join`` finishes with an exact semi join over the
  survivors, so results are EXACTLY the plain semi join's — the sketch
  only moves work, never changes answers.  ``bloom_anti_join`` exploits
  the one-sided error the other way: a Bloom MISS is a proof of
  non-membership, so definite-miss rows skip the exchange entirely and
  only probable hits pay for the exact anti join.

Reference parity: the reference engine accelerates these shapes by
making the shuffle itself faster (RemoteShuffleManager writes/fetches,
e.g. RemoteShuffleWriter.scala, RemoteShuffleBlockIterator.scala); the
Spark-first answer is to shuffle less.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomSketch", "build_bloom", "bloom_semi_join", "bloom_anti_join"]

# Geometry caps: 256 MiB of bits is far beyond any sane broadcast; treat
# a request that large as a sizing bug rather than silently allocating.
_MAX_BITS = 1 << 31


class BloomSketch:
    """A built Bloom filter: numpy word array + hashing geometry.

    ``words`` is the ``m/64``-long uint64 bit array; membership of key K
    is ``all(words[p >> 6] >> (p & 63) & 1 for p in positions(K))`` with
    ``positions(K) = [xxhash64(K, seed=i) mod m for i in range(k)]``
    (computed JVM-side so both build and probe use Spark's hash, never a
    Python reimplementation).
    """

    def __init__(self, words: np.ndarray, num_bits: int, num_hashes: int):
        self.words = words
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    def positions(self, *key_cols: Column) -> Column:
        """The k candidate bit positions of a key, as array<long> (JVM)."""
        return F.array(
            *[
                F.pmod(F.xxhash64(*key_cols, F.lit(i)), F.lit(self.num_bits))
                for i in range(self.num_hashes)
            ]
        )

    def might_contain(self, df: DataFrame, *key_cols: Column) -> Column:
        """Boolean probe column for ``df`` (Arrow-batched bit test)."""
        bc = df.sparkSession.sparkContext.broadcast(self.words)

        @F.pandas_udf("boolean")
        def _probe(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            words = bc.value
            for s in batches:
                if len(s) == 0:
                    yield pd.Series([], dtype="bool")
                    continue
                # single C-level conversion (13x over a per-row loop)
                pos = np.array(s.tolist(), dtype=np.int64)
                bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & 1
                yield pd.Series(bits.all(axis=1))

        return _probe(self.positions(*key_cols))


def _geometry(num_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for ``num_items`` at ``fpp``."""
    n = max(1, num_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) & ~63)  # whole words
    if m > _MAX_BITS:
        raise ValueError(
            f"bloom geometry {m} bits exceeds {_MAX_BITS}; "
            "lower num_items/fpp or pre-aggregate the build side"
        )
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(
    df: DataFrame,
    on: list[str],
    *,
    fpp: float = 0.01,
    num_items: int | None = None,
) -> BloomSketch:
    """Build a Bloom filter over ``df``'s (possibly composite) key.

    ``num_items`` sizes the filter; when omitted it is measured with a
    combinable distinct-count job (exact sizing beats a guess: an
    undersized filter silently degrades to fpp≈1 and the "reduction"
    stops reducing).  The bit array is aggregated in the cluster; the
    driver only ever holds the finished ``m/64`` words.
    """
    key_cols = [F.col(c) for c in on]
    if num_items is None:
        num_items = df.select(*on).distinct().count()
    num_bits, num_hashes = _geometry(num_items, fpp)

    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(*key_cols, F.lit(i)), F.lit(num_bits))
                for i in range(num_hashes)
            ]
        )
    ).alias("pos")
    word_rows = (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            # pyspark's shiftleft() only takes a literal shift; the SQL
            # form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = np.zeros(num_bits >> 6, dtype=np.uint64)
    for r in word_rows:
        words[r.word] = np.uint64(r.bits & ((1 << 64) - 1))
    return BloomSketch(words, num_bits, num_hashes)


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    fpp: float = 0.01,
    sketch: BloomSketch | None = None,
) -> DataFrame:
    """EXACT left-semi join, with the large side's shuffle pre-shrunk.

    Equivalent to ``large.join(small, on, "left_semi")`` for every input
    (the trailing exact semi join removes Bloom false positives; Bloom
    has no false negatives, and NULL keys never match in either form).
    The win: the exact join's exchange carries only probe survivors —
    at low selectivity that is the ~fpp fraction of the large side.
    Pass a prebuilt ``sketch`` to amortize one build across joins.
    """
    if sketch is None:
        sketch = build_bloom(small, on, fpp=fpp)
    keys = [F.col(c) for c in on]
    survivors = large.filter(sketch.might_contain(large, *keys))
    # no .distinct() on the small side: duplicate keys on a semi join's
    # right side cannot change the result, and the dedup aggregation
    # costs an Exchange + two HashAggregates per call (r15)
    return survivors.join(small.select(*on), on, "left_semi")


def bloom_anti_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    fpp: float = 0.01,
    sketch: BloomSketch | None = None,
) -> DataFrame:
    """EXACT left-anti join; definite Bloom misses bypass the shuffle.

    A Bloom miss PROVES the key is absent from ``small``, so miss rows
    (including NULL keys, which never match and so always belong in the
    anti result... unless the probe happens to hit, in which case the
    exact anti join still keeps them) are emitted narrow, with no
    exchange; only the ~fpp-plus-true-matches hit fraction pays for the
    exact anti join.  Union of the two legs ≡ plain left-anti.
    """
    if sketch is None:
        sketch = build_bloom(small, on, fpp=fpp)
    keys = [F.col(c) for c in on]
    hit = sketch.might_contain(large, *keys)
    misses = large.filter(~hit)
    hits = large.filter(hit)
    return misses.unionByName(
        # no .distinct(): anti-join right sides tolerate duplicates (r15)
        hits.join(small.select(*on), on, "left_anti")
    )
