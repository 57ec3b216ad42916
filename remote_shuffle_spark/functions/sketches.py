"""Pure-Python readers for Spark's sketch wire formats.

Spark SQL exposes ``count_min_sketch`` as an aggregate returning the
sketch's serialized bytes, but ships no SQL expression to PROBE it — the
only in-JVM probe is ``org.apache.spark.util.sketch.CountMinSketch``,
reachable solely through the py4j-private ``spark._jvm`` handle, which is
unavailable under Spark Connect and version-fragile (round-5 verdict).
This module replaces that path: it parses the serialization format the
open-source ``CountMinSketchImpl.writeTo`` emits (version 1, stable since
Spark 2.0) and reproduces the string-item estimate exactly —
``tests/test_operators_stats.py`` pins byte-level parity against the JVM
implementation where classic mode makes it reachable.

Format (all big-endian, java.io.DataOutputStream):

    int32  version (1)
    int64  totalCount
    int32  depth
    int32  width
    int64  hashA[depth]          (used for long items only)
    int64  table[depth][width]

String items hash with Spark's Murmur3_x86_32 ``hashUnsafeBytes`` variant
(4-byte little-endian body words, then remaining bytes one SIGNED byte at
a time — deliberately incompatible with standard murmur3 tails), double-
hashed Guava-style: ``bucket_i = abs32(h1 + i*h2) % width`` for row i in
[0, depth), h1 = murmur(bytes, seed=0), h2 = murmur(bytes, seed=h1).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _to_i32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_x86_32_spark(data: bytes, seed: int) -> int:
    """Spark's ``Murmur3_x86_32.hashUnsafeBytes``: aligned 4-byte words
    little-endian, then each remaining byte mixed individually as a
    SIGNED int (the "not compatible with original" tail the Java source
    warns about).  Returns a signed int32."""
    h1 = seed & _M32
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i : i + 4], "little")))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _to_i32(_fmix(h1, len(data)))


@dataclass(frozen=True)
class CountMinSketchReader:
    """Parsed Spark CountMinSketch; probe with :meth:`estimate_string`."""

    total_count: int
    depth: int
    width: int
    table: tuple[tuple[int, ...], ...]
    hash_a: tuple[int, ...] = ()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketchReader":
        version, total = struct.unpack_from(">iq", buf, 0)
        if version != 1:
            raise ValueError(f"unsupported CountMinSketch version {version}")
        depth, width = struct.unpack_from(">ii", buf, 12)
        # hashA seeds the per-row long-item hash functions; kept so
        # cross-sketch operations can PROVE row alignment (same seed)
        hash_a = struct.unpack_from(f">{depth}q", buf, 20)
        off = 20 + 8 * depth
        expected = off + 8 * depth * width
        if len(buf) != expected:
            raise ValueError(
                f"CountMinSketch length {len(buf)} != expected {expected} "
                f"for depth={depth} width={width}"
            )
        table = tuple(
            struct.unpack_from(f">{width}q", buf, off + 8 * width * i)
            for i in range(depth)
        )
        return cls(
            total_count=total, depth=depth, width=width, table=table, hash_a=hash_a
        )

    def estimate_string(self, item: str) -> int:
        """Exact reproduction of the JVM ``estimateCount`` for a string
        item: min over rows of the double-hashed bucket's counter."""
        bs = item.encode("utf-8")
        h1 = murmur3_x86_32_spark(bs, 0)
        h2 = murmur3_x86_32_spark(bs, h1)
        best = None
        for i in range(self.depth):
            combined = _to_i32(h1 + i * h2)
            # JVM order is Math.abs((h1 + i*h2) % width) — signed remainder
            # FIRST (Java % truncates toward zero), then abs.  For every
            # int32 including MIN_VALUE that equals abs(combined) % width
            # under Python's exact integers, so parity holds with no
            # wrap-around corner case.
            v = self.table[i][abs(combined) % self.width]
            best = v if best is None else min(best, v)
        return best if best is not None else 0


    def inner_product(self, other: "CountMinSketchReader") -> int:
        """CMS inner-product JOIN-SIZE estimate (Cormode–Muthukrishnan):
        for two sketches of the key-frequency vectors a, b built with the
        SAME geometry and seed (row-aligned hash functions),

            est = min_i Σ_j table_a[i][j] · table_b[i][j]

        estimates Σ_k a_k·b_k — the exact row count of the equi-join on
        that key.  Each row's sum only ADDS colliding-key cross terms, so
        ``est >= exact`` deterministically; the overshoot is bounded by
        ε·N_a·N_b (ε = e/width) with probability 1−δ per the published
        analysis.  This is the shuffle-planning primitive: decide
        broadcast-vs-SMJ (or predict a pathological join blowup) from two
        small mergeable sketches (depth x width longs), never running
        the join."""
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError(
                "inner_product needs identical sketch geometry: "
                f"{(self.depth, self.width)} vs {(other.depth, other.width)}"
            )
        if self.hash_a != other.hash_a:
            raise ValueError(
                "inner_product needs row-ALIGNED hash functions (same seed): "
                "the sketches' hashA arrays differ, so the estimate would "
                "carry no est >= exact guarantee"
            )
        return min(
            sum(a * b for a, b in zip(ra, rb))
            for ra, rb in zip(self.table, other.table)
        )
