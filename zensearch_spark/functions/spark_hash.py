"""Driver-side twin of Spark's ``hash()`` for strings.

Spark's ``F.hash(col)`` on a string is Murmur3_x86_32 over the UTF-8
bytes with seed 42, with Spark's own tail handling (each trailing
byte is mixed as a full signed-int round, unlike canonical Murmur3)
and ``fmix(h1, numBytes)`` — public knowledge from the Apache Spark
sources (org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes,
org.apache.spark.sql.catalyst.expressions.Murmur3Hash).

Having it on the driver lets the query planner compute a term's
``term_bucket = pmod(hash(term), n_buckets)`` without a Spark job
(tests/test_wand_unit.py verifies byte-for-byte agreement with the
JVM).
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    return (h1 * 5 + 0xE6546B64) & _M32


def spark_hash_string(s: str, seed: int = 42) -> int:
    """Signed int32, equal to Spark SQL ``hash(s)``."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed & _M32
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # JVM bytes are signed
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= 1 << 31 else h1


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — the blocks partition value."""
    return spark_hash_string(term) % n_buckets
