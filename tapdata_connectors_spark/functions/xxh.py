"""Pure-python XXH64 matching Spark's `xxhash64` expression bit-for-bit.

Why: `LakeTable.lookup` needs pmod(xxhash64(key), n_buckets) for ONE
value to pick the bucket. Launching a Spark job to hash one literal costs
a full scheduler round-trip per point read; computing it driver-side
makes lookup a pure metadata operation until the single pruned file scan.

Semantics matched to Spark's XxHash64 expression (seed 42):
- string: XXH64 over the UTF-8 bytes;
- bigint: the single 8-byte little-endian block (XXH64.hashLong);
- int/smallint/tinyint: the 4-byte block path (XXH64.hashInt — NOT
  promoted to long; int 5 and bigint 5 hash differently in Spark);
- null: returns the seed unchanged.
Parity is pinned by tests/test_xxh.py against values captured from the
Spark expression itself.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 digest as an UNSIGNED 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (v + lane * _P2) & _MASK
                v = (_rotl(v, 31) * _P1) & _MASK
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = (((h ^ k) * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _MASK
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl(h ^ ((k * _P1) & _MASK), 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _MASK), 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(value, dtype: str, seed: int = 42) -> int | None:
    """Spark `xxhash64(col)` for one VALUE of Spark type `dtype`, as the
    SIGNED long Spark returns. None for unsupported types (caller falls
    back to evaluating the expression in Spark)."""
    if value is None:
        return seed
    t = dtype.lower()
    if t in ("string", "varchar", "char"):
        return _signed(xxh64(str(value).encode("utf-8"), seed))
    if t in ("bigint", "long"):
        return _signed(xxh64(int(value).to_bytes(8, "little", signed=True),
                             seed))
    if t in ("int", "integer", "smallint", "tinyint"):
        # Spark hashes 4-byte-and-narrower integrals via XXH64.hashInt
        # (the 4-byte block path), NOT promoted to long
        return _signed(xxh64(int(value).to_bytes(4, "little", signed=True),
                             seed))
    return None
