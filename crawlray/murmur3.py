"""MurmurHash3 (x64_128 and x86_32) — pure-Python implementation.

The north-star architecture keys the sharded URL-seen set by murmur3 of the
canonicalized URL (BASELINE.json `north_star`). `mmh3` is not installed in
this environment (SURVEY.md §0), so the public algorithm (Austin Appleby,
public domain; see https://github.com/aappleby/smhasher) is implemented here.

The 32-bit variant is validated against the published test vectors from the
MurmurHash reference material (tests/unit/test_murmur3.py); the x64_128
variant is the standard reference algorithm transcribed for Python ints.
Both the oracle (`oracle/bfs_crawler.py`) and the Ray engine share this
module, so hash agreement between them is structural.
"""

from __future__ import annotations

import numpy as np

_MASK64 = 0xFFFFFFFFFFFFFFFF
_MASK32 = 0xFFFFFFFF

_C1_128 = 0x87C37B91114253D5
_C2_128 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Return (h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    h1 = seed & _MASK64
    h2 = seed & _MASK64
    nblocks = length // 16

    for i in range(nblocks):
        off = i * 16
        k1 = int.from_bytes(data[off : off + 8], "little")
        k2 = int.from_bytes(data[off + 8 : off + 16], "little")

        k1 = (k1 * _C1_128) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2_128) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64

        k2 = (k2 * _C2_128) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1_128) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = data[nblocks * 16 :]
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2_128) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1_128) & _MASK64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1_128) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2_128) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Return unsigned 32-bit murmur3_x86_32 hash."""
    c1 = 0xCC9E2D51
    c2 = 0x1B873593
    length = len(data)
    h = seed & _MASK32
    nblocks = length // 4

    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _MASK32
        k = _rotl32(k, 15)
        k = (k * c2) & _MASK32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK32

    tail = data[nblocks * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & _MASK32
        k = _rotl32(k, 15)
        k = (k * c2) & _MASK32
        h ^= k

    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


def hash_urls_128(urls) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish batch hash: list[str] -> (lo: uint64[], hi: uint64[]).

    The per-string core is scalar Python (variable-length keys defeat simple
    numpy vectorization), but it runs inside `map_batches` tasks so it
    parallelizes across the cluster; the result arrays are numpy so downstream
    shard routing (`lo % num_shards`) is vectorized.
    """
    n = len(urls)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.empty(n, dtype=np.uint64)
    f = murmur3_x64_128
    for i, u in enumerate(urls):
        a, b = f(u.encode("utf-8", "surrogatepass"))
        lo[i] = a
        hi[i] = b
    return lo, hi
