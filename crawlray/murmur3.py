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


def _hash_urls_128_scalar(urls) -> tuple[np.ndarray, np.ndarray]:
    """Nulls hash as the empty string — this is the fallback the batch path
    routes null-containing arrays to (e.g. approx_distinct over a nullable
    column), so it must not crash on None (ADVICE r2)."""
    n = len(urls)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.empty(n, dtype=np.uint64)
    f = murmur3_x64_128
    for i, u in enumerate(urls):
        a, b = f((u or "").encode("utf-8", "surrogatepass"))
        lo[i] = a
        hi[i] = b
    return lo, hi


_U64 = np.uint64


def _rotl64_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix64_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> _U64(33))


def murmur3_x64_128_batch(strings, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3_x64_128 over a pyarrow string array (or list[str])
    -> (lo: uint64[], hi: uint64[]).

    Bit-identical to the scalar reference (property-tested in
    tests/unit/test_murmur3.py): rows are zero-padded into an (n, 16*B) byte
    matrix viewed as u64 lanes; the 16-byte block mix runs as ~max(len)/16
    masked numpy passes (variable lengths only mask the update, padding never
    reaches the mix), and the tail/finalize read the zero-padded lane exactly
    as `int.from_bytes` reads a short slice. ~100x the scalar throughput —
    this is the seen-shard admission path's hash, so it must not be the
    finish_wave barrier's floor. Falls back to the scalar loop for outlier
    rows (>4 KiB) and non-UTF-8-encodable python strings."""
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        try:
            strings = pa.array(strings, pa.string())
        except (pa.ArrowInvalid, UnicodeEncodeError):
            return _hash_urls_128_scalar(strings)
    n = len(strings)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    if strings.null_count:
        return _hash_urls_128_scalar(strings.to_pylist())
    bufs = strings.buffers()
    off_np = np.int64 if pa.types.is_large_string(strings.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_np)[
        strings.offset : strings.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    maxlen = int(lens.max())
    if maxlen > 4096:
        return _hash_urls_128_scalar(strings.to_pylist())
    nb_max = maxlen // 16
    W = (nb_max + 1) * 16  # + one zero block so every tail lane exists
    P = np.zeros((n, W), dtype=np.uint8)
    P[np.arange(W) < lens[:, None]] = data[offs[0] : offs[-1]]
    V = P.view("<u8")  # (n, 2*(nb_max+1)) little-endian lanes

    C1 = _U64(0x87C37B91114253D5)
    C2 = _U64(0x4CF5AD432745937F)
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = np.full(n, seed, dtype=np.uint64)
    nblocks = lens // 16
    for b in range(int(nblocks.max())):
        m = nblocks > b
        k1 = V[:, 2 * b] * C1
        k1 = _rotl64_vec(k1, 31) * C2
        nh1 = _rotl64_vec(h1 ^ k1, 27) + h2
        nh1 = nh1 * _U64(5) + _U64(0x52DCE729)
        k2 = V[:, 2 * b + 1] * C2
        k2 = _rotl64_vec(k2, 33) * C1
        nh2 = _rotl64_vec(h2 ^ k2, 31) + nh1
        nh2 = nh2 * _U64(5) + _U64(0x38495AB5)
        h1 = np.where(m, nh1, h1)
        h2 = np.where(m, nh2, h2)

    rows = np.arange(n)
    ti = 2 * nblocks
    tl = lens - nblocks * 16
    k2t = V[rows, ti + 1] * C2
    k2t = _rotl64_vec(k2t, 33) * C1
    h2 = np.where(tl > 8, h2 ^ k2t, h2)
    k1t = V[rows, ti] * C1
    k1t = _rotl64_vec(k1t, 31) * C2
    h1 = np.where(tl > 0, h1 ^ k1t, h1)

    L = lens.astype(np.uint64)
    h1 = h1 ^ L
    h2 = h2 ^ L
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64_vec(h1)
    h2 = _fmix64_vec(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def hash_urls_128(urls) -> tuple[np.ndarray, np.ndarray]:
    """Batch hash: list[str] | pa.StringArray -> (lo: uint64[], hi: uint64[]).

    Vectorized numpy core (murmur3_x64_128_batch); scalar fallback for
    inputs the arrow conversion rejects."""
    return murmur3_x64_128_batch(urls)
