"""murmur3 against published test vectors (SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest

from crawlray.murmur3 import hash_urls_128, murmur3_32, murmur3_x64_128

# Public vectors for murmur3_x86_32 (MurmurHash reference material).
VEC32 = [
    (b"", 0x00000000, 0x00000000),
    (b"", 0x00000001, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"\xff\xff\xff\xff", 0, 0x76293B50),
    (b"!Ce\x87", 0, 0xF55B516B),
    (b"!Ce", 0, 0x7E4A8634),
    (b"!C", 0, 0xA0F7B07A),
    (b"!", 0, 0x72661CF4),
    (b"\x00\x00\x00\x00", 0, 0x2362F9DE),
    (b"\x00", 0, 0x514E28B7),
    (b"Hello, world!", 0x9747B28C, 0x24884CBA),
    (b"The quick brown fox jumps over the lazy dog", 0x9747B28C, 0x2FA826CD),
]


@pytest.mark.parametrize("data,seed,want", VEC32)
def test_murmur3_32_vectors(data, seed, want):
    assert murmur3_32(data, seed) == want


def test_murmur3_128_known():
    # matches mmh3.hash64("hello") == (-3758069500696749310, 6565844092913065241)
    lo, hi = murmur3_x64_128(b"hello")
    assert lo == 14688674573012802306
    assert hi == 6565844092913065241
    assert murmur3_x64_128(b"") == (0, 0)


def test_murmur3_128_block_sizes():
    # exercise every tail length + multi-block inputs; determinism
    for n in range(0, 40):
        data = bytes(range(n))
        a = murmur3_x64_128(data)
        b = murmur3_x64_128(data)
        assert a == b
        if n > 0:
            assert a != murmur3_x64_128(data, seed=1)


def test_hash_urls_128_batch():
    urls = ["http://a.example/", "http://b.example/x", "http://a.example/"]
    lo, hi = hash_urls_128(urls)
    assert lo.dtype == np.uint64 and hi.dtype == np.uint64
    assert (lo[0], hi[0]) == murmur3_x64_128(b"http://a.example/")
    assert lo[0] == lo[2] and hi[0] == hi[2]
    assert lo[0] != lo[1]


def test_hash_urls_128_null_and_empty():
    # null-containing arrays route to the scalar fallback, which must hash
    # None as "" rather than crash (ADVICE r2; reachable via approx_distinct
    # on any nullable string column)
    import pyarrow as pa

    lo, hi = hash_urls_128(pa.array(["a", None, ""], pa.string()))
    assert (lo[1], hi[1]) == murmur3_x64_128(b"")
    assert (lo[2], hi[2]) == murmur3_x64_128(b"")
    assert (lo[0], hi[0]) == murmur3_x64_128(b"a")
    lo2, hi2 = hash_urls_128(["a", None, ""])
    assert list(lo) == list(lo2) and list(hi) == list(hi2)
