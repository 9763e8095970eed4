"""Content-defined chunking (rolling-hash fingerprints) tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ref_boundaries(data: bytes, window: int, mask: int, min_len: int, max_len: int):
    """Byte-at-a-time reference: same polynomial window hash, no numpy."""
    n = len(data)
    if n == 0:
        return []
    if n <= min_len:
        return [n]
    P = 0x100000001B3
    M = (1 << 64) - 1
    w = min(window, n)
    # candidate cut positions: after byte i when window-hash & mask == 0
    cand = []
    pinv = pow(P, -1, 1 << 64)
    s = [0]
    pw = 1
    for t, byte in enumerate(data):
        s.append((s[-1] + byte * pw) & M)
        pw = (pw * P) & M
    for i in range(w - 1, n):
        ip = pow(pinv, i + 1 - w, 1 << 64)
        h = ((s[i + 1] - s[i + 1 - w]) * ip) & M
        if (h & mask) == 0:
            cand.append(i + 1)
    cuts, start, ci = [], 0, 0
    while start < n:
        hi = min(start + max_len, n)
        cut = hi
        while ci < len(cand) and cand[ci] <= start + min_len:
            ci += 1
        if ci < len(cand) and start + min_len < cand[ci] <= hi:
            cut = cand[ci]
        cuts.append(cut)
        start = cut
    return cuts


def test_cdc_boundaries_match_reference():
    from crawlray.ops.textqa import _cdc_boundaries

    rng = np.random.RandomState(5)
    for n in (0, 10, 33, 200, 1500):
        data = bytes(rng.randint(0, 256, n, dtype=np.uint8))
        got = _cdc_boundaries(data, 16, 0x3F, 32, 1024)
        want = _ref_boundaries(data, 16, 0x3F, 32, 1024)
        assert got == want, n
        if n:
            assert got[-1] == n  # chunks cover the document exactly
            lens = np.diff([0] + got)
            assert (lens <= 1024).all()
            assert (lens[:-1] >= 1).all()


def test_cdc_edit_locality(ray_session):
    """CDC's point: an insertion near the front changes O(1) chunks — the
    fingerprints of untouched content survive, unlike whole-doc hashing."""
    import ray.data

    from crawlray.ops.textqa import cdc_chunks

    rs = np.random.RandomState(9)
    base = bytes(rs.randint(97, 123, 8000, dtype=np.uint8)).decode()
    edited = base[:100] + "INSERTED-BYTES-HERE" + base[100:]
    tbl = pa.table({"doc_id": [1, 2], "text": [base, edited]})
    out = cdc_chunks(ray.data.from_arrow(tbl)).to_pandas()
    fps1 = set(out[out.doc_id == 1].chunk_fp)
    fps2 = set(out[out.doc_id == 2].chunk_fp)
    shared = len(fps1 & fps2) / max(len(fps1), 1)
    assert shared >= 0.75, shared


def test_cdc_dup_pairs_finds_partial_overlap(ray_session):
    """Docs sharing a long common passage pair up; unrelated docs don't."""
    import ray.data

    from crawlray.ops.neardup import cdc_dup_pairs

    rs = np.random.RandomState(21)

    def rand_text(n):
        return bytes(rs.randint(97, 123, n, dtype=np.uint8)).decode()

    passage = rand_text(3000)
    docs = {
        1: rand_text(1000) + passage,           # shares passage with 2
        2: passage + rand_text(800),
        3: rand_text(4000),                     # unrelated
        4: rand_text(3500),                     # unrelated
    }
    tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    out = cdc_dup_pairs(
        ray.data.from_arrow(tbl).repartition(2), min_shared=3
    )
    pairs = set(zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()))
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs), pairs
