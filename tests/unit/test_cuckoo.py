"""Cuckoo filter: no-false-negative guarantee, saturation degradation,
state snapshot roundtrip (SURVEY.md §5.2 item 1, §7.7-H1)."""

import numpy as np

from crawlray.cuckoo import CuckooFilter
from crawlray.murmur3 import murmur3_x64_128


def _hashes(n, tag=""):
    return [murmur3_x64_128(f"u{tag}{i}".encode()) for i in range(n)]


def test_no_false_negatives():
    f = CuckooFilter(capacity=2000)
    items = _hashes(1500)
    for lo, hi in items:
        f.add(lo, hi)
    # every inserted item must answer "maybe" — false negatives would let
    # the seen-set fast path drop URLs (the exactness hazard H1)
    assert all(f.maybe_contains(lo, hi) for lo, hi in items)
    lo = np.array([h[0] for h in items], np.uint64)
    hi = np.array([h[1] for h in items], np.uint64)
    assert f.maybe_contains_many(lo, hi).all()


def test_definitely_absent_fast_path_mostly_negative():
    f = CuckooFilter(capacity=4000)
    for lo, hi in _hashes(1000, "in"):
        f.add(lo, hi)
    probes = _hashes(2000, "out")
    lo = np.array([h[0] for h in probes], np.uint64)
    hi = np.array([h[1] for h in probes], np.uint64)
    fp_rate = f.maybe_contains_many(lo, hi).mean()
    # 16-bit fingerprints, 2 buckets × 4 slots → fp rate well under 1%
    assert fp_rate < 0.01, fp_rate


def test_saturation_degrades_to_always_maybe():
    f = CuckooFilter(capacity=64)  # rounds up to small table
    items = _hashes(5000, "sat")
    for lo, hi in items:
        f.add(lo, hi)
    assert f.saturated
    # degraded filter must never claim absence
    assert all(f.maybe_contains(lo, hi) for lo, hi in _hashes(100, "other"))


def test_state_roundtrip():
    f = CuckooFilter(capacity=1000)
    items = _hashes(500, "st")
    for lo, hi in items:
        f.add(lo, hi)
    g = CuckooFilter(capacity=1000)
    g.load_state(f.state())
    assert all(g.maybe_contains(lo, hi) for lo, hi in items)
    assert g.count == f.count
