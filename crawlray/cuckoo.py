"""Cuckoo filter — numpy-backed approximate membership (SURVEY.md O-20).

Fast negative path for the sharded URL-seen set (north_star: "sharded
cuckoo-filter URL-seen set"). Design per Fan et al., *Cuckoo Filter:
Practically Better Than Bloom* (CoNEXT 2014): buckets of 4 slots holding
16-bit fingerprints; partial-key cuckoo hashing gives two candidate buckets
per item with the alternate bucket derivable from (bucket, fingerprint).

Exactness contract (SURVEY.md §7.7-H1): "definitely absent" answers skip the
exact-set probe; "maybe present" must fall through to the exact hash set —
cuckoo false positives can therefore never drop URLs. If an insert fails
after MAX_KICKS (filter saturated), the filter degrades to always-maybe
(`saturated` flag) instead of evicting, preserving the no-false-negative
guarantee that the fast path relies on.

Inputs are the murmur3_x64_128 words already computed at canonicalization
time — the filter never rehashes URLs.
"""

from __future__ import annotations

import numpy as np

_MAX_KICKS = 500
_SLOTS = 4


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0x5BD1E995):
        # 95% load target, power-of-two buckets
        n_buckets = 1
        while n_buckets * _SLOTS * 0.95 < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.saturated = False
        self._seed = np.uint64(seed)
        self._rng_state = np.uint64(0x9E3779B97F4A7C15)  # deterministic kicks

    # fingerprint: 16 bits of the high hash word, never 0 (0 = empty slot)
    def _fingerprint(self, hi: int) -> int:
        fp = (hi >> 48) & 0xFFFF
        return fp if fp else 1

    def _bucket1(self, lo: int) -> int:
        return lo & (self.n_buckets - 1)

    def _alt_bucket(self, b: int, fp: int) -> int:
        # partial-key: alt = b xor hash(fp)
        h = (fp * 0x5BD1E995) & 0xFFFFFFFFFFFFFFFF
        return (b ^ h) & (self.n_buckets - 1)

    def maybe_contains(self, lo: int, hi: int) -> bool:
        if self.saturated:
            return True
        fp = self._fingerprint(hi)
        b1 = self._bucket1(lo)
        if fp in self.table[b1]:
            return True
        b2 = self._alt_bucket(b1, fp)
        return fp in self.table[b2]

    def add(self, lo: int, hi: int) -> bool:
        """Insert; returns False (and sets `saturated`) if the filter is full."""
        if self.saturated:
            return False
        fp = self._fingerprint(hi)
        b = self._bucket1(lo)
        for bucket in (b, self._alt_bucket(b, fp)):
            row = self.table[bucket]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop (deterministic slot choice)
        cur_b, cur_fp = b, fp
        for _ in range(_MAX_KICKS):
            self._rng_state = np.uint64(
                (int(self._rng_state) * 6364136223846793005 + 1442695040888963407)
                & 0xFFFFFFFFFFFFFFFF
            )
            slot = int(self._rng_state >> np.uint64(60)) % _SLOTS
            row = self.table[cur_b]
            cur_fp, row[slot] = int(row[slot]), cur_fp
            cur_b = self._alt_bucket(cur_b, cur_fp)
            row = self.table[cur_b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur_fp
                self.count += 1
                return True
        self.saturated = True  # degrade to always-maybe; never drop the item
        return False

    def maybe_contains_many(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """Vectorized membership probe for a batch of hash pairs."""
        if self.saturated:
            return np.ones(len(lo), dtype=bool)
        fp = ((hi >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint64)
        fp[fp == 0] = 1
        b1 = (lo & np.uint64(self.n_buckets - 1)).astype(np.int64)
        h = (fp * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        b2 = ((b1.astype(np.uint64) ^ h) & np.uint64(self.n_buckets - 1)).astype(np.int64)
        fp16 = fp.astype(np.uint16)
        t = self.table
        hit1 = (t[b1] == fp16[:, None]).any(axis=1)
        hit2 = (t[b2] == fp16[:, None]).any(axis=1)
        return hit1 | hit2

    def state(self) -> dict:
        return {
            "table": self.table.copy(),
            "count": self.count,
            "saturated": self.saturated,
            "rng_state": int(self._rng_state),
        }

    def load_state(self, st: dict) -> None:
        self.table = st["table"].copy()
        self.count = st["count"]
        self.saturated = st["saturated"]
        self._rng_state = np.uint64(st["rng_state"])
