"""SeenShardActor — one shard of the distributed exact URL-seen set
(SURVEY.md O-20; north_star: "sharded cuckoo-filter URL-seen set held in
actor-pool stages, keyed by murmur3 of canonicalized URLs").

Routing: shard = url_hash_lo % num_shards, computed once at hashing time.
Membership is decided by a cuckoo filter fast path ("definitely absent" →
skip the exact probe) backed by an exact set of 128-bit murmur3 pairs — the
authoritative store, so false positives cannot drop URLs (§7.7-H1). URL
strings are retained only in the per-wave delta buffer for checkpoint dumps
(SEEN_DUMP), keeping steady-state memory at ~16 B/URL + cuckoo table.

Retry idempotency (§4.3): a Ray task that calls `check_and_add` and is then
re-executed must get the same answer. Within-wave re-adds return "new" again
(the within-wave dedup O-30 guarantees each URL reaches this actor at most
once per wave per logical row, so a repeat in the same wave can only be a
task retry). `begin_wave` rotates the wave-local set.

Scale note (§7.7-H2): at 10^10 URLs the exact sets hold ~160 GB across all
shards — shard count scales with cluster size; per-wave URL deltas are
flushed to parquet by the checkpointer rather than accumulating strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from crawlray.cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShardActor:
    def __init__(self, shard_id: int, cuckoo_capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.exact: set[tuple[int, int]] = set()
        self.cuckoo = CuckooFilter(cuckoo_capacity)
        self.wave_added: set[tuple[int, int]] = set()
        self.delta_urls: list[str] = []
        self.delta_hashes: list[tuple[int, int]] = []
        self.current_wave = -1

    def begin_wave(self, wave: int) -> None:
        self.current_wave = wave
        self.wave_added = set()

    def check_and_add(
        self, urls: list[str], lo: np.ndarray, hi: np.ndarray
    ) -> np.ndarray:
        """Returns a bool mask: True where the URL was NOT seen before (new).

        Adds all new URLs to the set. Idempotent within the current wave.
        """
        n = len(urls)
        new = np.zeros(n, dtype=bool)
        maybe = self.cuckoo.maybe_contains_many(
            np.asarray(lo, dtype=np.uint64), np.asarray(hi, dtype=np.uint64)
        )
        for i in range(n):
            k = (int(lo[i]), int(hi[i]))
            if k in self.wave_added:  # task retry within this wave
                new[i] = True
                continue
            if maybe[i] and k in self.exact:
                continue
            self.exact.add(k)
            self.cuckoo.add(k[0], k[1])
            self.wave_added.add(k)
            self.delta_urls.append(urls[i])
            self.delta_hashes.append(k)
            new[i] = True
        return new

    def contains(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        maybe = self.cuckoo.maybe_contains_many(
            np.asarray(lo, dtype=np.uint64), np.asarray(hi, dtype=np.uint64)
        )
        out = np.zeros(len(lo), dtype=bool)
        for i in np.nonzero(maybe)[0]:
            out[i] = (int(lo[i]), int(hi[i])) in self.exact
        return out

    def size(self) -> int:
        return len(self.exact)

    def dump_delta(self) -> pa.Table:
        """Drain URLs added since the last dump (checkpoint SEEN_DUMP rows)."""
        t = pa.table(
            {
                "shard": pa.array([self.shard_id] * len(self.delta_urls), pa.uint32()),
                "url": pa.array(self.delta_urls, pa.string()),
                "url_hash_lo": pa.array([h[0] for h in self.delta_hashes], pa.uint64()),
                "url_hash_hi": pa.array([h[1] for h in self.delta_hashes], pa.uint64()),
            }
        )
        self.delta_urls = []
        self.delta_hashes = []
        return t

    def ingest(self, lo: list[int], hi: list[int]) -> int:
        """Checkpoint resume: re-ingest previously dumped hashes."""
        for a, b in zip(lo, hi):
            k = (int(a), int(b))
            if k not in self.exact:
                self.exact.add(k)
                self.cuckoo.add(k[0], k[1])
        return len(self.exact)
