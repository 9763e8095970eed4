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
from crawlray.murmur3 import murmur3_x64_128
from crawlray.ops.sketch import HLL


@ray.remote(num_cpus=0)
class SeenShardActor:
    def __init__(self, shard_id: int, cuckoo_capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.exact: set[tuple[int, int]] = set()
        self.cuckoo = CuckooFilter(cuckoo_capacity)
        # metrics-only cardinality sketch (O-32): registers ride along for
        # ~4 KB/shard; merged driver-side once per crawl, never per row
        self.hll = HLL(12)
        self.wave_added: set[tuple[int, int]] = set()
        self._offer_urls: list[list[str]] = []
        self._offer_packs: list[np.ndarray] = []
        self.delta_urls: list[str] = []
        self.delta_hashes: list[tuple[int, int]] = []
        self.current_wave = -1

    def begin_wave(self, wave: int) -> None:
        self.current_wave = wave
        self.wave_added = set()
        self._offer_urls: list[list[str]] = []
        self._offer_packs: list[np.ndarray] = []

    # ---- discovery dedup path (SURVEY.md O-30 + O-26 fused) -------------
    # Within-wave dedup (keep min pack per URL) and cross-wave seen
    # filtering both live HERE: offer() min-combines the wave's discovery
    # multiset per shard (order-independent ⇒ deterministic under any task
    # order, idempotent under task retries), finish_wave() then resolves
    # which offered URLs are genuinely new, hashes only those (murmur3_128
    # once per unique URL), admits them to the cuckoo+exact store, and
    # returns the new frontier rows as one Arrow block. This replaces a
    # sort-based groupby shuffle over the full discovery stream (measured
    # ~45% of crawl wall time) with key-routed RPCs + per-shard combine.

    def offer(self, urls, packs) -> None:
        # O(1) per call: buffer the (already per-batch-combined) offer
        # arrays; the global min-combine runs vectorized at finish_wave.
        # `urls` is a pa.Array (zero-copy out-of-band wire format) or a
        # plain list from older callers/tests.
        if isinstance(urls, list):
            urls = pa.array(urls, pa.string())
        self._offer_urls.append(urls)
        self._offer_packs.append(np.asarray(packs, dtype=np.int64))

    def finish_wave(self) -> pa.Table:
        """Resolve the wave's offers → Arrow block of NEW frontier rows
        (url, pack, url_hash_lo, url_hash_hi), sorted by url.

        Global per-URL min over the buffered offers is a single Arrow
        group_by (C++); only the unique NEW URLs pay the per-item Python
        cost (murmur3 membership key + cuckoo/exact admission). Imports used
        here must sit at module top: this runs in the actor process, where a
        lazy `import crawlray...` fails when the class was shipped by-value
        (driver cwd outside the repo)."""
        if not self._offer_urls:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "pack": pa.array([], pa.int64()),
                    "url_hash_lo": pa.array([], pa.uint64()),
                    "url_hash_hi": pa.array([], pa.uint64()),
                }
            )
        offers = pa.table(
            {
                "url": pa.chunked_array(self._offer_urls),
                "pack": pa.array(np.concatenate(self._offer_packs), pa.int64()),
            }
        )
        self._offer_urls = []
        self._offer_packs = []
        comb = offers.group_by(["url"]).aggregate([("pack", "min")])
        comb = comb.take(pa.compute.sort_indices(comb.column("url")))
        urls_u = comb.column("url").to_pylist()
        packs_u = comb.column("pack_min").to_pylist()

        urls: list[str] = []
        packs: list[int] = []
        los: list[int] = []
        his: list[int] = []
        for u, p in zip(urls_u, packs_u):
            lo, hi = murmur3_x64_128(u.encode("utf-8", "surrogatepass"))
            k = (lo, hi)
            if self.cuckoo.maybe_contains(lo, hi) and k in self.exact:
                continue
            self.exact.add(k)
            self.cuckoo.add(lo, hi)
            self.delta_urls.append(u)
            self.delta_hashes.append(k)
            urls.append(u)
            packs.append(p)
            los.append(lo)
            his.append(hi)
        self.hll.add_hashes(np.asarray(los, dtype=np.uint64))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "pack": pa.array(packs, pa.int64()),
                "url_hash_lo": pa.array(los, pa.uint64()),
                "url_hash_hi": pa.array(his, pa.uint64()),
            }
        )

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
        self.hll.add_hashes(np.asarray(lo, dtype=np.uint64)[new])
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
        self.hll.add_hashes(np.asarray(lo, dtype=np.uint64))
        return len(self.exact)

    def hll_registers(self) -> bytes:
        """This shard's HLL partial (merged driver-side by register max)."""
        return self.hll.registers.tobytes()
