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
from crawlray.murmur3 import murmur3_x64_128_batch
from crawlray.ops.sketch import HLL


@ray.remote(num_cpus=0)
class SeenShardActor:
    # offers buffered past this many rows are pre-combined (group_by min +
    # murmur3 hash + cross-wave seen filter) DURING the fetch window, when
    # this actor is otherwise idle — finish_wave then only merges the small
    # pre-filtered partials, moving most frontier-derivation cost off the
    # end-of-wave barrier. min-combine is order-free, and the exact set is
    # static between finish_wave calls, so early filtering is bit-exact.
    PRECOMBINE_ROWS = 131072

    def __init__(self, shard_id: int, cuckoo_capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.exact: set[tuple[int, int]] = set()
        self.cuckoo = CuckooFilter(cuckoo_capacity)
        # metrics-only cardinality sketch (O-32): registers ride along for
        # ~4 KB/shard; merged driver-side once per crawl, never per row
        self.hll = HLL(12)
        self.wave_added: set[tuple[int, int]] = set()
        self._offer_urls: list = []
        self._offer_packs: list[np.ndarray] = []
        self._offer_lo: list[np.ndarray] = []
        self._offer_hi: list[np.ndarray] = []
        self._offer_rows = 0
        self._partials: list[pa.Table] = []
        self.delta_urls: list[str] = []
        self.delta_hashes: list[tuple[int, int]] = []
        self.current_wave = -1

    def begin_wave(self, wave: int) -> None:
        self.current_wave = wave
        self.wave_added = set()
        self._offer_urls = []
        self._offer_packs = []
        self._offer_lo = []
        self._offer_hi = []
        self._offer_rows = 0
        self._partials = []

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

    def offer(self, urls, packs, lo=None, hi=None) -> None:
        # O(1) per call: buffer the (already per-batch-combined) offer
        # arrays; pre-combine kicks in past PRECOMBINE_ROWS (see class
        # docstring). `urls` is a pa.Array (zero-copy out-of-band wire
        # format) or a plain list from older callers/tests. Offerers that
        # already hashed for shard routing ship (lo, hi) so this shard
        # never re-hashes; legacy two-arg calls hash at precombine.
        if isinstance(urls, list):
            urls = pa.array(urls, pa.string())
        if lo is None:
            lo, hi = murmur3_x64_128_batch(urls)
        self._offer_urls.append(urls)
        self._offer_packs.append(np.asarray(packs, dtype=np.int64))
        self._offer_lo.append(np.asarray(lo, dtype=np.uint64))
        self._offer_hi.append(np.asarray(hi, dtype=np.uint64))
        self._offer_rows += len(urls)
        if self._offer_rows >= self.PRECOMBINE_ROWS:
            self._precombine()

    def _precombine(self) -> None:
        """Fold the raw offer buffers into a pre-filtered partial: per-URL
        min pack, murmur3 membership hashes, and the cross-wave seen filter
        applied. Runs during the fetch window; finish_wave only merges
        partials. The per-URL Python cost (murmur3 + membership probe) is
        paid HERE, off the wave barrier."""
        if not self._offer_urls:
            return
        offers = pa.table(
            {
                "url": pa.chunked_array(self._offer_urls),
                "pack": pa.array(np.concatenate(self._offer_packs), pa.int64()),
                "lo": pa.array(np.concatenate(self._offer_lo), pa.uint64()),
                "hi": pa.array(np.concatenate(self._offer_hi), pa.uint64()),
            }
        )
        self._offer_urls = []
        self._offer_packs = []
        self._offer_lo = []
        self._offer_hi = []
        self._offer_rows = 0
        # lo/hi are functions of url, so "min" just picks the (identical)
        # value while the C++ group_by dedups in one pass
        comb = offers.group_by(["url"]).aggregate(
            [("pack", "min"), ("lo", "min"), ("hi", "min")]
        )
        lo = comb.column("lo_min").to_numpy()
        hi = comb.column("hi_min").to_numpy()
        keep = np.ones(len(lo), dtype=bool)
        maybe = self.cuckoo.maybe_contains_many(lo, hi)
        for i in np.nonzero(maybe)[0]:
            if (int(lo[i]), int(hi[i])) in self.exact:
                keep[i] = False
        part = pa.table(
            {
                "url": comb.column("url"),
                "pack": comb.column("pack_min"),
                "lo": pa.array(lo, pa.uint64()),
                "hi": pa.array(hi, pa.uint64()),
            }
        )
        if not keep.all():
            part = part.filter(pa.array(keep))
        if part.num_rows:
            self._partials.append(part)

    def finish_wave(self) -> pa.Table:
        """Resolve the wave's offers → Arrow block of NEW frontier rows
        (url, pack, url_hash_lo, url_hash_hi), sorted by url.

        Merges the pre-combined partials (group_by min — a URL offered in
        several flush windows appears in several partials) and admits the
        surviving URLs to the cuckoo+exact store. Imports used here must
        sit at module top: this runs in the actor process, where a lazy
        `import crawlray...` fails when the class was shipped by-value
        (driver cwd outside the repo)."""
        self._precombine()
        if not self._partials:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "pack": pa.array([], pa.int64()),
                    "url_hash_lo": pa.array([], pa.uint64()),
                    "url_hash_hi": pa.array([], pa.uint64()),
                }
            )
        allp = (
            self._partials[0]
            if len(self._partials) == 1
            else pa.concat_tables(self._partials)
        )
        self._partials = []
        comb = allp.group_by(["url"]).aggregate(
            [("pack", "min"), ("lo", "min"), ("hi", "min")]
        )
        comb = comb.take(pa.compute.sort_indices(comb.column("url")))
        urls_u = comb.column("url").to_pylist()
        packs_u = comb.column("pack_min")
        lo = comb.column("lo_min").to_numpy()
        hi = comb.column("hi_min").to_numpy()
        # admission loop: every row here is NEW (filtered at precombine and
        # the exact set is static during the wave); keep the historical
        # first-in-url-order-wins behavior under (astronomically unlikely)
        # 128-bit hash collisions between distinct new URLs
        keep = np.ones(len(urls_u), dtype=bool)
        for i, u in enumerate(urls_u):
            k = (int(lo[i]), int(hi[i]))
            if k in self.exact:
                keep[i] = False  # collision with a row admitted just above
                continue
            self.exact.add(k)
            self.cuckoo.add(k[0], k[1])
            self.delta_urls.append(u)
            self.delta_hashes.append(k)
        out = pa.table(
            {
                "url": comb.column("url"),
                "pack": packs_u,
                "url_hash_lo": comb.column("lo_min"),
                "url_hash_hi": comb.column("hi_min"),
            }
        )
        if not keep.all():
            out = out.filter(pa.array(keep))
        self.hll.add_hashes(lo[keep])
        return out

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
