"""Per-wave pipeline stages (SURVEY.md §3.2) — every stage is a batch
function over zero-copy Arrow batches, run via `Dataset.map_batches`.

Stage functions that talk to stateful actors (seen shards, robots cache,
politeness) group their batch rows by the target shard and issue ONE
batched RPC per shard per batch, awaiting them in parallel — key-routed
RPCs instead of a Ray Data shuffle (SURVEY.md O-26). All stage functions
are retry-safe: robots lookups are read-only, politeness offers are
set-idempotent, and seen-shard adds are wave-idempotent (see actors/).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from crawlray.actors.politeness import host_shard_of
from crawlray.actors.robots import robots_shard_of
from crawlray.backend import SyntheticBackend
from crawlray.kernels.html import parse_page, spans_to_dicts
from crawlray.kernels.url import url_host
from crawlray.murmur3 import hash_urls_128
from crawlray.schema import LINK_STRIDE, SPAN_STRUCT, pack_disc_depth, unpack_disc_depth

FRONTIER_COLS = ["url", "host", "depth", "disc_key", "url_hash_lo", "url_hash_hi", "shard"]


def seen_shard_of(url: str, num_shards: int) -> int:
    """Seen-shard routing hash. crc32 (C-speed, stable across processes)
    rather than the murmur3_128 membership key: routing runs once per
    DISCOVERED link (duplicates included) in the hot offer path, while
    murmur3 runs once per UNIQUE new URL inside the owning shard actor —
    'hash once' applies to the expensive hash, not the router."""
    import zlib

    return zlib.crc32(url.encode("utf-8", "surrogatepass")) % num_shards


def _group_by_shard(shards: np.ndarray) -> dict[int, np.ndarray]:
    order = np.argsort(shards, kind="stable")
    out: dict[int, np.ndarray] = {}
    if len(order) == 0:
        return out
    sorted_shards = shards[order]
    bounds = np.nonzero(np.diff(sorted_shards))[0] + 1
    for chunk in np.split(order, bounds):
        out[int(shards[chunk[0]])] = chunk
    return out


def make_robots_offer_stage(robots_actors, polite_actors):
    """Adds an `allowed` robots mask and registers politeness offers for
    allowed rows — one streaming pass, two batched RPC fan-outs. The robots
    actors also bank the denied disc_keys and the politeness actors the
    offered keys, so after decide() the driver can recover the wave's full
    logged key-set from the actors without touching the data again."""
    n_r = len(robots_actors)
    n_p = len(polite_actors)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("allowed", pa.array([], pa.bool_()))
        hosts = batch.column("host").to_pylist()
        urls = batch.column("url").to_pylist()
        disc = batch.column("disc_key").to_numpy()

        rshards = np.array([robots_shard_of(h, n_r) for h in hosts])
        rgroups = _group_by_shard(rshards)
        futs = {
            s: robots_actors[s].allowed.remote(
                [hosts[i] for i in idxs], [urls[i] for i in idxs], disc[idxs]
            )
            for s, idxs in rgroups.items()
        }
        allowed = np.zeros(n, dtype=bool)
        for s, idxs in rgroups.items():
            allowed[idxs] = ray.get(futs[s])

        aidx = np.nonzero(allowed)[0]
        if len(aidx):
            pshards = np.array([host_shard_of(hosts[i], n_p) for i in aidx])
            ofuts = [
                polite_actors[s].offer.remote(
                    [hosts[aidx[j]] for j in idxs], disc[aidx[idxs]]
                )
                for s, idxs in _group_by_shard(pshards).items()
            ]
            ray.get(ofuts)
        return batch.append_column("allowed", pa.array(allowed))

    return fn


STAGED_EXTRA = ["url_hash_lo", "url_hash_hi", "shard"]


def make_gate_seq_fetch_stage(
    polite_actors, fetcher_actors, seq_keys_ref, seq_base: int, chunk_rows: int = 256
):
    """ONE fused execution from robots-marked frontier to parsed pages:
    politeness admission (threshold RPCs) → seq assignment (searchsorted
    into the broadcast sorted logged-key array — the keys came back from
    the actors at decide time, so no distributed sort runs) → fan-out
    fetch+parse across the persistent actor pool. Deferred rows pass
    through with status='deferred' and their frontier columns intact.

    Scale note (SURVEY.md §7.3-H4): the driver/broadcast key array is the
    wave's LOGGED set, bounded by politeness (≤ B × active hosts per wave),
    not the frontier or discovery volume. For configurations where that
    bound is still huge, `crawlray.ops.seqassign.sort_and_zip_index` is the
    distributed-sort alternative with O(#blocks) driver state.
    """
    from crawlray.murmur3 import murmur3_32

    n_p = len(polite_actors)
    n_f = len(fetcher_actors)

    def fn(batch: pa.Table) -> pa.Table:
        empty = FetchParseStage.empty_output()
        for c in STAGED_EXTRA:
            empty = empty.append_column(
                c, pa.array([], pa.uint64() if c != "shard" else pa.uint32())
            )
        if batch.num_rows == 0:
            return empty
        n = batch.num_rows
        allowed = batch.column("allowed").to_numpy(zero_copy_only=False)
        hosts = batch.column("host").to_pylist()
        disc = batch.column("disc_key").to_numpy()

        admitted = np.zeros(n, dtype=bool)
        aidx = np.nonzero(allowed)[0]
        if len(aidx):
            pshards = np.array([host_shard_of(hosts[i], n_p) for i in aidx])
            groups = _group_by_shard(pshards)
            futs = {
                s: polite_actors[s].thresholds_for.remote([hosts[aidx[j]] for j in idxs])
                for s, idxs in groups.items()
            }
            for s, idxs in groups.items():
                thr = ray.get(futs[s])
                admitted[aidx[idxs]] = disc[aidx[idxs]] <= thr

        keys = ray.get(seq_keys_ref)
        seq = np.searchsorted(keys, disc) + seq_base
        deferred_mask = allowed & ~admitted
        seq[deferred_mask] = -1

        batch = batch.drop_columns(["allowed"]).append_column(
            "seq", pa.array(seq, pa.int64())
        )

        parts = []
        adm_tbl = batch.filter(pa.array(admitted))
        if adm_tbl.num_rows:
            base = murmur3_32(adm_tbl.column("url")[0].as_py().encode()) % n_f
            futs = []
            for j, off in enumerate(range(0, adm_tbl.num_rows, chunk_rows)):
                chunk = adm_tbl.slice(off, chunk_rows)
                futs.append(fetcher_actors[(base + j) % n_f].fetch_parse.remote(chunk))
            parsed = pa.concat_tables(ray.get(futs))
            # parsed lacks the frontier hash/shard cols — zero-fill (only
            # deferred rows need them, to re-enter the next wave's frontier)
            parsed = parsed.append_column(
                "url_hash_lo", pa.array(np.zeros(parsed.num_rows, np.uint64), pa.uint64())
            ).append_column(
                "url_hash_hi", pa.array(np.zeros(parsed.num_rows, np.uint64), pa.uint64())
            ).append_column(
                "shard", pa.array(np.zeros(parsed.num_rows, np.uint32), pa.uint32())
            )
            parts.append(parsed)

        rest = batch.filter(pa.array(~admitted))
        if rest.num_rows:
            # seq == -1 marks deferred (set above); everything else
            # non-admitted was robots-denied
            status = np.where(
                rest.column("seq").to_numpy() == -1, "deferred", "robots_denied"
            )
            rest_out = pa.table(
                {
                    "url": rest.column("url"),
                    "host": rest.column("host"),
                    "depth": rest.column("depth"),
                    "disc_key": rest.column("disc_key"),
                    "seq": rest.column("seq"),
                    "status": pa.array(status.tolist(), pa.string()),
                    "n_out": pa.array(np.zeros(rest.num_rows, np.int32), pa.int32()),
                    "spans": pa.array([[]] * rest.num_rows, empty.schema.field("spans").type),
                    "outlinks": pa.array([[]] * rest.num_rows, pa.list_(pa.string())),
                    "lang_pred": pa.array([""] * rest.num_rows, pa.string()),
                    "n_tokens": pa.array(np.zeros(rest.num_rows, np.int32), pa.int32()),
                    "simhash": pa.array(np.zeros(rest.num_rows, np.uint64), pa.uint64()),
                    "url_hash_lo": rest.column("url_hash_lo"),
                    "url_hash_hi": rest.column("url_hash_hi"),
                    "shard": rest.column("shard"),
                }
            )
            parts.append(rest_out)
        if not parts:
            return empty
        return pa.concat_tables([p.select(empty.column_names) for p in parts])

    return fn


def make_threshold_stage(polite_actors):
    """Adds an `admitted` mask: disc_key ≤ the host's admission threshold."""
    n_p = len(polite_actors)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("admitted", pa.array([], pa.bool_()))
        hosts = batch.column("host").to_pylist()
        disc = batch.column("disc_key").to_numpy()
        pshards = np.array([host_shard_of(h, n_p) for h in hosts])
        groups = _group_by_shard(pshards)
        futs = {
            s: polite_actors[s].thresholds_for.remote([hosts[i] for i in idxs])
            for s, idxs in groups.items()
        }
        admitted = np.zeros(n, dtype=bool)
        for s, idxs in groups.items():
            thr = ray.get(futs[s])
            admitted[idxs] = disc[idxs] <= thr
        return batch.append_column("admitted", pa.array(admitted))

    return fn


_ENRICH_STOPWORDS = {
    "en": frozenset("the of and a to in is it that for".split()),
    "de": frozenset("der die das und ist ein nicht mit zu".split()),
    "fr": frozenset("le la les et est un une pas pour".split()),
    "es": frozenset("el la los y es un una no por".split()),
}


def enrich_doc(text: str) -> tuple[str, int, int]:
    """Per-document enrichment for the training-data path: language-ID
    (stopword overlap), token count, and a 64-bit simhash over 3-gram token
    shingles (crc32-hashed, bit-vote accumulated with numpy). This is the
    per-page compute a real 100 TB crawl pipeline runs alongside parse —
    the crawl bench enables it to make the workload representative."""
    import zlib

    tokens = text.split()
    nt = len(tokens)
    wset = set(tokens[:200])
    best, best_n = "und", 0
    for lang, sw in _ENRICH_STOPWORDS.items():
        k = len(wset & sw)
        if k > best_n:
            best, best_n = lang, k
    if nt < 3:
        return best, nt, 0
    crc = zlib.crc32
    hashes = np.array(
        [
            crc(f"{tokens[i]} {tokens[i+1]} {tokens[i+2]}".encode())
            for i in range(nt - 2)
        ],
        dtype=np.uint64,
    )
    # widen crc32 to 64 bits deterministically
    hashes = hashes * np.uint64(0x9E3779B97F4A7C15)
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = bits.sum(axis=0)
    sim = np.uint64(0)
    for b in range(64):
        if votes[b] * 2 >= len(hashes):
            sim |= np.uint64(1) << np.uint64(b)
    return best, nt, int(sim)


class FetchParseStage:
    """Stateful fetch+parse stage (SURVEY.md O-23 + O-14/O-15 fused).

    The fetch backend index (url → html for the synthetic web) is built ONCE
    per actor in __init__ from a zero-copy object-store table ref — the
    canonical "stateful setup once per actor, work per batch" pattern. Fetch
    and parse are fused because the synthetic fetch is an in-memory lookup;
    a real HttpBackend deployment would split them into an I/O pool
    (num_cpus<1) and a CPU parse pool.

    Two deployment modes share this class:
      * `ds.map_batches(FetchParseStage, concurrency=..., fn_constructor_
        kwargs=...)` — Ray Data's actor-pool pattern, used by the standalone
        document-parse pipeline (O-14);
      * wrapped as a persistent `ray.remote` actor pool by the wave loop
        (`make_fetch_stage`) so the pool is created once per CRAWL, not once
        per wave — per-wave actor spin-up dominated wall time otherwise.

    Input batch: FRONTIER cols + seq. Output: one row per input URL with
    status, n_out, interleaved spans, and the page's deduped outlinks.
    """

    def __init__(self, webgraph_ref, enrich: bool = False):
        tbl = ray.get(webgraph_ref) if isinstance(webgraph_ref, ray.ObjectRef) else webgraph_ref
        self.backend = SyntheticBackend(tbl)
        self.enrich = enrich

    def fetch_parse(self, batch: pa.Table) -> pa.Table:
        return self(batch)

    @staticmethod
    def empty_output() -> pa.Table:
        return pa.schema(
            [
                ("url", pa.string()),
                ("host", pa.string()),
                ("depth", pa.int32()),
                ("disc_key", pa.int64()),
                ("seq", pa.int64()),
                ("status", pa.string()),
                ("n_out", pa.int32()),
                ("spans", pa.list_(SPAN_STRUCT)),
                ("outlinks", pa.list_(pa.string())),
                ("lang_pred", pa.string()),
                ("n_tokens", pa.int32()),
                ("simhash", pa.uint64()),
            ]
        ).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        statuses: list[str] = []
        n_outs: list[int] = []
        spans_col: list[list[dict]] = []
        outlinks_col: list[list[str]] = []
        langs: list[str] = []
        n_toks: list[int] = []
        simhashes: list[int] = []
        for u in urls:
            html = self.backend.fetch(u)
            if html is None:
                statuses.append("error")
                n_outs.append(0)
                spans_col.append([])
                outlinks_col.append([])
                langs.append("")
                n_toks.append(0)
                simhashes.append(0)
                continue
            spans, outlinks = parse_page(html, u)
            statuses.append("fetched")
            n_outs.append(len(outlinks))
            spans_col.append(spans_to_dicts(spans))
            outlinks_col.append(outlinks)
            if self.enrich:
                text = " ".join(s.text for s in spans if s.kind == "text")
                lang, nt, sh = enrich_doc(text)
                langs.append(lang)
                n_toks.append(nt)
                simhashes.append(sh)
            else:
                langs.append("")
                n_toks.append(0)
                simhashes.append(0)
        return pa.table(
            {
                "url": batch.column("url"),
                "host": batch.column("host"),
                "depth": batch.column("depth"),
                "disc_key": batch.column("disc_key"),
                "seq": batch.column("seq"),
                "status": pa.array(statuses, pa.string()),
                "n_out": pa.array(n_outs, pa.int32()),
                "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT)),
                "outlinks": pa.array(outlinks_col, pa.list_(pa.string())),
                "lang_pred": pa.array(langs, pa.string()),
                "n_tokens": pa.array(n_toks, pa.int32()),
                "simhash": pa.array(simhashes, pa.uint64()),
            }
        )


# 0.5 CPU per fetcher: the pool oversubscribes slightly so fetch (I/O-ish)
# and parse (CPU) interleave; the feeding map tasks are 0.25-CPU waiters.
FetcherActor = ray.remote(num_cpus=0.5)(FetchParseStage)


def make_fetch_stage(fetcher_actors, chunk_rows: int = 256):
    """Wave-loop fetch stage: fan each batch out as sub-batch RPCs across the
    persistent fetcher pool, awaited in parallel. Round-robin from a
    content-derived base (first-URL hash) keeps load spread deterministic in
    CONTENT, not timing; fine chunks (256 rows) avoid the balls-in-bins
    imbalance a one-batch-one-actor routing shows (~3-4× tail). The map task
    only awaits RPCs (fractional num_cpus); actors do the CPU work."""
    from crawlray.murmur3 import murmur3_32

    n = len(fetcher_actors)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return FetchParseStage.empty_output()
        base = murmur3_32(batch.column("url")[0].as_py().encode()) % n
        futs = []
        for j, off in enumerate(range(0, batch.num_rows, chunk_rows)):
            chunk = batch.slice(off, chunk_rows)
            futs.append(fetcher_actors[(base + j) % n].fetch_parse.remote(chunk))
        return pa.concat_tables(ray.get(futs))

    return fn


def make_explode_stage(max_depth: int | None):
    """Fetched pages → (url, pack) discovery rows; pack carries the dedup
    winner (disc_key, depth) in one int64 so the following within-wave dedup
    is a single vectorized groupby-min (SURVEY.md O-30, §1.3). Only these
    two columns enter the shuffle — minimal exchange volume."""

    def fn(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("status"), "fetched"))
        empty = pa.table({"url": pa.array([], pa.string()), "pack": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        links = b.column("outlinks").combine_chunks()
        flat = links.flatten()
        total = len(flat)
        if total == 0:
            return empty
        parent_idx = pc.list_parent_indices(links).to_numpy().astype(np.int64)
        lengths = pc.list_value_length(links).to_numpy().astype(np.int64)
        starts = np.cumsum(lengths) - lengths
        link_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
        parent_seq = b.column("seq").to_numpy()[parent_idx]
        child_depth = b.column("depth").to_numpy().astype(np.int64)[parent_idx] + 1
        disc = parent_seq * LINK_STRIDE + link_idx
        pack = pack_disc_depth(disc, child_depth)
        tbl = pa.table({"url": flat, "pack": pa.array(pack, pa.int64())})
        if max_depth is not None:
            tbl = tbl.filter(pa.array(child_depth <= max_depth))
        return tbl

    return fn


def make_offer_stage(seen_actors, max_depth: int | None):
    """Fused explode + per-batch pre-combine + keyed offer RPCs (O-15 +
    O-30 map side + O-26 routing). Per batch of parsed pages: explode
    outlinks to (url, pack) vectorized, min-combine duplicates within the
    batch (Arrow group_by — the map-side combiner that cuts RPC volume),
    route by seen-shard and offer. The reduce side (global min + seen
    admission) happens inside the shard actors at finish_wave."""
    n = len(seen_actors)
    explode = make_explode_stage(max_depth)

    def fn(batch: pa.Table) -> pa.Table:
        tbl = explode(batch)
        if tbl.num_rows:
            comb = tbl.group_by(["url"]).aggregate([("pack", "min")])
            urls = comb.column("url").to_pylist()
            packs = comb.column("pack_min").to_numpy()
            shards = np.array([seen_shard_of(u, n) for u in urls])
            futs = [
                seen_actors[s].offer.remote([urls[i] for i in idxs], packs[idxs])
                for s, idxs in _group_by_shard(shards).items()
            ]
            ray.get(futs)
        status = batch.column("status") if "status" in batch.column_names else None
        n_fetched = (
            int(pc.sum(pc.cast(pc.equal(status, "fetched"), pa.int64())).as_py() or 0)
            if status is not None
            else 0
        )
        n_errors = (
            int(pc.sum(pc.cast(pc.equal(status, "error"), pa.int64())).as_py() or 0)
            if status is not None
            else 0
        )
        return pa.table(
            {
                "n_links": pa.array([tbl.num_rows], pa.int64()),
                "n_fetched": pa.array([n_fetched], pa.int64()),
                "n_errors": pa.array([n_errors], pa.int64()),
            }
        )

    return fn


def make_derive_frontier_stage(num_seen_shards: int):
    """Shard-actor finish_wave output (url, pack, hashes) → full FRONTIER
    columns. Host parse + unpack run once per unique new URL."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        disc, depth = unpack_disc_depth(batch.column("pack").to_numpy())
        hosts = [url_host(u) for u in urls]
        shards = np.array([seen_shard_of(u, num_seen_shards) for u in urls], np.uint32)
        return pa.table(
            {
                "url": batch.column("url"),
                "host": pa.array(hosts, pa.string()),
                "depth": pa.array(depth.astype(np.int32), pa.int32()),
                "disc_key": pa.array(disc, pa.int64()),
                "url_hash_lo": batch.column("url_hash_lo"),
                "url_hash_hi": batch.column("url_hash_hi"),
                "shard": pa.array(shards, pa.uint32()),
            }
        )

    return fn


def make_seen_filter_stage(seen_actors):
    """Cross-wave exact dedup: keep only URLs never seen before, adding them
    to the seen set (check_and_add) — key-routed batched RPCs (O-26)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        shards = batch.column("shard").to_numpy()
        urls = batch.column("url").to_pylist()
        lo = batch.column("url_hash_lo").to_numpy()
        hi = batch.column("url_hash_hi").to_numpy()
        groups = _group_by_shard(shards.astype(np.int64))
        futs = {
            s: seen_actors[s].check_and_add.remote(
                [urls[i] for i in idxs], lo[idxs], hi[idxs]
            )
            for s, idxs in groups.items()
        }
        new = np.zeros(n, dtype=bool)
        for s, idxs in groups.items():
            new[idxs] = ray.get(futs[s])
        return batch.filter(pa.array(new))

    return fn


def frontier_table_from_urls(
    urls: list[str], disc_keys: list[int], depths: list[int], num_seen_shards: int
) -> pa.Table:
    """Build FRONTIER rows driver-side (seed bootstrap only — seed lists are
    small by definition; everything discovered flows through the stages)."""
    hosts = [url_host(u) for u in urls]
    lo, hi = hash_urls_128(urls)
    shards = np.array([seen_shard_of(u, num_seen_shards) for u in urls], np.uint32)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(np.asarray(depths, np.int32), pa.int32()),
            "disc_key": pa.array(np.asarray(disc_keys, np.int64), pa.int64()),
            "url_hash_lo": pa.array(lo, pa.uint64()),
            "url_hash_hi": pa.array(hi, pa.uint64()),
            "shard": pa.array(shards, pa.uint32()),
        }
    )
