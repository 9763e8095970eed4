"""Per-wave pipeline stages (SURVEY.md §3.2).

Round-2 architecture: the wave hot loop runs as plain Ray tasks over Arrow
block refs plus key-routed actor RPCs, NOT as per-wave Ray Data streaming
executions. Rationale (measured, BENCH/BASELINE.md round 1): each streaming
execution costs a 0.2–0.5 s driver floor and the wave loop needed ~6 of
them per wave — pure fixed cost that capped N→4N scaling efficiency at
0.40. The wave loop is exactly the case the Dataset API cannot express
without that cost: an iterative loop over shared mutable actor state (the
sharded seen set, politeness buckets). Ray Data remains the IR everywhere
else — blocks are Arrow tables in the object store, the crawl's public
outputs are `ray.data.Dataset`s, and every library operator (ops/) is
Dataset-based.

Data-volume design (the second round-1 scale fix): parsed span payloads
never transit the object store. Fetcher actors buffer their own documents
and write them straight to per-wave parquet (one file per actor per wave —
the resumable, partitioned layout), and offer extracted outlinks directly
to the seen-shard actors (map-side min-combine first). What flows back
through task returns is only the small crawl-log projection.

Stage functions that talk to stateful actors group their batch rows by the
target shard and issue ONE batched RPC per shard per batch — key-routed
RPCs instead of a Ray Data shuffle (SURVEY.md O-26). All stages are
retry-safe: robots lookups are read-only, politeness offers and seen-shard
offers are min-combine idempotent, and fetchers deduplicate re-sent chunks
by (wave, first disc_key).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from crawlray.actors.politeness import NO_ADMIT, host_shard_of
from crawlray.actors.robots import robots_shard_of
from crawlray.backend import SyntheticBackend
from crawlray.kernels.html import parse_page, spans_to_dicts
from crawlray.kernels.url import url_host
from crawlray.murmur3 import hash_urls_128
from crawlray.schema import LINK_STRIDE, SPAN_STRUCT, pack_disc_depth, unpack_disc_depth

FRONTIER_COLS = ["url", "host", "depth", "disc_key", "url_hash_lo", "url_hash_hi", "shard"]

LOG_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("wave", pa.int32()),
        ("depth", pa.int32()),
        ("status", pa.string()),
        ("n_out", pa.int32()),
    ]
)

DOC_FILE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq", pa.int64()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("lang_pred", pa.string()),
        ("n_tokens", pa.int32()),
        ("simhash", pa.uint64()),
    ]
)


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


# --------------------------------------------------------------------------
# phase A: robots mask + politeness offers (one task per frontier block)
# --------------------------------------------------------------------------


def mark_block(
    batch: pa.Table,
    robots_actors,
    polite_actors,
    wave: int = 0,
    frontier_steps=None,
    policy=None,
) -> pa.Table:
    """Applies the registered frontier steps, assigns each row's ORDER KEY
    (`okey`, from the priority policy — O-48; BFS default = disc_key), adds
    an `allowed` robots mask, and registers politeness offers for allowed
    rows — two batched RPC fan-outs. The robots actors bank the denied
    okeys and the politeness actors the offered okeys, so after
    decide_and_drain() the driver recovers the wave's full logged key-set
    from the actors without touching the data again."""
    for st in frontier_steps or ():
        batch = st(batch)
    n = batch.num_rows
    if n == 0:
        return batch.append_column("okey", pa.array([], pa.int64())).append_column(
            "allowed", pa.array([], pa.bool_())
        )
    okey = (
        batch.column("disc_key").to_numpy().astype(np.int64)
        if policy is None
        else np.asarray(policy(batch, wave), dtype=np.int64)
    )
    batch = batch.append_column("okey", pa.array(okey, pa.int64()))
    n_r = len(robots_actors)
    n_p = len(polite_actors)
    hosts = batch.column("host").to_pylist()
    urls = batch.column("url").to_pylist()

    rshards = np.array([robots_shard_of(h, n_r) for h in hosts])
    rgroups = _group_by_shard(rshards)
    futs = {
        s: robots_actors[s].allowed.remote(
            [hosts[i] for i in idxs], [urls[i] for i in idxs], okey[idxs]
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
                [hosts[aidx[j]] for j in idxs], okey[aidx[idxs]]
            )
            for s, idxs in _group_by_shard(pshards).items()
        ]
        ray.get(ofuts)
    return batch.append_column("allowed", pa.array(allowed))


@ray.remote(num_cpus=0.5)
def mark_block_task(
    block: pa.Table, robots_actors, polite_actors, wave: int = 0,
    frontier_steps=None, policy=None,
) -> pa.Table:
    return mark_block(block, robots_actors, polite_actors, wave, frontier_steps, policy)


# --------------------------------------------------------------------------
# enrichment kernels (run inside fetcher actors, alongside parse)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# outlink explode (vectorized; used by fetcher offers and the library op)
# --------------------------------------------------------------------------


def explode_outlinks(batch: pa.Table, max_depth: int | None) -> pa.Table:
    """Fetched pages → (url, pack) discovery rows; pack carries the dedup
    winner (disc_key, depth) in one int64 so within-wave dedup is a single
    vectorized min-combine (SURVEY.md O-30, §1.3). Only these two columns
    enter the exchange — minimal volume."""
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


def make_explode_stage(max_depth: int | None):
    """Ray-Data-facing wrapper over explode_outlinks (library surface)."""

    def fn(batch: pa.Table) -> pa.Table:
        return explode_outlinks(batch, max_depth)

    return fn


# --------------------------------------------------------------------------
# fetch + parse + doc write + offer — the stateful heart of the wave
# --------------------------------------------------------------------------


class FetchParseStage:
    """Stateful fetch+parse stage (SURVEY.md O-23 + O-14/O-15 fused).

    The fetch backend index (url → html for the synthetic web) is built ONCE
    per actor in __init__ from zero-copy object-store table refs — the
    canonical "stateful setup once per actor, work per batch" pattern.

    Wave mode (`fetch_parse_wave`) additionally:
      * buffers this actor's parsed documents and writes them to
        `doc_root/wave=W/documents/part-<actor>.parquet` at end_wave —
        span payloads never transit the object store, and the per-wave
        per-actor files are the resumable partitioned output layout;
      * explodes + min-combines outlinks per chunk and offers them
        directly to the seen-shard actors (fire-and-forget futures,
        awaited at end_wave) — the map side of within-wave dedup runs
        where the data already is.
    When a global page budget is active (`defer_offers=True`), offers and
    doc writes are deferred to end_wave(cut_seq), which filters both to
    seq ≤ cut_seq — the deterministic budget prefix (RBC-10) requires the
    wave barrier anyway.

    Also usable as a plain Ray Data actor-pool stage:
    `ds.map_batches(FetchParseStage, concurrency=..., fn_constructor_kwargs=
    {"webgraph_ref": ref})` for the standalone document-parse pipeline.
    """

    def __init__(
        self,
        webgraph_ref,
        enrich: bool = False,
        seen_actors=None,
        num_seen_shards: int = 0,
        max_depth: int | None = None,
        doc_root: str | None = None,
        actor_idx: int = 0,
        defer_offers: bool = False,
        web_index_refs: tuple | None = None,
        doc_steps=None,
        metrics_actor=None,
    ):
        if web_index_refs is not None:
            # scale path: pre-sorted shared url index (built ONCE by
            # build_web_index_task) + the original webgraph blocks — actor
            # init is zero-copy gets, not a per-actor Python dict build,
            # and the multi-GB html payload is never copied
            urls_ref, perm_ref, wg_refs = web_index_refs
            urls = ray.get(urls_ref) if isinstance(urls_ref, ray.ObjectRef) else urls_ref
            perm = ray.get(perm_ref) if isinstance(perm_ref, ray.ObjectRef) else perm_ref
            if isinstance(wg_refs, list):
                wg = pa.concat_tables(ray.get(wg_refs))
            elif isinstance(wg_refs, ray.ObjectRef):
                wg = ray.get(wg_refs)
            else:
                wg = wg_refs
            self.backend = SyntheticBackend.from_sorted_index(
                urls, perm, wg.column("html")
            )
        else:
            if isinstance(webgraph_ref, list):
                tbl = pa.concat_tables(ray.get(webgraph_ref))  # zero-copy chunks
            elif isinstance(webgraph_ref, ray.ObjectRef):
                tbl = ray.get(webgraph_ref)
            else:
                tbl = webgraph_ref
            self.backend = SyntheticBackend(tbl)
        self.enrich = enrich
        self.seen_actors = seen_actors or []
        self.num_seen_shards = num_seen_shards
        self.max_depth = max_depth
        self.doc_root = doc_root
        self.actor_idx = actor_idx
        self.defer_offers = defer_offers
        self.doc_steps = list(doc_steps or ())  # registered document steps
        self.metrics_actor = metrics_actor  # O-24 counter sink (optional)
        self._wave_fetched = 0
        self._wave_errors = 0
        self._busy_pushed = 0.0
        self._doc_buf: list[pa.Table] = []
        self._link_buf: list[pa.Table] = []  # only when defer_offers
        self._pending_offers: list = []
        self._chunks_done: set[tuple[int, int]] = set()
        self._wave = -1
        self._busy = 0.0  # cumulative seconds inside fetch_parse_wave

    def busy_seconds(self) -> float:
        return self._busy

    # ---- full-output mode (standalone Ray Data pipelines) ----------------

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
        htmls = self.backend.fetch_many(urls)
        for u, html in zip(urls, htmls):
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

    # ---- wave mode -------------------------------------------------------

    def _offer_links(self, links: pa.Table) -> None:
        """Map-side combine + key-routed offer to the seen shards. Futures
        are banked and awaited at end_wave (delivery must complete before
        finish_wave resolves the wave's dedup)."""
        if links.num_rows == 0:
            return
        comb = links.group_by(["url"]).aggregate([("pack", "min")])
        urls = comb.column("url").to_pylist()
        packs = comb.column("pack_min").to_numpy()
        shards = np.array([seen_shard_of(u, self.num_seen_shards) for u in urls])
        for s, idxs in _group_by_shard(shards).items():
            self._pending_offers.append(
                self.seen_actors[s].offer.remote([urls[i] for i in idxs], packs[idxs])
            )

    def fetch_parse_wave(self, chunk: pa.Table, wave: int) -> pa.Table:
        """Fetch+parse one chunk; buffer docs, offer outlinks; return ONLY
        the small crawl-log projection (no spans, no outlinks)."""
        import time as _time

        _t0 = _time.time()
        try:
            return self._fetch_parse_wave(chunk, wave)
        finally:
            self._busy += _time.time() - _t0

    def _fetch_parse_wave(self, chunk: pa.Table, wave: int) -> pa.Table:
        if wave != self._wave:
            # a new wave implicitly confirms the previous one was flushed
            self._wave = wave
            self._chunks_done = set()
        key = (wave, int(chunk.column("disc_key")[0].as_py())) if chunk.num_rows else None
        if key is not None and key in self._chunks_done:
            # re-sent chunk (task retry upstream): docs/offers already banked
            full = self(chunk)
            return full.select(["url", "host", "depth", "disc_key", "seq", "status", "n_out"])
        full = self(chunk)
        fetched = full.filter(pc.equal(full.column("status"), "fetched"))
        self._wave_fetched += fetched.num_rows
        self._wave_errors += full.num_rows - fetched.num_rows
        if fetched.num_rows:
            doc_tbl = pa.table(
                {
                    "doc_id": fetched.column("url"),
                    "seq": fetched.column("seq"),
                    "spans": fetched.column("spans"),
                    "lang_pred": fetched.column("lang_pred"),
                    "n_tokens": fetched.column("n_tokens"),
                    "simhash": fetched.column("simhash"),
                }
            )
            for st in self.doc_steps:  # O-45 document hook, in-actor
                doc_tbl = st(doc_tbl)
            self._doc_buf.append(doc_tbl)
        if self.defer_offers:
            # budget path: bank discoveries with parent seq attached so the
            # cut can filter them at end_wave (RBC-10 deterministic prefix)
            links = self._links_with_seq(full)
            if links.num_rows:
                self._link_buf.append(links)
        else:
            self._offer_links(explode_outlinks(full, self.max_depth))
        if key is not None:
            self._chunks_done.add(key)
        return full.select(["url", "host", "depth", "disc_key", "seq", "status", "n_out"])

    def _links_with_seq(self, full: pa.Table) -> pa.Table:
        """(url, pack, parent_seq) discovery rows — defer_offers path only."""
        b = full.filter(pc.equal(full.column("status"), "fetched"))
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "pack": pa.array([], pa.int64()),
                "parent_seq": pa.array([], pa.int64()),
            }
        )
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
        tbl = pa.table(
            {
                "url": flat,
                "pack": pa.array(pack, pa.int64()),
                "parent_seq": pa.array(parent_seq, pa.int64()),
            }
        )
        if self.max_depth is not None:
            tbl = tbl.filter(pa.array(child_depth <= self.max_depth))
        return tbl

    def end_wave(self, wave: int, cut_seq: int | None = None) -> int:
        """Flush this actor's wave state: resolve deferred offers (budget
        path), await offer delivery, write the doc buffer to the wave's
        parquet partition. Returns the number of documents written."""
        if self._link_buf:
            links = pa.concat_tables(self._link_buf)
            self._link_buf = []
            if cut_seq is not None:
                links = links.filter(pc.less_equal(links.column("parent_seq"), cut_seq))
            self._offer_links(links.select(["url", "pack"]))
        if self._pending_offers:
            ray.get(self._pending_offers)
            self._pending_offers = []
        n = 0
        if self._doc_buf:
            docs = pa.concat_tables(self._doc_buf)
            self._doc_buf = []
            if cut_seq is not None:
                docs = docs.filter(pc.less_equal(docs.column("seq"), cut_seq))
            if docs.num_rows and self.doc_root is not None:
                d = os.path.join(self.doc_root, f"wave={wave:05d}", "documents")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    docs, os.path.join(d, f"part-{self.actor_idx:04d}.parquet")
                )
                n = docs.num_rows
        self._chunks_done = set()
        if self.metrics_actor is not None:
            # fire-and-forget: counters must never add a wave barrier
            self.metrics_actor.incr.remote(
                {
                    "pages_fetched": self._wave_fetched,
                    "fetch_errors": self._wave_errors,
                    "docs_written": n,
                    "fetcher_busy_s": round(self._busy - self._busy_pushed, 3),
                }
            )
            self._wave_fetched = 0
            self._wave_errors = 0
            self._busy_pushed = self._busy
        return n


# 0.5 CPU per fetcher: the pool oversubscribes slightly so fetch (I/O-ish)
# and parse (CPU) interleave; the feeding tasks are 0.25-CPU waiters.
FetcherActor = ray.remote(num_cpus=0.5)(FetchParseStage)


@ray.remote(num_cpus=1, num_returns=2)
def build_web_index_task(*tables: pa.Table):
    """Sort the webgraph URLS once, in one task; the returned small
    (urls_sorted numpy, perm numpy) pair is shared zero-copy with every
    fetcher actor, which combines it with the untouched webgraph html
    blocks (see SyntheticBackend.from_sorted_index)."""
    wg = pa.concat_tables(list(tables))
    return SyntheticBackend.build_sorted_index(wg)


# --------------------------------------------------------------------------
# phase B: gate + seq + fetch fan-out (one task per marked block)
# --------------------------------------------------------------------------


def _empty_counts() -> dict:
    return {"n_fetched": 0, "n_errors": 0, "n_denied": 0, "n_deferred": 0}


@ray.remote(num_cpus=0.5, num_returns=3)
def fetch_block_task(
    block: pa.Table,
    thr_hosts: np.ndarray,
    thr_vals: np.ndarray,
    logged_keys: np.ndarray,
    seq_base: int,
    wave: int,
    fetchers: list,
    chunk_rows: int,
    chunk_base: int = 0,
):
    """Politeness gate (vectorized lookup into the broadcast per-host
    admission thresholds) → seq assignment (searchsorted into the broadcast
    sorted logged-key array — RBC-7 order, no distributed sort) → fan-out
    fetch across the persistent actor pool. Returns (log_block,
    deferred_block, counts); spans/outlinks never pass through here.

    Scale note (SURVEY.md §7.3-H4): the broadcast key/threshold arrays are
    the wave's LOGGED set and ACTIVE host set, bounded by politeness
    (≤ B × active hosts per wave), not by frontier or discovery volume."""
    empty_def = pa.schema(
        [
            ("url", pa.string()),
            ("host", pa.string()),
            ("depth", pa.int32()),
            ("disc_key", pa.int64()),
            ("url_hash_lo", pa.uint64()),
            ("url_hash_hi", pa.uint64()),
            ("shard", pa.uint32()),
        ]
    ).empty_table()
    if block.num_rows == 0:
        return LOG_SCHEMA.empty_table(), empty_def, _empty_counts()
    n = block.num_rows
    allowed = block.column("allowed").to_numpy(zero_copy_only=False)
    okey = block.column("okey").to_numpy()
    hosts = np.asarray(block.column("host").to_pylist(), dtype=np.str_)

    thr = np.full(n, NO_ADMIT, np.int64)
    if len(thr_hosts):
        pos = np.searchsorted(thr_hosts, hosts)
        pos_c = np.minimum(pos, len(thr_hosts) - 1)
        m = thr_hosts[pos_c] == hosts
        thr[m] = thr_vals[pos_c[m]]
    admitted = allowed & (okey <= thr)
    deferred_mask = allowed & ~admitted

    # seq = rank of the row's ORDER KEY in the wave's logged key-set
    # (okey = disc_key under the default BFS policy — RBC-7)
    seq = np.searchsorted(logged_keys, okey).astype(np.int64) + seq_base
    base_tbl = block.select(["url", "host", "depth", "disc_key"]).append_column(
        "seq", pa.array(seq, pa.int64())
    )

    log_parts: list[pa.Table] = []
    counts = _empty_counts()
    adm_tbl = base_tbl.filter(pa.array(admitted))
    if adm_tbl.num_rows:
        n_f = len(fetchers)
        base = chunk_base % n_f
        # static round-robin from a driver-assigned global offset: the
        # driver passes each block the running chunk count of the blocks
        # before it, so the WHOLE WAVE forms one round-robin across the
        # fetcher pool (±1 chunk per actor) instead of independently-phased
        # per-block rotations (measured ~12%-of-wall tail). Deterministic in
        # CONTENT, not timing; all chunk RPCs go out immediately so every
        # actor's queue stays full (a pull-based ray.wait loop was measured
        # ~30% slower — the per-completion round-trip idles actors). The
        # end-of-wave tail is bounded by the adaptive chunk size chosen by
        # the driver (~1/6 of an actor's wave share).
        futs = []
        for j, off in enumerate(range(0, adm_tbl.num_rows, chunk_rows)):
            chunk = adm_tbl.slice(off, chunk_rows)
            futs.append(fetchers[(base + j) % n_f].fetch_parse_wave.remote(chunk, wave))
        results = ray.get(futs)
        fetched_tbl = pa.concat_tables(results)
        st = fetched_tbl.column("status")
        counts["n_fetched"] = int(
            pc.sum(pc.cast(pc.equal(st, "fetched"), pa.int64())).as_py() or 0
        )
        counts["n_errors"] = adm_tbl.num_rows - counts["n_fetched"]
        log_parts.append(fetched_tbl)

    den_tbl = base_tbl.filter(pa.array(~allowed))
    if den_tbl.num_rows:
        counts["n_denied"] = den_tbl.num_rows
        log_parts.append(
            den_tbl.append_column(
                "status", pa.array(["robots_denied"] * den_tbl.num_rows, pa.string())
            ).append_column(
                "n_out", pa.array(np.zeros(den_tbl.num_rows, np.int32), pa.int32())
            )
        )

    if log_parts:
        merged = pa.concat_tables([p.select(
            ["seq", "url", "host", "depth", "status", "n_out"]
        ) for p in log_parts])
        wave_col = pa.array(np.full(merged.num_rows, wave, np.int32), pa.int32())
        log_tbl = pa.table(
            {
                "seq": merged.column("seq"),
                "url": merged.column("url"),
                "host": merged.column("host"),
                "wave": wave_col,
                "depth": merged.column("depth"),
                "status": merged.column("status"),
                "n_out": merged.column("n_out"),
            }
        )
    else:
        log_tbl = LOG_SCHEMA.empty_table()

    deferred = block.select(FRONTIER_COLS).filter(pa.array(deferred_mask))
    counts["n_deferred"] = deferred.num_rows
    return log_tbl, deferred if deferred.num_rows else empty_def, counts


# --------------------------------------------------------------------------
# frontier derivation + compaction helpers
# --------------------------------------------------------------------------


def derive_frontier_block(batch: pa.Table, num_seen_shards: int) -> pa.Table:
    """Shard-actor finish_wave output (url, pack, hashes) → full FRONTIER
    columns. Host parse + unpack run once per unique new URL."""
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


@ray.remote(num_cpus=0.25, num_returns=2)
def derive_block_task(block: pa.Table, num_seen_shards: int):
    t = derive_frontier_block(block, num_seen_shards)
    return t, t.num_rows


@ray.remote(num_cpus=0.25)
def concat_blocks_task(*tbls: pa.Table) -> pa.Table:
    return pa.concat_tables(list(tbls))


@ray.remote(num_cpus=0.25, num_returns=2)
def filter_log_cut_task(block: pa.Table, cut_seq: int):
    """Budget-cut filter for one log block (O-35 rare path)."""
    t = block.filter(pc.less_equal(block.column("seq"), cut_seq))
    return t, t.num_rows


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
