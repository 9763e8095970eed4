"""The distributed crawl job: bootstrap + wave loop (SURVEY.md §3.2).

Replaces the reference's single-process BFS loop (`while queue: url =
queue.popleft(); ...` — see oracle/bfs_crawler.py, the normative stand-in
for the absent reference snapshot, SURVEY.md §0) with an iterative-batch
Ray Data pipeline: each BFS wave is a bounded streaming execution over
Arrow blocks; cross-wave state lives only in actors (seen shards, robots,
politeness) and checkpoints.

Determinism under parallelism (§4.2): crawl order is never derived from
execution timing — `seq` ranks disc_key (a pure function of the crawl
graph), dedup winners come from order-independent min-combine, politeness
admission from the B-lowest-disc_keys rule. Any num_cpus reproduces the
oracle bit-for-bit; that is what the N→4N scaling criterion rides on.

Per-wave dataflow (stage ids from SURVEY.md §2; two executions + two
barrier RPC rounds per wave):

    frontier_w (unique URLs, already in the seen set)
      ├─ E1 robots mask + politeness offers   map_batches + keyed actor RPCs
      │     (O-21/22; actors bank denied + offered disc_keys)
      ├─ [driver] decide() → logged key-set comes back FROM the actors;
      │     seq = rank in that sorted set (O-33 without a distributed
      │     sort; `ops.seqassign.sort_and_zip_index` is the sort-based
      │     alternative for configurations with huge per-wave sets)
      ├─ E2 fused gate+seq+fetch+parse        ONE execution: admission
      │     thresholds, searchsorted seq, sub-batch fan-out over the
      │     persistent fetcher pool (O-23/14/15); optional budget prefix
      │     cut (O-35); deferred rows pass through
      ├─ crawl_log_w, documents_w             lazy projections (O-3/4)
      └─ E3 offer discoveries → seen shards   within-wave dedup (O-30) +
            cross-wave admission (O-26) fused in the shard actors
            (offer/finish min-combine); E4 new frontier = actor-returned
            Arrow blocks → derive cols → ∪ deferred → compact (O-37)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from crawlray.actors.politeness import HostPolitenessActor
from crawlray.actors.robots import RobotsCacheActor
from crawlray.actors.seen import SeenShardActor
from crawlray.kernels.url import canonicalize, in_scope
from crawlray.ops.seqassign import sort_and_zip_index
from crawlray.schema import LINK_STRIDE
from crawlray.stages import (
    FRONTIER_COLS,
    FetchParseStage,
    frontier_table_from_urls,
    make_derive_frontier_stage,
    make_gate_seq_fetch_stage,
    make_offer_stage,
    make_robots_offer_stage,
)


def _webgraph_fingerprint(webgraph: pa.Table) -> str:
    """Cheap deterministic content fingerprint of a webgraph table.

    Stored in the checkpoint config and validated on resume so that resuming
    with different --seed/--shape/--n-urls (which would silently continue
    against a DIFFERENT web, breaking the bit-identical resume invariant)
    errors out instead. Samples head+tail URLs: O(1) regardless of scale."""
    import hashlib

    h = hashlib.sha256()
    urls = webgraph.column("url")
    n = len(urls)
    h.update(str(n).encode())
    for i in list(range(min(64, n))) + list(range(max(64, n - 64), n)):
        h.update(str(urls[i]).encode())
    return h.hexdigest()[:16]


def _compact(ds: ray.data.Dataset, cpus: int, rows_per_block: int = 2048) -> ray.data.Dataset:
    """Materialize + bound the block count of a cross-wave dataset.

    Two pathologies compound across the wave loop without this (measured: ~2×
    wall time per wave, exponential):
      * `filter` keeps empty blocks and `union` concatenates block lists, so
        the frontier's block count doubles every wave;
      * operations on a MaterializedDataset still extend the ORIGINAL logical
        plan, so wave w's planning walks the whole history of waves 0..w-1.
    The repartition bounds blocks at min(2·cpus, rows/rows_per_block); the
    `from_arrow_refs` rebase severs the plan at the materialized blocks
    (zero-copy: only refs are re-wrapped)."""
    mat = ds.materialize()
    n = mat.count()
    target = max(1, min(cpus * 2, n // rows_per_block + 1))
    if mat.num_blocks() > target * 2:
        mat = mat.repartition(target).materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    return ray.data.from_arrow_refs(refs)


@dataclass
class CrawlResult:
    crawl_log: ray.data.Dataset
    documents: ray.data.Dataset
    waves: int
    fetched_total: int
    metrics: dict
    _seen_actors: list = field(default_factory=list, repr=False)
    _all_actors: list = field(default_factory=list, repr=False)

    def crawl_log_table(self) -> pa.Table:
        """Small-scale helper (tests): full log as one Arrow table, seq order."""
        t = pa.Table.from_pylist(
            self.crawl_log.take_all(),
            schema=pa.schema(
                [
                    ("seq", pa.int64()),
                    ("url", pa.string()),
                    ("host", pa.string()),
                    ("wave", pa.int32()),
                    ("depth", pa.int32()),
                    ("status", pa.string()),
                    ("n_out", pa.int32()),
                ]
            ),
        )
        return t.take(pc.sort_indices(t, sort_keys=[("seq", "ascending")]))

    def seen_urls(self) -> set[str]:
        """Full seen set (tests; at scale read the checkpoint SEEN_DUMPs)."""
        tables = ray.get([a.dump_delta.remote() for a in self._seen_actors])
        out: set[str] = set()
        for t in tables:
            out.update(t.column("url").to_pylist())
        return out

    def shutdown(self) -> None:
        """Kill the crawl's actors, releasing their resource reservations.

        The result datasets stay consumable: every lazy part chains off
        materialized parents, so no actor is needed after the crawl. Call
        this when done with the result (tests/benches that run many crawls
        in one Ray session would otherwise accumulate actor reservations
        until new fetcher pools can no longer schedule)."""
        for a in self._all_actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self._all_actors = []


def run_crawl(
    seeds: list[str],
    web=None,
    webgraph: pa.Table | None = None,
    robots: pa.Table | None = None,
    budget_per_host: int = 2,
    max_depth: int | None = None,
    max_pages: int | None = None,
    num_seen_shards: int = 4,
    num_robots_shards: int = 2,
    num_host_shards: int = 2,
    fetch_concurrency=None,
    fetch_batch_size: int = 512,
    carryover_tokens: bool = False,
    enrich: bool = False,
    user_agent: str = "*",
    out_dir: str | None = None,
    stop_after_wave: int | None = None,
    _resume_state: dict | None = None,
) -> CrawlResult:
    """Run a full crawl. Caller owns the Ray session (never inits here).

    `web`: a SynthWeb (tables generated driver-side) — or pass `webgraph` /
    `robots` Arrow tables directly (e.g. read from parquet).
    `out_dir`: per-wave checkpoint root (documents, crawl_log, frontier,
    seen deltas, host state, lineage; `_SUCCESS`-committed — see
    crawlray/checkpoint.py). `stop_after_wave`: stop after committing that
    wave (testing hook for resume equivalence).
    """
    import crawlray

    crawlray.ensure_worker_importability()
    if budget_per_host < 1:
        raise ValueError("budget_per_host must be >= 1 (RBC-1)")
    if max_depth is not None and max_depth >= (1 << 10):
        raise ValueError("max_depth must fit the (disc_key, depth) packing")
    if web is not None:
        webgraph = web.webgraph_table()
        robots = web.robots_table()
    if webgraph is None:
        raise ValueError("need web= or webgraph=")
    webgraph_ref = ray.put(webgraph)
    robots_ref = ray.put(robots) if robots is not None else None

    seen_actors = [
        SeenShardActor.remote(i, cuckoo_capacity=max(1 << 14, webgraph.num_rows * 2))
        for i in range(num_seen_shards)
    ]
    robots_actors = [
        RobotsCacheActor.remote(i, num_robots_shards, robots_ref, user_agent)
        for i in range(num_robots_shards)
    ]
    polite_actors = [
        HostPolitenessActor.remote(
            i, rate=float(budget_per_host), burst=float(budget_per_host),
            carryover=carryover_tokens,
        )
        for i in range(num_host_shards)
    ]

    fetched_total = 0
    seq_base = 0
    wave = 0
    if _resume_state is None:
        # ---- bootstrap: seeds (RBC-4) — canonicalize, scope, dedup keeping
        # the first occurrence (driver-side: seed lists are small by definition)
        seed_urls, seed_keys, seed_depths = [], [], []
        seed_seen: set[str] = set()
        for i, s in enumerate(seeds):
            c = canonicalize(s)
            if c is None or not in_scope(c) or c in seed_seen:
                continue
            seed_seen.add(c)
            seed_urls.append(c)
            seed_keys.append(-LINK_STRIDE + i)
            seed_depths.append(0)
        ray.get([a.begin_wave.remote(0) for a in seen_actors])
        frontier_tbl = frontier_table_from_urls(
            seed_urls, seed_keys, seed_depths, num_seen_shards
        )
        if frontier_tbl.num_rows:
            # register seeds in the seen set
            shards = frontier_tbl.column("shard").to_numpy()
            futs = {}
            for s in sorted(set(shards.tolist())):
                idx = np.nonzero(shards == s)[0]
                futs[s] = seen_actors[s].check_and_add.remote(
                    [seed_urls[i] for i in idx],
                    frontier_tbl.column("url_hash_lo").to_numpy()[idx],
                    frontier_tbl.column("url_hash_hi").to_numpy()[idx],
                )
            ray.get(list(futs.values()))
    else:
        # ---- resume: re-ingest seen deltas, host state, stored frontier
        frontier_tbl = _resume_state["frontier_tbl"]
        wave = _resume_state["wave0"]
        seq_base = _resume_state["seq_base"]
        fetched_total = _resume_state["fetched_total"]
        ingests = []
        for shard_id, (lo, hi) in _resume_state["seen_hashes"].items():
            ingests.append(seen_actors[shard_id].ingest.remote(lo, hi))
        ray.get(ingests)
        loads = []
        for shard_id, st in _resume_state["host_state"].items():
            loads.append(
                polite_actors[shard_id].load_host_state.remote(
                    st["hosts"], st["tokens"], st["fetched"]
                )
            )
        ray.get(loads)

    frontier = ray.data.from_arrow(frontier_tbl)
    n_frontier = frontier_tbl.num_rows
    robots_offer = make_robots_offer_stage(robots_actors, polite_actors)
    offer_stage = make_offer_stage(seen_actors, max_depth)
    derive = make_derive_frontier_stage(num_seen_shards)

    # persistent fetch+parse pool: created once per CRAWL (not per wave —
    # per-wave map_batches actor pools pay actor spin-up every wave)
    if fetch_concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_fetchers = max(2, int(cpus * 0.75))
    elif isinstance(fetch_concurrency, tuple):
        n_fetchers = max(fetch_concurrency)
    else:
        n_fetchers = int(fetch_concurrency)
    from crawlray.stages import FetcherActor, make_fetch_stage

    fetcher_actors = [
        FetcherActor.remote(webgraph_ref, enrich) for _ in range(n_fetchers)
    ]
    fetch_stage = make_fetch_stage(fetcher_actors)

    log_parts: list[ray.data.Dataset] = []
    doc_parts: list[ray.data.Dataset] = []
    metrics: dict = {"waves": []}
    waves_done = wave
    stop = False

    checkpointer = None
    if out_dir is not None:
        from crawlray.checkpoint import Checkpointer

        cfg = {
            "budget_per_host": budget_per_host,
            "max_depth": max_depth,
            "max_pages": max_pages,
            "num_seen_shards": num_seen_shards,
            "num_robots_shards": num_robots_shards,
            "num_host_shards": num_host_shards,
            "carryover_tokens": carryover_tokens,
            "user_agent": user_agent,
            "webgraph_fingerprint": _webgraph_fingerprint(webgraph),
        }
        checkpointer = Checkpointer(out_dir, cfg)

    import os as _os
    import sys as _sys
    import time as _time

    _profile = _os.environ.get("CRAWLRAY_PROFILE") == "1"

    def _tick(label: str, t0: float) -> float:
        now = _time.time()
        if _profile:
            print(f"#   w{wave} {label}: {now - t0:.2f}s", file=_sys.stderr, flush=True)
        return now

    while not stop:
        if n_frontier == 0:
            break
        # Budget already exhausted at wave start (e.g. resuming a checkpoint
        # that finished on max_pages but committed a non-empty frontier):
        # fetching the wave and discarding it would issue real requests under
        # an HTTP backend and corrupt seq_base. Stop before E1.
        if max_pages is not None and fetched_total >= max_pages:
            break
        _t = _time.time()
        ray.get(
            [a.begin_wave.remote(wave) for a in seen_actors]
            + [a.begin_wave.remote(wave) for a in polite_actors]
            + [a.begin_wave.remote(wave) for a in robots_actors]
        )

        # E1: robots mask + politeness offers (one streaming pass). The
        # robots actors bank denied disc_keys, the politeness actors the
        # offered keys, so the wave's logged key-set comes back from the
        # actors — no distributed sort needed for order assignment.
        marked = frontier.map_batches(robots_offer, batch_format="pyarrow").materialize()
        decisions = ray.get([a.decide.remote() for a in polite_actors])
        n_admitted = sum(d[0] for d in decisions)
        n_offered = sum(d[1] for d in decisions)
        n_deferred = n_offered - n_admitted
        denied_keys = ray.get([a.drain_denied.remote() for a in robots_actors])
        admitted_keys = ray.get([a.drain_admitted.remote() for a in polite_actors])
        logged_keys = np.sort(
            np.concatenate(
                [k.astype(np.int64) for k in denied_keys + admitted_keys]
                or [np.empty(0, np.int64)]
            )
        )
        n_logged = int(len(logged_keys))
        seq_keys_ref = ray.put(logged_keys)
        _t = _tick("robots+offer+decide", _t)

        # E2: ONE fused execution — politeness gate, seq assignment
        # (searchsorted into the broadcast logged-key array, RBC-7 order),
        # fetch + parse fan-out over the persistent actor pool
        gate_fetch = make_gate_seq_fetch_stage(
            polite_actors, fetcher_actors, seq_keys_ref, seq_base
        )
        staged = marked.map_batches(
            gate_fetch,
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: keeps many chunk RPCs in
            # flight per feeder task, avoiding actor-pool pipeline bubbles
            num_cpus=0.25,
        ).materialize()
        _t = _tick("gate+seq+fetch", _t)

        # E3 (slow path, only when a global page budget is set): count this
        # wave's successful fetches, cut the wave at the budget-th fetch in
        # seq (= disc_key) order, O-35
        cut_seq = None
        wave_fetched = None
        if max_pages is not None:
            wave_fetched = staged.filter(expr="status == 'fetched'").count()
            if fetched_total + wave_fetched > max_pages:
                r = max_pages - fetched_total
                pairs = sorted(
                    (row["seq"], row["status"])
                    for row in staged.select_columns(["seq", "status"]).take_all()
                    if row["status"] in ("fetched", "error", "robots_denied")
                )
                n_f = 0
                for s, st in pairs:
                    if st == "fetched":
                        n_f += 1
                        if n_f == r:
                            cut_seq = s
                            break
                staged = (
                    staged.filter(expr=f"seq <= {cut_seq}")
                    .filter(expr="status != 'deferred'")
                    .materialize()
                )
                wave_fetched = r
                stop = True

        # E4: crawl_log + documents projections (lazy over materialized
        # parents; wave bound BY VALUE — they execute after the loop moves on)
        def _log_cols(wave_val=wave):
            def fn(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "seq": b.column("seq"),
                        "url": b.column("url"),
                        "host": b.column("host"),
                        "wave": pa.array(np.full(b.num_rows, wave_val, np.int32), pa.int32()),
                        "depth": b.column("depth"),
                        "status": b.column("status"),
                        "n_out": b.column("n_out"),
                    }
                )

            return fn

        wave_log = staged.filter(expr="status != 'deferred'").map_batches(
            _log_cols(), batch_format="pyarrow"
        )
        log_parts.append(wave_log)
        wave_docs = staged.filter(expr="status == 'fetched'").map_batches(
            lambda b: pa.table({"doc_id": b.column("url"), "spans": b.column("spans")}),
            batch_format="pyarrow",
        )
        doc_parts.append(wave_docs)
        deferred = staged.filter(expr="status == 'deferred'").map_batches(
            lambda b: b.select(FRONTIER_COLS), batch_format="pyarrow"
        )

        # E5: discoveries → within-wave dedup + seen admission fused into the
        # shard actors (offer/finish two-phase; min-combine is order-
        # independent ⇒ deterministic under any parallelism — replaces the
        # sort-based groupby shuffle that dominated wall time)
        counts = staged.map_batches(
            offer_stage, batch_format="pyarrow", num_cpus=0.5
        ).take_all()  # barrier: all offers delivered; tiny per-batch counts
        if wave_fetched is None:
            wave_fetched = sum(c["n_fetched"] for c in counts)
        new_frontier = ray.data.from_arrow_refs(
            [a.finish_wave.remote() for a in seen_actors]
        ).map_batches(derive, batch_format="pyarrow")
        _t = _tick("explode+dedup+seen", _t)

        cpus = int(ray.cluster_resources().get("CPU", 4))
        frontier = _compact(
            new_frontier.union(deferred) if n_deferred else new_frontier, cpus
        )
        n_frontier_next = frontier.count() if not isinstance(frontier, int) else 0
        n_new = n_frontier_next - n_deferred
        _t = _tick("frontier-compact", _t)
        fetched_total += wave_fetched
        seq_base += n_logged if cut_seq is None else wave_log.count()
        metrics["waves"].append(
            {
                "wave": wave,
                "frontier": n_frontier,
                "logged": n_logged,
                "fetched": wave_fetched,
                "deferred": n_deferred,
                "discovered_new": n_new,
            }
        )
        if checkpointer is not None:
            checkpointer.commit_wave(
                wave=wave,
                frontier_next=frontier if n_frontier_next else None,
                wave_log=wave_log,
                wave_docs=wave_docs,
                seen_actors=seen_actors,
                polite_actors=polite_actors,
                metrics=metrics["waves"][-1],
                seq_base=seq_base,
                fetched_total=fetched_total,
            )

        waves_done = wave + 1
        if stop_after_wave is not None and wave >= stop_after_wave:
            break
        if stop:
            break
        n_frontier = n_frontier_next
        wave += 1

    empty_log = ray.data.from_arrow(
        pa.table(
            {
                "seq": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "wave": pa.array([], pa.int32()),
                "depth": pa.array([], pa.int32()),
                "status": pa.array([], pa.string()),
                "n_out": pa.array([], pa.int32()),
            }
        )
    )
    def _assemble(parts, empty):
        if not parts:
            return empty
        if len(parts) == 1:  # Dataset.union requires >= 2 children
            return parts[0]
        return parts[0].union(*parts[1:])

    crawl_log = _assemble(log_parts, empty_log)
    from crawlray.schema import DOCUMENTS

    documents = _assemble(doc_parts, ray.data.from_arrow(DOCUMENTS.empty_table()))
    metrics["fetched_total"] = fetched_total
    # fetchers are never needed after the wave loop — release their CPUs now
    for a in fetcher_actors:
        try:
            ray.kill(a)
        except Exception:
            pass
    return CrawlResult(
        crawl_log=crawl_log,
        documents=documents,
        waves=waves_done if log_parts else 0,
        fetched_total=fetched_total,
        metrics=metrics,
        _seen_actors=seen_actors,
        _all_actors=seen_actors + robots_actors + polite_actors,
    )


def resume_crawl(
    out_dir: str,
    web=None,
    webgraph: pa.Table | None = None,
    robots: pa.Table | None = None,
    fetch_concurrency=None,
    fetch_batch_size: int = 512,
    stop_after_wave: int | None = None,
) -> CrawlResult:
    """Resume a checkpointed crawl from its newest committed wave (O-6, §3.3).

    Reads the stored config (the crawl's semantics are pinned by the
    checkpoint, not the caller), deletes uncommitted wave dirs, rebuilds the
    actors from the committed seen-deltas + host state, and continues the
    wave loop. Invariant (tested): run(0..end) ≡ run(0..k) + resume(k..end)
    bit-for-bit. The returned result's crawl_log/documents are assembled
    from ALL committed waves (pre- and post-resume).
    """
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    from crawlray.checkpoint import Checkpointer

    with open(_os.path.join(out_dir, "config.json")) as f:
        cfg = _json.load(f)["config"]
    if web is not None and webgraph is None:
        webgraph = web.webgraph_table()
        robots = web.robots_table()
        web = None
    want_fp = cfg.get("webgraph_fingerprint")
    if want_fp is not None and webgraph is not None:
        got_fp = _webgraph_fingerprint(webgraph)
        if got_fp != want_fp:
            raise ValueError(
                f"resume webgraph mismatch: checkpoint was written against web "
                f"fingerprint {want_fp}, caller supplied {got_fp} — resuming "
                f"would continue against a different web"
            )
    Checkpointer.clean_uncommitted(out_dir)
    waves = Checkpointer.committed_waves(out_dir)
    if not waves:
        raise ValueError(f"no committed waves under {out_dir}")
    last = waves[-1]
    meta = Checkpointer.load_meta(out_dir, last)

    frontier_tbl = _pq.read_table(
        _os.path.join(out_dir, f"wave={last:05d}", "frontier")
    )
    seen_hashes: dict[int, tuple[list, list]] = {}
    for w in waves:
        sdir = _os.path.join(out_dir, f"wave={w:05d}", "seen_delta")
        for fname in _os.listdir(sdir):
            shard_id = int(fname.split("=")[1].split(".")[0])
            t = _pq.read_table(_os.path.join(sdir, fname))
            lo, hi = seen_hashes.setdefault(shard_id, ([], []))
            lo.extend(t.column("url_hash_lo").to_pylist())
            hi.extend(t.column("url_hash_hi").to_pylist())
    host_state: dict[int, dict] = {}
    hdir = _os.path.join(out_dir, f"wave={last:05d}", "host_state")
    for fname in _os.listdir(hdir):
        shard_id = int(fname.split("=")[1].split(".")[0])
        t = _pq.read_table(_os.path.join(hdir, fname))
        host_state[shard_id] = {
            "hosts": t.column("host").to_pylist(),
            "tokens": t.column("tokens").to_pylist(),
            "fetched": t.column("fetched_total").to_pylist(),
        }

    res = run_crawl(
        seeds=[],
        web=web,
        webgraph=webgraph,
        robots=robots,
        budget_per_host=cfg["budget_per_host"],
        max_depth=cfg["max_depth"],
        max_pages=cfg["max_pages"],
        num_seen_shards=cfg["num_seen_shards"],
        num_robots_shards=cfg["num_robots_shards"],
        num_host_shards=cfg["num_host_shards"],
        carryover_tokens=cfg["carryover_tokens"],
        user_agent=cfg["user_agent"],
        fetch_concurrency=fetch_concurrency,
        fetch_batch_size=fetch_batch_size,
        out_dir=out_dir,
        stop_after_wave=stop_after_wave,
        _resume_state={
            "frontier_tbl": frontier_tbl,
            "wave0": last + 1,
            "seq_base": meta["seq_base_after"],
            "fetched_total": meta["fetched_total_after"],
            "seen_hashes": seen_hashes,
            "host_state": host_state,
        },
    )
    log_ds, doc_ds = Checkpointer.read_results(out_dir)
    if log_ds is not None:
        res.crawl_log = log_ds
    if doc_ds is not None:
        res.documents = doc_ds
    return res
