"""Pure-Python single-process BFS crawl oracle — the Reference Behavior
Contract (SURVEY.md §1.4, RBC-1..11) implemented verbatim.

This is the normative stand-in for the reference `lixiaochun/PyCrawler`
(whose snapshot at /root/reference was empty at survey time — SURVEY.md §0):
a sequential fetch-parse-extract loop with a FIFO frontier, an in-process
URL-seen set, per-host politeness and robots caching. The Ray Data engine
(`crawlray.job`) must reproduce this oracle's crawl_log, seen set and
per-document span sequences bit-for-bit on deterministic synthetic webs —
that operationalizes BASELINE.json's "matching the reference's crawl
ordering and URL-seen set under the same seed list + politeness budget".

Wave semantics (deterministic formulation of the FIFO loop):
  * wave w's queue = URLs deferred from wave w-1 ∪ URLs discovered during
    wave w-1 (seeds are wave 0); processed in ascending disc_key
    (= parent_seq * LINK_STRIDE + link_idx; seeds get parent_seq = -1,
    link_idx = seed position, so FIFO order is recovered exactly).
  * per-host token bucket refills to burst=B at wave start; a fetch or a
    fetch error consumes one token; a robots denial consumes none; a URL
    whose host is out of tokens is deferred to wave w+1 unchanged.
  * global page budget G cuts the wave's processing prefix exactly at the
    G-th fetch (in disc_key order); rows after the cut are not logged and
    not processed. The G-th page's outlinks ARE discovered and enter the
    seen set (discoveries of all logged fetched pages count), then the
    crawl stops — the engine mirrors this at wave granularity.
"""

from __future__ import annotations

import urllib.robotparser
from dataclasses import dataclass, field

import pyarrow as pa

from crawlray.backend import FetchBackend
from crawlray.kernels.html import parse_page, spans_to_dicts
from crawlray.kernels.url import canonicalize, in_scope, url_host
from crawlray.schema import CRAWL_LOG, DOCUMENTS, LINK_STRIDE


@dataclass
class CrawlConfig:
    budget_per_host: int = 2  # B: fetches per host per wave (RBC-6)
    max_depth: int | None = None  # D
    max_pages: int | None = None  # G
    user_agent: str = "*"


@dataclass
class OracleResult:
    crawl_log: pa.Table
    documents: pa.Table
    seen: set[str] = field(default_factory=set)
    waves: int = 0


def _parse_robots(body: str | None) -> urllib.robotparser.RobotFileParser:
    rp = urllib.robotparser.RobotFileParser()
    if body is None:
        rp.parse([])  # no robots.txt → allow all
    else:
        rp.parse(body.splitlines())
    return rp


def crawl(seeds: list[str], backend: FetchBackend, cfg: CrawlConfig) -> OracleResult:
    B = cfg.budget_per_host
    if B < 1:
        raise ValueError("budget_per_host must be >= 1 (RBC-1)")
    D = cfg.max_depth
    G = cfg.max_pages

    seen: set[str] = set()
    # frontier entry: (disc_key, url, host, depth)
    wave_queue: list[tuple[int, str, str, int]] = []

    # RBC-4: seeds canonicalized, scope-filtered, deduped in list order
    for i, s in enumerate(seeds):
        c = canonicalize(s)
        if c is None or not in_scope(c):
            continue
        if c in seen:
            continue
        seen.add(c)
        wave_queue.append((-LINK_STRIDE + i, c, url_host(c), 0))

    robots_cache: dict[str, urllib.robotparser.RobotFileParser] = {}
    log_rows: list[dict] = []
    doc_rows: list[dict] = []
    seq = 0
    fetched_total = 0
    wave = 0
    stop = False

    while wave_queue and not stop:
        wave_queue.sort(key=lambda e: e[0])  # RBC-5: ascending disc_key
        tokens: dict[str, int] = {}  # refill to burst=B at wave start
        next_queue: list[tuple[int, str, str, int]] = []
        for disc_key, url, host, depth in wave_queue:
            if stop:
                break
            rp = robots_cache.get(host)
            if rp is None:
                rp = _parse_robots(backend.robots(host))
                robots_cache[host] = rp
            if not rp.can_fetch(cfg.user_agent, url):
                log_rows.append(
                    dict(seq=seq, url=url, host=host, wave=wave, depth=depth,
                         status="robots_denied", n_out=0)
                )
                seq += 1
                continue  # no token consumed (RBC-6)
            if tokens.setdefault(host, B) < 1:
                next_queue.append((disc_key, url, host, depth))  # defer
                continue
            tokens[host] -= 1
            html = backend.fetch(url)
            if html is None:
                log_rows.append(
                    dict(seq=seq, url=url, host=host, wave=wave, depth=depth,
                         status="error", n_out=0)
                )
                seq += 1
                continue
            spans, outlinks = parse_page(html, url)
            log_rows.append(
                dict(seq=seq, url=url, host=host, wave=wave, depth=depth,
                     status="fetched", n_out=len(outlinks))
            )
            doc_rows.append(dict(doc_id=url, spans=spans_to_dicts(spans)))
            # RBC-8b discoveries (depth-filtered at discovery)
            if D is None or depth + 1 <= D:
                for link_idx, link in enumerate(outlinks):
                    if link in seen:
                        continue
                    seen.add(link)
                    next_queue.append(
                        (seq * LINK_STRIDE + link_idx, link, url_host(link), depth + 1)
                    )
            seq += 1
            fetched_total += 1
            if G is not None and fetched_total >= G:
                stop = True
        wave_queue = next_queue
        wave += 1

    crawl_log = pa.Table.from_pylist(log_rows, schema=CRAWL_LOG)
    documents = pa.Table.from_pylist(doc_rows, schema=DOCUMENTS)
    return OracleResult(crawl_log=crawl_log, documents=documents, seen=seen, waves=wave)
