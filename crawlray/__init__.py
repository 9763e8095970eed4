"""crawlray — a from-scratch Ray-Data-native distributed crawl/data engine.

Reproduces the query + data-processing capabilities of the reference
`lixiaochun/PyCrawler` (a single-process BFS fetch-parse-extract loop; the
snapshot at /root/reference was empty at survey time — see SURVEY.md §0, so
behavior follows the normative Reference Behavior Contract in SURVEY.md §1.4
implemented as a pure-Python oracle in `oracle/bfs_crawler.py`).

Architecture: every stage is a `ray.data.Dataset` transform over zero-copy
Arrow batches; stateful stages (URL-seen shards, robots cache, politeness
token buckets, fetcher pool) are Ray actors / actor-pool `map_batches`
stages. Crawl ordering is a pure function of the crawl graph (disc_key
sort), so any parallelism level reproduces the oracle bit-for-bit.
"""

__version__ = "0.1.0"
