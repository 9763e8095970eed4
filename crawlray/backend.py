"""Fetch backends (SURVEY.md O-46).

The sandbox has no network and the reference's live-web inputs are not
reproducible, so all exact-match verification runs against the deterministic
`SyntheticBackend`. `HttpBackend` is the real-crawl path (requests-based),
gated behind an import-try; it shares the exact same interface so the engine
is backend-agnostic.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


class FetchBackend:
    """Interface: fetch one page + fetch one host's robots.txt."""

    def fetch(self, url: str) -> str | None:
        """Return page HTML, or None on fetch error."""
        raise NotImplementedError

    def robots(self, host: str) -> str | None:
        """Return robots.txt body for host, or None if unavailable."""
        raise NotImplementedError


class SyntheticBackend(FetchBackend):
    """Serves a deterministic synthetic web from arrow tables (or parquet).

    Index build happens once per holder (oracle process or fetcher actor) —
    the webgraph table itself travels zero-copy through the object store.
    """

    def __init__(self, webgraph: pa.Table, robots: pa.Table | None = None):
        urls = webgraph.column("url").to_pylist()
        self._idx = {u: i for i, u in enumerate(urls)}
        self._html = webgraph.column("html")
        if robots is not None:
            self._robots = dict(
                zip(robots.column("host").to_pylist(), robots.column("body").to_pylist())
            )
        else:
            self._robots = {}

    @classmethod
    def from_parquet(cls, webgraph_path: str, robots_path: str | None = None):
        wg = pq.read_table(webgraph_path)
        rb = pq.read_table(robots_path) if robots_path else None
        return cls(wg, rb)

    @classmethod
    def from_web(cls, web) -> "SyntheticBackend":
        return cls(web.webgraph_table(), web.robots_table())

    def fetch(self, url: str) -> str | None:
        i = self._idx.get(url)
        if i is None:
            return None
        return self._html[i].as_py()

    def robots(self, host: str) -> str | None:
        return self._robots.get(host)


class HttpBackend(FetchBackend):
    """Real-web backend (unused in the sandbox: no network)."""

    def __init__(self, timeout: float = 10.0, user_agent: str = "crawlray/0.1"):
        import requests  # gated: available but useless without network

        self._session = requests.Session()
        self._session.headers["User-Agent"] = user_agent
        self._timeout = timeout

    def fetch(self, url: str) -> str | None:
        try:
            r = self._session.get(url, timeout=self._timeout)
            if r.status_code != 200:
                return None
            return r.text
        except Exception:
            return None

    def robots(self, host: str) -> str | None:
        for scheme in ("http", "https"):
            body = self.fetch(f"{scheme}://{host}/robots.txt")
            if body is not None:
                return body
        return None
