"""RobotsCacheActor — sharded robots.txt cache + batch evaluation
(SURVEY.md O-21; RBC-6: robots fetched before a host's first fetch, cached
forever; a URL disallowed for user-agent '*' is logged robots_denied).

Sharding: hash(host) % num_shards (same murmur3_32 the engine uses
elsewhere), so each host's rules live on exactly one actor and are parsed
once. The backend "fetch" of robots.txt is a lookup into the robots table
for the synthetic web (the table ref is read zero-copy from the object
store once per actor); an HttpBackend would fetch on miss with the same
interface.
"""

from __future__ import annotations

import urllib.robotparser

import numpy as np
import ray

from crawlray.murmur3 import murmur3_32


def robots_shard_of(host: str, num_shards: int) -> int:
    return murmur3_32(host.encode()) % num_shards


@ray.remote(num_cpus=0)
class RobotsCacheActor:
    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        robots_ref=None,
        user_agent: str = "*",
    ):
        self.shard_id = shard_id
        self.user_agent = user_agent
        self._denied_keys: list[np.ndarray] = []
        self._parsed: dict[str, urllib.robotparser.RobotFileParser] = {}
        self._bodies: dict[str, str] = {}
        if robots_ref is not None:
            # ObjectRefs passed as top-level actor args arrive pre-resolved;
            # nested refs (e.g. inside kwargs dicts) need the explicit get.
            tbl = ray.get(robots_ref) if isinstance(robots_ref, ray.ObjectRef) else robots_ref
            hosts = tbl.column("host").to_pylist()
            bodies = tbl.column("body").to_pylist()
            for h, b in zip(hosts, bodies):
                if robots_shard_of(h, num_shards) == shard_id:
                    self._bodies[h] = b

    def _rules(self, host: str) -> urllib.robotparser.RobotFileParser:
        rp = self._parsed.get(host)
        if rp is None:
            rp = urllib.robotparser.RobotFileParser()
            body = self._bodies.get(host)
            rp.parse([] if body is None else body.splitlines())
            self._parsed[host] = rp
        return rp

    def begin_wave(self, wave: int) -> None:
        self._denied_keys: list[np.ndarray] = []

    def allowed(
        self, hosts, urls, disc_keys: np.ndarray | None = None
    ) -> np.ndarray:
        """hosts/urls: pa.Array (arrow wire format) or plain lists."""
        if not isinstance(hosts, list):
            hosts = hosts.to_pylist()
        if not isinstance(urls, list):
            urls = urls.to_pylist()
        out = np.empty(len(urls), dtype=bool)
        for i, (h, u) in enumerate(zip(hosts, urls)):
            out[i] = self._rules(h).can_fetch(self.user_agent, u)
        if disc_keys is not None:
            # accumulate this wave's denied keys so the driver can assign seq
            # without a distributed sort (drained at drain_denied; duplicates
            # from task retries removed there)
            self._denied_keys.append(np.asarray(disc_keys)[~out])
        return out

    def drain_denied(self) -> np.ndarray:
        if not getattr(self, "_denied_keys", None):
            return np.empty(0, dtype=np.int64)
        out = np.unique(np.concatenate(self._denied_keys))
        self._denied_keys = []
        return out

    def cached_hosts(self) -> list[str]:
        return sorted(self._bodies)
