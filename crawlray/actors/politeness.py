"""HostPolitenessActor — per-host token-bucket admission, host-sharded
(SURVEY.md O-22; RBC-6). Deterministic under any parallelism (§4.2): the
admission decision is NOT first-come-first-served — each wave the actor
collects the full multiset of candidate disc_keys per host (offer phase),
then admits the B lowest disc_keys per host (decide phase), exactly what the
sequential oracle does walking the wave in disc_key order. Offers are
sets, so Ray task retries re-offering the same (host, disc_key) are no-ops.

Bucket semantics: refill to burst at wave start (the RBC-6 exact-match
config, memoryless) or `carryover=True` for a classic token bucket
(tokens = min(burst, tokens + rate)) — pluggable without touching the
admission protocol.

The decide() barrier is per wave, not per batch: one small RPC round per
actor per wave, after the offer stage's streaming pass completes. An
alternative shuffle-based formulation (custom groupby aggregate computing
the per-host B-th smallest disc_key) is noted in SURVEY.md §2.3; the actor
keeps bucket state resident across waves, which the shuffle version cannot.
"""

from __future__ import annotations

import numpy as np
import ray

from crawlray.murmur3 import murmur3_32

NO_ADMIT = np.int64(np.iinfo(np.int64).min)  # threshold meaning "admit none"


def host_shard_of(host: str, num_shards: int) -> int:
    return murmur3_32(host.encode(), seed=7) % num_shards


@ray.remote(num_cpus=0)
class HostPolitenessActor:
    def __init__(
        self,
        shard_id: int,
        rate: float,
        burst: float,
        carryover: bool = False,
    ):
        self.shard_id = shard_id
        self.rate = rate
        self.burst = burst
        self.carryover = carryover
        self.tokens: dict[str, float] = {}  # host -> tokens after last wave
        self.fetched_total: dict[str, int] = {}
        self.offers: dict[str, set[int]] = {}
        self.thresholds: dict[str, int] = {}

    def begin_wave(self, wave: int) -> None:
        self.offers = {}

    def offer(self, hosts: list[str], disc_keys: np.ndarray) -> None:
        for h, k in zip(hosts, disc_keys):
            self.offers.setdefault(h, set()).add(int(k))

    def decide(self) -> tuple[int, int]:
        """Admit the floor(tokens) lowest disc_keys per host; returns
        (admitted, offered) counts for this shard this wave. The admitted
        keys are kept for drain_admitted (driver-side seq assignment)."""
        self.thresholds = {}
        self._admitted_keys: list[list[int]] = []
        admitted_total = 0
        offered_total = 0
        for h, keys in self.offers.items():
            offered_total += len(keys)
            if self.carryover:
                avail = min(self.burst, self.tokens.get(h, self.burst) + self.rate)
            else:
                avail = self.burst  # RBC-6: refill to burst each wave
            n_admit = min(len(keys), int(avail))
            if n_admit:
                smallest = sorted(keys)[:n_admit]
                self.thresholds[h] = smallest[-1]
                self._admitted_keys.append(smallest)
            else:
                self.thresholds[h] = int(NO_ADMIT)
            self.tokens[h] = avail - n_admit
            self.fetched_total[h] = self.fetched_total.get(h, 0) + n_admit
            admitted_total += n_admit
        return admitted_total, offered_total

    def drain_admitted(self) -> np.ndarray:
        """This shard's admitted disc_keys (for driver-side seq assignment)."""
        keys = getattr(self, "_admitted_keys", [])
        if not keys:
            return np.empty(0, dtype=np.int64)
        out = np.concatenate([np.asarray(k, dtype=np.int64) for k in keys])
        self._admitted_keys = []
        return out

    def thresholds_for(self, hosts: list[str]) -> np.ndarray:
        return np.array(
            [self.thresholds.get(h, int(NO_ADMIT)) for h in hosts], dtype=np.int64
        )

    def host_state(self) -> dict:
        """Checkpoint payload: bucket levels + fetch counters."""
        return {
            "hosts": sorted(self.tokens),
            "tokens": [self.tokens[h] for h in sorted(self.tokens)],
            "fetched_total": [self.fetched_total.get(h, 0) for h in sorted(self.tokens)],
            "rate": self.rate,
            "burst": self.burst,
        }

    def load_host_state(self, hosts: list[str], tokens: list[float], fetched: list[int]) -> None:
        for h, t, f in zip(hosts, tokens, fetched):
            self.tokens[h] = t
            self.fetched_total[h] = f
