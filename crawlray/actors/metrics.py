"""MetricsActor — distributed counter aggregation (SURVEY.md O-24).

One `num_cpus=0` actor per crawl collecting counters pushed from the
stateful stages (fetcher actors push their per-wave totals at end_wave as
fire-and-forget RPCs — no new barrier in the wave hot path). The driver
drains a snapshot when it checkpoints (the slow path that already pays an
RPC round) and once at crawl end; the checkpointer persists the snapshot
with each committed wave.

Rationale vs round 1's driver-gathered counters: on a 4N-node cluster the
per-partition counts would otherwise ride individual task returns through
the driver; a zero-CPU accumulator keeps the aggregation off the driver's
critical path and gives stages a single sink regardless of where they run.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: dict[str, float] = {}

    def incr(self, counters: dict[str, float]) -> None:
        for k, v in counters.items():
            self.counters[k] = self.counters.get(k, 0) + v

    def snapshot(self) -> dict[str, float]:
        return dict(self.counters)

    def load(self, counters: dict[str, float]) -> None:
        """Checkpoint resume: restore persisted totals."""
        self.counters = dict(counters)
