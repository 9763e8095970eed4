"""Per-wave checkpointing + resume (SURVEY.md O-5/O-6, §3.3, §4.4).

A wave is the transaction unit. Layout under the checkpoint root:

    root/config.json                     crawl config + hash (validated on resume)
    root/wave=00000/
        documents/*.parquet              this wave's DOCUMENTS rows
        crawl_log/*.parquet              this wave's CRAWL_LOG rows
        frontier/*.parquet               frontier for wave W+1 (resume input)
        seen_delta/shard=K.parquet       URLs first seen during this wave, per shard
        host_state/shard=K.parquet       token-bucket levels + fetch counters
        meta.json                        lineage: wave, parent, seq_base/fetched
                                         counters after the wave, config hash
        _SUCCESS                         commit marker, written last

Exactly-once: all files land in the wave dir before `_SUCCESS`; resume reads
the newest committed wave, deletes newer uncommitted dirs, re-ingests the
seen-set deltas of waves 0..W into fresh shard actors, reloads host state,
and continues from the stored frontier. Since actor state at wave W is a
deterministic function of committed waves 0..W (SURVEY.md §4.2), the
continuation is bit-identical to an uninterrupted run — asserted by
tests/resume/.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from crawlray.schema import FRONTIER

_FRONTIER_COLS = ["url", "host", "depth", "disc_key", "url_hash_lo", "url_hash_hi", "shard"]


def config_hash(cfg: dict) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]


class Checkpointer:
    def __init__(self, root: str, cfg: dict):
        self.root = root
        self.cfg = cfg
        self.hash = config_hash(cfg)
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "config.json"), "w") as f:
            json.dump({"config": cfg, "hash": self.hash}, f, indent=2)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave:05d}")

    def commit_wave(
        self,
        wave: int,
        frontier_next,
        wave_log,
        seen_actors,
        polite_actors,
        metrics: dict,
        seq_base: int,
        fetched_total: int,
    ) -> None:
        # documents/ under the wave dir were already written DIRECTLY by the
        # fetcher actors during the wave (stages.FetchParseStage.end_wave) —
        # the wave dir therefore already exists and must not be cleared here
        # (leftover uncommitted dirs are cleaned by the driver at wave START,
        # before any fetcher writes).
        d = self._wave_dir(wave)
        os.makedirs(d, exist_ok=True)
        wave_log.write_parquet(os.path.join(d, "crawl_log"))
        fdir = os.path.join(d, "frontier")
        os.makedirs(fdir, exist_ok=True)
        if frontier_next is not None:
            frontier_next.select_columns(_FRONTIER_COLS).write_parquet(fdir)
        else:
            pq.write_table(
                pa.schema([FRONTIER.field(c) for c in _FRONTIER_COLS]).empty_table(),
                os.path.join(fdir, "empty.parquet"),
            )
        sdir = os.path.join(d, "seen_delta")
        os.makedirs(sdir, exist_ok=True)
        for i, t in enumerate(ray.get([a.dump_delta.remote() for a in seen_actors])):
            pq.write_table(t, os.path.join(sdir, f"shard={i}.parquet"))
        hdir = os.path.join(d, "host_state")
        os.makedirs(hdir, exist_ok=True)
        for i, st in enumerate(ray.get([a.host_state.remote() for a in polite_actors])):
            pq.write_table(
                pa.table(
                    {
                        "host": pa.array(st["hosts"], pa.string()),
                        "tokens": pa.array(st["tokens"], pa.float64()),
                        "fetched_total": pa.array(st["fetched_total"], pa.int64()),
                    }
                ),
                os.path.join(hdir, f"shard={i}.parquet"),
            )
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(
                {
                    "wave": wave,
                    "parent": wave - 1,
                    "config_hash": self.hash,
                    "seq_base_after": seq_base,
                    "fetched_total_after": fetched_total,
                    "metrics": metrics,
                },
                f,
                indent=2,
            )
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")

    # ---------------- resume-side helpers ----------------

    @staticmethod
    def committed_waves(root: str) -> list[int]:
        out = []
        if not os.path.isdir(root):
            return out
        for name in sorted(os.listdir(root)):
            if name.startswith("wave=") and os.path.exists(
                os.path.join(root, name, "_SUCCESS")
            ):
                out.append(int(name.split("=")[1]))
        return sorted(out)

    @staticmethod
    def clean_uncommitted(root: str) -> list[str]:
        removed = []
        for name in sorted(os.listdir(root)):
            p = os.path.join(root, name)
            if name.startswith("wave=") and not os.path.exists(os.path.join(p, "_SUCCESS")):
                shutil.rmtree(p)
                removed.append(name)
        return removed

    @staticmethod
    def load_meta(root: str, wave: int) -> dict:
        with open(os.path.join(root, f"wave={wave:05d}", "meta.json")) as f:
            return json.load(f)

    @staticmethod
    def read_results(root: str):
        """Assemble full crawl_log + documents datasets from committed waves."""
        import ray.data

        waves = Checkpointer.committed_waves(root)

        def _files(sub: str) -> list[str]:
            out = []
            for w in waves:
                d = os.path.join(root, f"wave={w:05d}", sub)
                if os.path.isdir(d):
                    out.extend(
                        os.path.join(d, f)
                        for f in sorted(os.listdir(d))
                        if f.endswith(".parquet")
                    )
            return out

        logs = _files("crawl_log")
        docs = _files("documents")
        log_ds = ray.data.read_parquet(logs) if logs else None
        # doc files carry (doc_id, seq, spans, enrichment…) — the public
        # DOCUMENTS surface is (doc_id, spans); column-pruned at the read
        doc_ds = (
            ray.data.read_parquet(docs, columns=["doc_id", "spans"]) if docs else None
        )
        return log_ds, doc_ds

    @staticmethod
    def read_seen_urls(root: str) -> set[str]:
        out: set[str] = set()
        for w in Checkpointer.committed_waves(root):
            sdir = os.path.join(root, f"wave={w:05d}", "seen_delta")
            for f in os.listdir(sdir):
                out.update(
                    pq.read_table(os.path.join(sdir, f), columns=["url"])
                    .column("url")
                    .to_pylist()
                )
        return out
