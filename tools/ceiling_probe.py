#!/usr/bin/env python
"""Evidence probe for the single-box ~14k URLs/s ceiling (BENCH/BASELINE.md).

Two measurements, no Ray involved:

1. `--bandwidth`: aggregate memory-copy bandwidth at 1, 4, 8, 16 and 32
   concurrent processes. Each worker repeatedly copies a 256 MiB numpy
   buffer (far beyond LLC, so every pass is a DRAM round trip). If the box
   had independent buses per CPU, aggregate GB/s would scale linearly with
   workers; a shared-bus box plateaus — the same plateau the crawl hits,
   since fetch-parse-span-parquet traffic is ~10 KB/page of memory moves.

2. `--cpustat CMD...`: runs CMD while sampling /proc/stat once per second,
   then reports mean/peak busy-core count and iowait share. A 32-CPU crawl
   that averages far fewer than 32 busy cores while throughput is flat vs
   16 CPUs is starved by something other than CPU — the shared
   memory/plasma path.

Usage:
  python tools/ceiling_probe.py --bandwidth
  python tools/ceiling_probe.py --cpustat python bench.py --crawl-only
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time


def _copy_worker(seconds: float, out_q) -> None:
    import numpy as np

    src = np.ones(256 * 1024 * 1024 // 8, dtype=np.float64)  # 256 MiB
    dst = np.empty_like(src)
    n_bytes = src.nbytes
    np.copyto(dst, src)  # warmup: fault in dst pages outside the window
    t_end = time.time() + seconds
    moved = 0
    t0 = time.time()
    while time.time() < t_end:
        np.copyto(dst, src)
        moved += 2 * n_bytes  # one read + one write stream
    out_q.put(moved / max(1e-9, time.time() - t0))


def bench_bandwidth(seconds: float = 3.0) -> dict:
    out = {}
    for nproc in (1, 4, 8, 16, 32):
        q = mp.Queue()
        procs = [
            mp.Process(target=_copy_worker, args=(seconds, q))
            for _ in range(nproc)
        ]
        for p in procs:
            p.start()
        rates = [q.get() for _ in procs]
        for p in procs:
            p.join()
        agg = sum(rates) / 1e9
        out[nproc] = round(agg, 2)
        print(f"# {nproc:>2} procs: {agg:8.2f} GB/s aggregate "
              f"({agg / nproc:6.2f} GB/s per proc)", file=sys.stderr)
    one = out[1]
    return {
        "metric": "memcpy_aggregate_GBps_by_nproc",
        "value": out,
        "scaling_1_to_32": round(out[32] / one, 2),
        "note": (
            "linear scaling would be 32.0; a shared memory bus plateaus — "
            "this is the resource the 8:32 crawl pair saturates"
        ),
    }


def _read_proc_stat() -> tuple[int, int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    iowait = vals[4]
    total = sum(vals)
    return total, idle, iowait


def cpustat_run(cmd: list[str]) -> dict:
    ncpu = os.cpu_count() or 1
    samples = []
    t0, i0, w0 = _read_proc_stat()
    proc = subprocess.Popen(cmd)
    prev = (t0, i0, w0)
    while proc.poll() is None:
        time.sleep(1.0)
        cur = _read_proc_stat()
        dt = cur[0] - prev[0]
        if dt > 0:
            busy_cores = (1 - (cur[1] - prev[1]) / dt) * ncpu
            iowait_share = (cur[2] - prev[2]) / dt
            samples.append((busy_cores, iowait_share))
        prev = cur
    rc = proc.wait()
    if not samples:
        return {"error": "command finished before the first sample", "rc": rc}
    busy = [b for b, _ in samples]
    iow = [w for _, w in samples]
    return {
        "metric": "busy_cores_during_cmd",
        "cmd": " ".join(cmd),
        "rc": rc,
        "ncpu": ncpu,
        "n_samples": len(samples),
        "busy_cores_mean": round(sum(busy) / len(busy), 1),
        "busy_cores_p95": round(sorted(busy)[int(0.95 * (len(busy) - 1))], 1),
        "iowait_share_mean": round(sum(iow) / len(iow), 4),
    }


def main() -> None:
    if "--bandwidth" in sys.argv:
        print(json.dumps(bench_bandwidth()))
    elif "--cpustat" in sys.argv:
        i = sys.argv.index("--cpustat")
        print(json.dumps(cpustat_run(sys.argv[i + 1:])))
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
