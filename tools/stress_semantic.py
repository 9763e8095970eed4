"""semantic_dedup scale stress: parallelism-invariance checksum at ~250k
vectors, with planted near-duplicates so the greedy pass does real work.

Builds a deterministic clustered corpus (numpy, fixed seed): `--n` base
vectors around `--modes` latent modes, plus `--dup-frac` planted positive
scalings (cosine 1 with their source, ids above every base id). Runs
`semantic_dedup` with TRAINED centroids at two block counts and asserts
the (keep, rep_id) output checksum is identical — centroid training,
bucket assignment, and the within-cluster greedy must all be pure
functions of the data, not the block layout. Prints throughput for the
BENCH log.

Usage:
  python tools/stress_semantic.py                 # 250k vectors, dim 64
  python tools/stress_semantic.py --n 50000       # quicker probe
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
)

import numpy as np
import pyarrow as pa


def build(n: int, dim: int, modes: int, dup_frac: float, seed: int = 5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(modes, dim)
    assign = rng.randint(0, modes, size=n)
    m = centers[assign] + 0.35 * rng.randn(n, dim)
    n_dup = int(n * dup_frac)
    src = rng.randint(0, n, size=n_dup)
    dups = m[src] * rng.uniform(0.5, 2.0, size=(n_dup, 1))  # cosine == 1
    ids = np.concatenate([np.arange(n), n + np.arange(n_dup)])
    return ids.astype(np.int64), np.vstack([m, dups]).astype(np.float64)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--modes", type=int, default=48)
    ap.add_argument("--dup-frac", type=float, default=0.05)
    ap.add_argument("--centroids", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--blocks", type=int, nargs=2, default=[16, 97])
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    from crawlray.ops.knn import semantic_dedup

    ids, m = build(args.n, args.dim, args.modes, args.dup_frac)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
        }
    )
    print(f"# corpus: {tbl.num_rows} vectors dim={args.dim}", file=sys.stderr)

    chks = []
    for nb in args.blocks:
        ds = ray.data.from_arrow(tbl).repartition(nb).materialize()
        t0 = time.time()
        out = semantic_dedup(
            ds,
            centroids="train",
            threshold=args.threshold,
            n_centroids=args.centroids,
        )
        parts = [
            pa.table(b) for b in out.iter_batches(batch_format="pyarrow")
        ]
        dt = time.time() - t0
        t = pa.concat_tables(parts).sort_by("vec_id")
        kid = t.column("vec_id").to_numpy()
        kk = t.column("keep").to_numpy()
        kr = t.column("rep_id").to_numpy()
        chk = (
            int(kk.sum()),
            int(((kid + 1) * (kr + 3)).sum() % (1 << 61)),
        )
        chks.append(chk)
        print(
            f"semantic_dedup blocks={nb}: {dt:.1f}s, "
            f"{tbl.num_rows / dt:,.0f} vecs/s, kept={chk[0]}, chk={chk}",
        )
    assert chks[0] == chks[1], f"parallelism variance: {chks}"
    print("# invariance OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
