"""semantic_dedup (SemDeDup-style cluster-then-greedy): exact parity with a
naive reference implementation, planted-duplicate removal, parallelism
invariance (incl. trained centroids), and the segment-cap behavior."""

import numpy as np
import pyarrow as pa

from crawlray.ops.knn import semantic_dedup


def _vecs(n=240, dim=12, seed=11, n_clusters=6):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    assign = rng.randint(0, n_clusters, size=n)
    m = centers[assign] + 0.2 * rng.randn(n, dim)
    return m, centers


def _ds(ids, m):
    import ray.data

    tbl = pa.table(
        {
            "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "embedding": pa.array(
                [row.tolist() for row in m], pa.list_(pa.float64())
            ),
        }
    )
    return ray.data.from_arrow(tbl)


def _norm(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _ref(ids, m, cents, threshold):
    """Naive O(n^2-per-cluster) reference greedy keep-first-by-id."""
    ids = np.asarray(ids, dtype=np.int64)
    mn = _norm(np.asarray(m, dtype=np.float64))
    cn = _norm(np.asarray(cents, dtype=np.float64))
    assign = np.argmax(mn @ cn.T, axis=1)
    keep = {}
    rep = {}
    for b in np.unique(assign):
        idx = np.nonzero(assign == b)[0]
        idx = idx[np.argsort(ids[idx], kind="stable")]
        kept = []
        for i in idx:
            hit = [j for j in kept if mn[i] @ mn[j] >= threshold]
            if hit:
                keep[ids[i]] = False
                rep[ids[i]] = int(ids[hit[0]])  # kept is in ascending-id order
            else:
                keep[ids[i]] = True
                rep[ids[i]] = int(ids[i])
                kept.append(i)
    return keep, rep


def _collect(out):
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    d = {
        int(i): (bool(k), int(r))
        for i, k, r in zip(
            t.column("vec_id").to_pylist(),
            t.column("keep").to_pylist(),
            t.column("rep_id").to_pylist(),
        )
    }
    return d


def test_semantic_dedup_matches_reference(ray_session):
    m, centers = _vecs()
    ids = np.arange(len(m)) * 3 + 7  # non-contiguous ids
    out = _collect(
        semantic_dedup(_ds(ids, m), centroids=centers, threshold=0.9)
    )
    keep_ref, rep_ref = _ref(ids, m, centers, 0.9)
    assert len(out) == len(m)
    for i in ids:
        assert out[int(i)] == (keep_ref[i], rep_ref[i]), i


def test_semantic_dedup_drops_planted_duplicates(ray_session):
    m, centers = _vecs(n=120)
    # plant exact copies (positive scaling: same direction, cosine = 1)
    # with ids ABOVE every original id, so originals win the greedy
    dup_src = np.array([5, 17, 44, 90])
    dups = m[dup_src] * 2.5
    ids = np.concatenate([np.arange(len(m)), 1000 + np.arange(len(dups))])
    out = _collect(
        semantic_dedup(
            _ds(ids, np.vstack([m, dups])), centroids=centers, threshold=0.95
        )
    )
    for k, src in enumerate(dup_src):
        kept_src, rep_src = out[int(src)]
        kept_dup, rep_dup = out[1000 + k]
        assert not kept_dup
        if kept_src:
            assert rep_dup == int(src)
        else:
            # source itself deduped away -> both share its representative
            assert rep_dup == rep_src


def test_semantic_dedup_parallelism_invariant_trained(ray_session):
    m, _ = _vecs(n=300, seed=4)
    ids = np.arange(len(m))
    a = _collect(
        semantic_dedup(
            _ds(ids, m).repartition(3), centroids="train",
            threshold=0.9, n_centroids=5,
        )
    )
    b = _collect(
        semantic_dedup(
            _ds(ids, m).repartition(17), centroids="train",
            threshold=0.9, n_centroids=5,
        )
    )
    assert a == b


def test_semantic_dedup_segment_cap_still_dedups_within_segment(ray_session):
    # one cluster (single centroid), adjacent ids duplicated -> each dup
    # lands in the same id-sorted segment as its source even at a tiny cap
    rng = np.random.RandomState(2)
    base = rng.randn(40, 8)
    m = np.repeat(base, 2, axis=0)  # rows 2i and 2i+1 identical
    ids = np.arange(len(m))
    out = _collect(
        semantic_dedup(
            _ds(ids, m), centroids=np.ones((1, 8)), threshold=0.999,
            max_cluster_rows=8, chunk_rows=3,
        )
    )
    for i in range(0, len(m), 2):
        assert out[i + 1][0] is False and out[i + 1][1] == out[i][1]


def test_semantic_dedup_chunk_rows_do_not_change_output(ray_session):
    m, centers = _vecs(n=150, seed=9)
    ids = np.arange(len(m))
    a = _collect(
        semantic_dedup(_ds(ids, m), centroids=centers, threshold=0.85,
                       chunk_rows=7)
    )
    b = _collect(
        semantic_dedup(_ds(ids, m), centroids=centers, threshold=0.85,
                       chunk_rows=512)
    )
    assert a == b
