"""Similarity search over an embedding column (task brief: ANN over
list<float>; brute-force cosine top-k baseline + LSH-bucketed scale path).

Pattern: the query matrix is broadcast ONCE via `ray.put`; every map task
computes a vectorized numpy matmul for its batch and emits only its local
top-k candidates, so the shuffle/merge volume is O(#batches × queries × k),
independent of corpus size. The final per-query merge runs on that small
candidate set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    lists = batch.column(col).combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, batch.num_rows)
    return flat.reshape(batch.num_rows, dim)


def knn_cosine(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Brute-force cosine top-k: (query_id, neighbor_id, sim), deterministic
    tie-break by ascending neighbor_id."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    qid_ref = ray.put(np.asarray(query_ids))

    def _local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        qids = ray.get(qid_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = q @ m.T  # (n_queries, batch_rows)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            for j in top:
                if exclude_self and ids[j] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(row[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cand = ds.map_batches(_local_topk, batch_format="pyarrow").take_all()
    # final merge over the small candidate set: top-k per query,
    # deterministic tie-break (sim desc, neighbor_id asc)
    cand.sort(key=lambda r: (r["query_id"], -r["sim"], r["neighbor_id"]))
    rows, count, cur = [], 0, None
    for r in cand:
        if r["query_id"] != cur:
            cur, count = r["query_id"], 0
        if count < k:
            rows.append(r)
            count += 1
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("sim", pa.float64())]
        ),
    )


def similar_pairs_cosine(
    ds: ray.data.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """All pairs (id_a < id_b) with cosine ≥ threshold — embedding near-dup.

    Sandbox-scale implementation broadcasts the full (normalized) corpus
    matrix once and scans it per batch (O(n²) flops, vectorized). The scale
    path is LSH/IVF bucketing first (see `ivf_bucket_assign`) so only
    same-bucket pairs are compared; documented rather than forced here
    because the driver corpus is 500–5000 vectors.
    """
    all_tbl = ds.select_columns([id_col, vec_col]).take_all()
    ids_all = np.array([r[id_col] for r in all_tbl], dtype=np.int64)
    mat_all = _normalize(np.array([r[vec_col] for r in all_tbl], dtype=np.float64))
    ref_ids = ray.put(ids_all)
    ref_mat = ray.put(mat_all)

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_b = batch.column(id_col).to_numpy(zero_copy_only=False)
        m_b = _normalize(_batch_matrix(batch, vec_col))
        ids_g = ray.get(ref_ids)
        m_g = ray.get(ref_mat)
        sims = m_b @ m_g.T
        bi, gj = np.nonzero(sims >= threshold)
        keep = ids_b[bi] < ids_g[gj]  # dedupe (a,b)/(b,a) + self
        return pa.table(
            {
                "id_a": pa.array(ids_b[bi][keep], pa.int64()),
                "id_b": pa.array(ids_g[gj][keep], pa.int64()),
            }
        )

    out = ds.map_batches(_pairs, batch_format="pyarrow").take_all()
    out.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.Table.from_pylist(
        out, schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    )


def ivf_bucket_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF scale path: assign each vector to its nearest centroid bucket.

    Downstream ANN then probes only the closest bucket(s):
    `groupby("bucket")` co-locates candidates so the per-bucket search is
    local. Centroids are broadcast once.
    """
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    c_ref = ray.put(c)

    def _assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        bucket = np.argmax(m @ cc.T, axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow")
