"""Near-duplicate detection for training-data pipelines (task brief:
MinHash+LSH, SimHash, n-gram Jaccard; SURVEY.md O-39).

Pipeline shape (the 100 TB path):
  shingle → minhash (vectorized universal hashing) → band → LSH bucket
  groupby (the only shuffle, keyed by (band, bucket)) → candidate pairs
  within buckets → exact n-gram Jaccard verify on the pair set.
Only same-bucket pairs are ever compared, so the quadratic blowup is
confined to collision buckets; signatures are computed once per document
inside `map_batches` tasks.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.unique(
        np.array([zlib.crc32(s.encode()) for s in joined], dtype=np.uint64)
    )


def _perm_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)  # seeded → deterministic
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.uint64)
    return a, b


def minhash_signatures(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
) -> ray.data.Dataset:
    """Per-doc minhash signature: (id, sig: list<uint64>[num_perm])."""
    a, b = _perm_params(num_perm)

    def _sig(batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch.column(text_col).to_pylist():
            sh = _shingle_hashes(t or "")
            if len(sh) == 0:
                sigs.append([0] * num_perm)
                continue
            # universal hashing mod a Mersenne prime, vectorized (k × |sh|)
            v = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            sigs.append(v.min(axis=1).tolist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "sig": pa.array(sigs, pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(_sig, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> pa.Table:
    """MinHash+LSH near-dup pairs with exact Jaccard verification.

    Emits (id_a, id_b, jaccard) for verified pairs, id_a < id_b, sorted.
    The band-bucket groupby is the only all-to-all exchange; the verify
    step re-shingles only the candidate docs (broadcast lookup of their
    texts — candidate volume ≪ corpus by construction).
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, id_col, text_col, num_perm)

    def _bucketize(batch: pa.Table) -> pa.Table:
        ids_out, band_out, bucket_out = [], [], []
        ids = batch.column(id_col).to_pylist()
        for i, sig in enumerate(batch.column("sig").to_pylist()):
            for bnd in range(bands):
                chunk = sig[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                ids_out.append(ids[i])
                band_out.append(bnd)
                # stable across processes (python hash() is salted)
                bucket_out.append(
                    zlib.crc32(np.asarray(chunk, np.uint64).tobytes())
                )
        return pa.table(
            {
                id_col: pa.array(ids_out),
                "band": pa.array(band_out, pa.int32()),
                "bucket": pa.array(bucket_out, pa.int64()),
            }
        )

    buckets = sigs.map_batches(_bucketize, batch_format="pyarrow")

    def _pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(group.column(id_col).to_pylist())
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pa.table({"id_a": pa.array(out_a), "id_b": pa.array(out_b)})

    cand = (
        buckets.groupby(["band", "bucket"])
        .map_groups(_pairs_in_bucket, batch_format="pyarrow")
        .take_all()
    )
    pair_set = sorted({(r["id_a"], r["id_b"]) for r in cand})
    if not pair_set:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )

    # exact verify: shingle only the candidate docs
    need = sorted({i for p in pair_set for i in p})
    texts = {}
    for row in ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
    ).take_all():
        if row[id_col] in set(need):
            texts[row[id_col]] = row[text_col]
    out_a, out_b, out_j = [], [], []
    sh_cache = {i: set(_shingle_hashes(texts.get(i, "") or "").tolist()) for i in need}
    for a_id, b_id in pair_set:
        sa, sb = sh_cache[a_id], sh_cache[b_id]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= jaccard_threshold:
            out_a.append(a_id)
            out_b.append(b_id)
            out_j.append(round(j, 4))
    return pa.table(
        {
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


def simhash_table(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-doc 64-bit simhash over 3-gram token shingles (same kernel the
    crawl fetcher's enrichment uses)."""
    from crawlray.stages import enrich_doc

    def _sh(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            _, _, sim = enrich_doc(t or "")
            out.append(sim)
        return pa.table(
            {id_col: batch.column(id_col), "simhash": pa.array(out, pa.uint64())}
        )

    return ds.map_batches(_sh, batch_format="pyarrow")


def simhash_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> pa.Table:
    """SimHash near-dup pairs: bucket by 4 × 16-bit simhash bands (a pair
    within Hamming distance ≤ max_hamming < 4 bands must agree on ≥1 band),
    verify Hamming distance exactly within buckets."""
    sims = simhash_table(ds, id_col, text_col)

    def _bands(batch: pa.Table) -> pa.Table:
        ids_out, band_out, key_out, sim_out = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        vals = batch.column("simhash").to_pylist()
        for i, v in enumerate(vals):
            for bnd in range(4):
                ids_out.append(ids[i])
                band_out.append(bnd)
                key_out.append((v >> (16 * bnd)) & 0xFFFF)
                sim_out.append(v)
        return pa.table(
            {
                id_col: pa.array(ids_out),
                "band": pa.array(band_out, pa.int32()),
                "key": pa.array(key_out, pa.int64()),
                "simhash": pa.array(sim_out, pa.uint64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column(id_col).to_pylist(), group.column("simhash").to_pylist())
        )
        out_a, out_b, out_d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin(rows[i][1] ^ rows[j][1]).count("1")
                if d <= max_hamming:
                    out_a.append(rows[i][0])
                    out_b.append(rows[j][0])
                    out_d.append(d)
        return pa.table(
            {
                "id_a": pa.array(out_a),
                "id_b": pa.array(out_b),
                "hamming": pa.array(out_d, pa.int32()),
            }
        )

    cand = (
        sims.map_batches(_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(_pairs, batch_format="pyarrow")
        .take_all()
    )
    uniq = sorted({(r["id_a"], r["id_b"], r["hamming"]) for r in cand})
    return pa.table(
        {
            "id_a": pa.array([r[0] for r in uniq], pa.int64()),
            "id_b": pa.array([r[1] for r in uniq], pa.int64()),
            "hamming": pa.array([r[2] for r in uniq], pa.int32()),
        }
    )
