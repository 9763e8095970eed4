"""embed_documents (feature hashing): scalar-reference parity, unit norms,
exact-dup identity, and the text -> embed -> semantic_dedup chain."""

import numpy as np
import pyarrow as pa

from crawlray.murmur3 import murmur3_x64_128
from crawlray.ops.textqa import embed_documents

DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "the quick brown fox JUMPS over the lazy dog",  # same after lower()
    "pack my box with five dozen liquor jugs",
    "",
    "   ",  # whitespace-only -> zero vector
    "singleton",
]


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _collect(out):
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    return np.array(t.column("embedding").to_pylist(), dtype=np.float64)


def _ref(text, dim):
    v = np.zeros(dim)
    for tok in text.lower().split(" "):
        if not tok:
            continue
        lo, hi = murmur3_x64_128(tok.encode("utf-8"), 0)
        v[lo % dim] += 1.0 if (hi >> 63) else -1.0
    n = np.linalg.norm(v)
    return v / n if n else v


def test_embed_matches_scalar_reference(ray_session):
    got = _collect(embed_documents(_ds(DOCS), dim=16))
    for i, text in enumerate(DOCS):
        assert np.allclose(got[i], _ref(text, 16)), text


def test_embed_norms_and_exact_dup_identity(ray_session):
    got = _collect(embed_documents(_ds(DOCS), dim=32))
    norms = np.linalg.norm(got, axis=1)
    assert np.allclose(norms[[0, 1, 2, 5]], 1.0)
    assert np.allclose(norms[[3, 4]], 0.0)  # token-free docs
    # case-insensitive exact dup -> identical vector
    assert np.array_equal(got[0], got[1])


def test_embed_then_semantic_dedup_drops_text_dups(ray_session):
    from crawlray.ops.knn import semantic_dedup

    # mostly-disjoint vocabularies so no honest pair nears cosine 1
    texts = [
        "doc " + " ".join(f"w{i}x{k}" for k in range(8)) for i in range(30)
    ]
    texts += [texts[4], texts[11]]  # exact text dups, ids 30/31
    emb = embed_documents(_ds(texts), dim=64)
    out = semantic_dedup(
        emb, centroids="train", threshold=0.999, id_col="doc_id",
        n_centroids=4,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    keep = t.column("keep").to_pylist()
    rep = t.column("rep_id").to_pylist()
    assert keep[30] is False and rep[30] == 4
    assert keep[31] is False and rep[31] == 11
    assert all(keep[:30])
