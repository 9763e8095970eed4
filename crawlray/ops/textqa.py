"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting),
plus token explode (the flat analogue of span flattening, SURVEY.md O-43).

All per-batch functions are vectorized with pyarrow.compute / numpy where a
kernel exists; the only Python loops are over strings for hashing (hashlib
has no batch API) and run inside parallel map tasks.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Deterministic, dependency-free; not a production model.
_STOPWORDS = {
    "en": {"the", "of", "and", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "no", "por"},
}


def split_tokens(batch: pa.Table, text_col: str = "text") -> pa.ChunkedArray:
    """Whitespace-split token lists (Arrow list<string>), vectorized."""
    return pc.split_pattern(batch.column(text_col), pattern=" ")


def explode_tokens(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(id, text) → one row per token, in document order (DuckDB UNNEST)."""

    def _explode(batch: pa.Table) -> pa.Table:
        toks = split_tokens(batch, text_col).combine_chunks()
        parents = pc.list_parent_indices(toks)
        ids = batch.column(id_col).take(parents)
        return pa.table({id_col: ids, "token": pc.list_flatten(toks)})

    return ds.map_batches(_explode, batch_format="pyarrow")


def doc_stats(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-doc quality stats: chars, tokens, avg token length, punct count."""

    def _stats(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        toks = pc.split_pattern(text, pattern=" ")
        n_chars = pc.utf8_length(text)
        n_tokens = pc.list_value_length(toks)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars2": pc.cast(n_chars, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
            }
        )

    return ds.map_batches(_stats, batch_format="pyarrow")


def fingerprint(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Content fingerprint (md5 hex) per document — exact-dup key at scale."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table({id_col: batch.column(id_col), "fp": pa.array(fps)})

    return ds.map_batches(_fp, batch_format="pyarrow")


def lang_id(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Stopword-overlap language ID heuristic → (id, lang_pred, lang_score).

    Batch-vectorized (same dictionary-encode pattern as the crawl
    enrichment kernel): lowercase + whitespace-split + stopword membership
    run as Arrow C kernels over the whole batch; per document only a
    distinct-code lookup over its first 200 tokens remains. Semantics are
    identical to the scalar form `set(text.lower().split()[:200]) ∩
    stopwords`."""
    import numpy as np

    def _lid(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = pc.utf8_lower(pc.fill_null(col, ""))
        tok = pc.utf8_split_whitespace(arr)
        offs = tok.offsets.to_numpy().astype(np.int64)
        flat = tok.values
        keep = pc.not_equal(flat, "")  # split() drops empties; this does too
        keep_np = keep.to_numpy(zero_copy_only=False)
        cum = np.zeros(len(keep_np) + 1, np.int64)
        np.cumsum(keep_np, out=cum[1:])
        o = cum[offs]
        enc = flat.filter(keep).dictionary_encode()
        uniq = enc.dictionary
        idx = enc.indices.to_numpy() if len(enc) else np.empty(0, np.int32)
        lang_names = list(_STOPWORDS)
        if len(uniq):
            lb = np.stack(
                [
                    pc.is_in(
                        uniq, value_set=pa.array(sorted(_STOPWORDS[ln]))
                    ).to_numpy(zero_copy_only=False)
                    for ln in lang_names
                ]
            )
        else:
            lb = np.zeros((len(lang_names), 0), bool)
        preds, scores = [], []
        for i in range(n):
            a, b = int(o[i]), int(o[i + 1])
            codes = np.unique(idx[a : min(b, a + 200)])
            best, best_n = "und", 0
            for j, ln in enumerate(lang_names):
                k = int(lb[j, codes].sum())
                if k > best_n:
                    best, best_n = ln, k
            preds.append(best)
            scores.append(best_n)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "lang_pred": pa.array(preds),
                "lang_score": pa.array(scores, pa.int64()),
            }
        )

    return ds.map_batches(_lid, batch_format="pyarrow")


def parse_json_field(
    ds: ray.data.Dataset, json_col: str, field: str, out_col: str
) -> ray.data.Dataset:
    """Extract one scalar field from a JSON string column (O-44)."""

    def _jx(batch: pa.Table) -> pa.Table:
        vals = [
            json.loads(s).get(field) if s else None
            for s in batch.column(json_col).to_pylist()
        ]
        cols = {name: batch.column(name) for name in batch.column_names}
        cols[out_col] = pa.array(vals)
        return pa.table(cols)

    return ds.map_batches(_jx, batch_format="pyarrow")
