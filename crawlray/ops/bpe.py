"""Distributed BPE tokenizer training + segmentation.

Byte-pair-encoding merge-rule learning (Sennrich et al., ACL 2016 —
"Neural Machine Translation of Rare Words with Subword Units") as Ray
Data stages, the tokenizer-training step of an LLM data pipeline:

  1. ONE pass over the corpus folds it to a WORD-FREQUENCY table
     (`grouped_count_hash`) — every later round touches only the
     vocabulary, never the corpus, which is exactly what makes BPE
     training tractable at 100 TB (the vocab is millions of rows where
     the corpus is trillions of tokens).
  2. Each merge round: explode adjacent symbol pairs weighted by word
     frequency (the repo's vectorized `explode_bigrams` kernel), ONE
     vocab-sized hash exchange to sum pair counts, per-block top-1
     partials → the driver picks the argmax (count DESC, then
     lexicographically smallest pair — a total order, so training is
     parallelism-invariant), then applies the merge to the word table
     with ONE vectorized `replace_substring` pass. Driver state is one
     (pair, count) row per round.
  3. Segmentation applies the K learned rules to any corpus as K
     vectorized replace passes — zero shuffles, zero per-row Python.

Symbol-string representation (what makes a merge ONE literal replace,
in Arrow and in SQL): every symbol is wrapped in pipes and symbols are
space-separated — "hello" → "|h| |e| |l| |l| |o|". A merge (a, b) is
then `replace("|a| |b|" → "|ab|")`: consecutive occurrences share no
characters, so a single non-overlapping left-to-right replace-all (the
semantics of Arrow `replace_substring`, Python `str.replace`, and SQL
`replace` alike) is EXACTLY the greedy left-to-right BPE merge — e.g.
run "a a a" merges to ["aa", "a"], "a a a a" to ["aa", "aa"]. Training
words are restricted to `^[a-z]+$` so symbols never contain '|' or ' '.
A DuckDB oracle replays the whole procedure with one CTE chain per
round (see `__ray_entry__._flatten_tokens`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_MERGE_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("left", pa.string()),
        ("right", pa.string()),
        ("merged", pa.string()),
        ("cnt", pa.int64()),
    ]
)

_PAIR_SCHEMA = pa.schema(
    [("w1", pa.string()), ("w2", pa.string()), ("cnt", pa.int64())]
)


def wrap_symbols(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """'hello' → '|h| |e| |l| |l| |o|' — one vectorized regex pass
    (RE2 `(.)` → `|\\1| `, then rtrim the trailing space)."""
    wrapped = pc.utf8_rtrim(
        pc.replace_substring_regex(col, pattern="(.)", replacement=r"|\1| "),
        characters=" ",
    )
    if isinstance(wrapped, pa.ChunkedArray):
        wrapped = wrapped.combine_chunks()
    return wrapped


def bpe_word_table(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus → (sym, freq): whitespace tokens filtered to `^[a-z]+$`,
    ONE hash-count exchange, each word wrapped into its symbol string.
    The only pass that ever reads the corpus."""
    from crawlray.ops.relational import grouped_count_hash

    def _toks(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch.column(text_col), pattern=" ")
        )
        keep = pc.match_substring_regex(toks, "^[a-z]+$")
        return pa.table({"token": toks.filter(keep)})

    freqs = grouped_count_hash(
        ds.map_batches(_toks, batch_format="pyarrow"), ["token"], alias="freq"
    )

    def _wrap(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {"sym": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "sym": wrap_symbols(batch.column("token").combine_chunks()),
                "freq": batch.column("freq"),
            }
        )

    return freqs.map_batches(_wrap, batch_format="pyarrow")


def _pairs_of(tbl: pa.Table) -> pa.Table:
    """(sym, freq) table → adjacent-pair counts (w1, w2, cnt): the same
    shifted-take arithmetic as textqa.explode_bigrams, then one Arrow
    hash group_by (exact int sums, addition-order-free — identical on
    the local and distributed paths)."""
    toks = pc.split_pattern(tbl.column("sym").combine_chunks(), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    flat = pc.list_flatten(toks)
    g_per = np.maximum(lens - 1, 0)
    gidx = np.repeat(np.arange(len(lens), dtype=np.int64), g_per)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    within = np.arange(int(g_per.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(g_per)))[:-1], g_per
    )
    s = starts[gidx] + within
    pairs = pa.table(
        {
            "w1": flat.take(pa.array(s, pa.int64())),
            "w2": flat.take(pa.array(s + 1, pa.int64())),
            "freq": tbl.column("freq").combine_chunks().take(
                pa.array(gidx, pa.int64())
            ),
        }
    )
    g = pairs.group_by(["w1", "w2"]).aggregate([("freq", "sum")])
    return g.rename_columns(["w1", "w2", "cnt"])


def bpe_train(
    ds: ray.data.Dataset,
    num_merges: int = 12,
    text_col: str = "text",
    local_threshold: int = 65536,
) -> pa.Table:
    """Learn `num_merges` BPE merge rules over a corpus → the merge
    table (rank, left, right, merged, cnt) — the tokenizer model
    artifact (small by construction: one row per rule). Stops early if
    a round finds no pairs left to merge. Tie-break: max count, then
    lexicographically smallest (wrapped w1, wrapped w2) — a total
    order, so the result is a pure function of the data.

    Adaptive (the pagerank broadcast-chooser pattern): the corpus fold
    is always distributed; if the materialized word table is at most
    `local_threshold` rows (an O(1) metadata read), the merge rounds
    refine it LOCALLY with the very same Arrow kernels — 12 rounds cost
    milliseconds instead of 12 Ray execution round-trips. Above the
    threshold (real corpora: vocabularies of millions), every round runs
    distributed: fused re-apply of the accumulated rules over the
    materialized base, pair explode, ONE small hash exchange, per-block
    top-1 partials, O(#partitions) driver rows. Both paths are
    result-identical (tested)."""
    from crawlray.ops.relational import grouped_sum_hash
    from crawlray.ops.textqa import explode_bigrams

    def _top1(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _PAIR_SCHEMA.empty_table()
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                ("cnt", "descending"),
                ("w1", "ascending"),
                ("w2", "ascending"),
            ],
        )
        return batch.select(["w1", "w2", "cnt"]).take(idx.slice(0, 1))

    words = bpe_word_table(ds, text_col=text_col).materialize()

    if words.count() <= local_threshold:
        tbls = [
            t
            for t in ray.get(words.to_arrow_refs())
            if t.num_columns > 0 and t.num_rows > 0
        ]
        tbl = (
            pa.concat_tables(tbls)
            if tbls
            else pa.table(
                {"sym": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        )
        merges: list[dict] = []
        for r in range(num_merges):
            counts = _pairs_of(tbl)
            if counts.num_rows == 0:
                break
            idx = pc.sort_indices(
                counts,
                sort_keys=[
                    ("cnt", "descending"),
                    ("w1", "ascending"),
                    ("w2", "ascending"),
                ],
            )
            best = counts.take(idx.slice(0, 1)).to_pylist()[0]
            a, b = best["w1"][1:-1], best["w2"][1:-1]
            tbl = pa.table(
                {
                    "sym": pc.replace_substring(
                        tbl.column("sym"),
                        pattern=best["w1"] + " " + best["w2"],
                        replacement="|" + a + b + "|",
                    ),
                    "freq": tbl.column("freq"),
                }
            )
            merges.append(
                {
                    "rank": r,
                    "left": a,
                    "right": b,
                    "merged": a + b,
                    "cnt": int(best["cnt"]),
                }
            )
        return pa.Table.from_pylist(merges, schema=_MERGE_SCHEMA)

    # distributed rounds: ONE Ray execution per round — the accumulated
    # rules are re-applied lazily on top of the materialized base word
    # table (Ray fuses the map chain into a single task per block), so a
    # round is fused-replaces → pair explode → one small hash exchange →
    # per-block top-1 → O(#partitions) driver rows. Re-applying r
    # replaces in round r costs K²/2 vectorized passes over the VOCAB
    # total — far cheaper than a per-round materialize, and bounded (the
    # word table never grows).
    rules: list[tuple[str, str]] = []
    merges = []
    for r in range(num_merges):
        cur = words
        if rules:
            frozen = list(rules)

            def _apply_all(batch: pa.Table, _rules=frozen) -> pa.Table:
                if batch.num_rows == 0 or batch.num_columns == 0:
                    return pa.table(
                        {
                            "sym": pa.array([], pa.string()),
                            "freq": pa.array([], pa.int64()),
                        }
                    )
                sym = batch.column("sym")
                for pat, rep in _rules:
                    sym = pc.replace_substring(
                        sym, pattern=pat, replacement=rep
                    )
                return pa.table({"sym": sym, "freq": batch.column("freq")})

            cur = words.map_batches(_apply_all, batch_format="pyarrow")
        pairs = explode_bigrams(cur, id_col="freq", text_col="sym")
        counts = grouped_sum_hash(
            pairs, ["w1", "w2"], "freq", alias="cnt", num_partitions=8
        )
        cand = counts.map_batches(_top1, batch_format="pyarrow").take_all()
        if not cand:
            break
        best = min(cand, key=lambda x: (-x["cnt"], x["w1"], x["w2"]))
        a, b = best["w1"][1:-1], best["w2"][1:-1]
        rules.append((best["w1"] + " " + best["w2"], "|" + a + b + "|"))
        merges.append(
            {
                "rank": r,
                "left": a,
                "right": b,
                "merged": a + b,
                "cnt": int(best["cnt"]),
            }
        )
    return pa.Table.from_pylist(merges, schema=_MERGE_SCHEMA)


def _clean_and_wrap(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Segmentation preprocessing: lowercase, strip non-[a-z ], wrap
    every remaining char (spaces become the '| |' symbol, which no
    learned rule can merge across — rules only contain [a-z])."""
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(col), pattern="[^a-z ]", replacement=""
    )
    return wrap_symbols(cleaned)


def bpe_segment_tokens(
    ds: ray.data.Dataset,
    merges: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Tokenize a corpus with learned merge rules → (id, token) rows.
    K vectorized replace passes (rank order) per batch — zero shuffles;
    the merge table (K rows) is captured by value in the closure."""
    rules = [
        ("|" + lf + "| |" + rt + "|", "|" + mg + "|")
        for lf, rt, mg in zip(
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
            merges.column("merged").to_pylist(),
        )
    ]

    def _seg(batch: pa.Table) -> pa.Table:
        sym = _clean_and_wrap(batch.column(text_col).combine_chunks())
        for pat, rep in rules:
            sym = pc.replace_substring(sym, pattern=pat, replacement=rep)
        toks = pc.split_pattern(sym, pattern=" ")
        parents = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        # the wrapped space symbol '| |' splits into two bare '|' pieces
        # (it contains the delimiter); they and empties trim to '' — one
        # post-trim non-empty filter drops them all
        trimmed = pc.utf8_trim(flat, characters="|")
        keep = pc.not_equal(trimmed, pa.scalar(""))
        return pa.table(
            {
                id_col: batch.column(id_col).take(parents).filter(keep),
                "token": trimmed.filter(keep),
            }
        )

    return ds.map_batches(_seg, batch_format="pyarrow")


def bpe_vocab_counts(
    ds: ray.data.Dataset,
    merges: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-wide BPE token counts under learned rules → (token, n):
    segmentation (zero-shuffle map) + ONE hash-count exchange."""
    from crawlray.ops.relational import grouped_count_hash

    return grouped_count_hash(
        bpe_segment_tokens(ds, merges, id_col=id_col, text_col=text_col),
        ["token"],
        alias="n",
    )
