"""BPE training/segmentation vs a pure-Python Sennrich-style reference
(greedy left-to-right merge application, pair counts weighted by word
frequency, tie-break = max count then lexicographically smallest
WRAPPED pair — the same total order the engine and the SQL oracle use)."""

import collections

import pyarrow as pa
import pytest
import ray.data


def _ref_train(word_freqs: dict[str, int], k: int):
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(k):
        stats: collections.Counter = collections.Counter()
        for w, f in word_freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += f
        if not stats:
            break
        (a, b), cnt = min(
            stats.items(),
            key=lambda kv: (-kv[1], "|" + kv[0][0] + "|", "|" + kv[0][1] + "|"),
        )
        merges.append((a, b, cnt))
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _ref_segment(text: str, merges) -> list[str]:
    out = []
    for w in text.lower().split(" "):
        w = "".join(c for c in w if "a" <= c <= "z")
        if not w:
            continue
        s = list(w)
        for a, b, _ in merges:
            n, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    n.append(a + b)
                    i += 2
                else:
                    n.append(s[i])
                    i += 1
            s = n
        out.extend(s)
    return out


CORPUS = [
    "the cat sat on the mat",
    "the battered cattle rattled",
    "matter scatters the chatter",
    "a aa aaa aaaa",  # same-symbol runs: greedy left-to-right semantics
    "banana bandana anagrams",
    "Mixed CASE and punct-uation! stays out",  # non-[a-z]+ filtered
]


@pytest.mark.parametrize("nblocks", [1, 5])
@pytest.mark.parametrize("local_threshold", [65536, 0])
def test_bpe_train_matches_reference_and_block_invariant(
    ray_session, nblocks, local_threshold
):
    """local_threshold=0 forces the distributed merge rounds — both the
    local-refinement and the distributed path must equal the reference
    (and hence each other)."""
    from crawlray.ops.bpe import bpe_train

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ds = ray.data.from_items(rows).repartition(nblocks)
    got = bpe_train(
        ds, num_merges=8, local_threshold=local_threshold
    ).to_pylist()

    wf = collections.Counter(
        t for line in CORPUS for t in line.split(" ")
        if t and all("a" <= c <= "z" for c in t)
    )
    want, _ = _ref_train(dict(wf), 8)
    assert [(g["left"], g["right"], g["cnt"]) for g in got] == want
    assert [g["rank"] for g in got] == list(range(len(want)))
    assert [g["merged"] for g in got] == [a + b for a, b, _ in want]


def test_bpe_segment_matches_reference(ray_session):
    from crawlray.ops.bpe import bpe_segment_tokens, bpe_train

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ds = ray.data.from_items(rows)
    merges = bpe_train(ds, num_merges=8)
    ref = [
        (a, b, None)
        for a, b in zip(
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
        )
    ]
    got = bpe_segment_tokens(ds, merges).to_pandas()
    for i, text in enumerate(CORPUS):
        eng = got[got.doc_id == i]["token"].tolist()
        assert eng == _ref_segment(text, ref), (i, text)


def test_bpe_vocab_counts_consistent(ray_session):
    """Vocab counts = exact multiset of the reference segmentation; and
    the merged symbols actually appear (the rules bite)."""
    from crawlray.ops.bpe import bpe_train, bpe_vocab_counts

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ds = ray.data.from_items(rows)
    merges = bpe_train(ds, num_merges=8)
    ref_rules = [
        (a, b, None)
        for a, b in zip(
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
        )
    ]
    want: collections.Counter = collections.Counter()
    for t in CORPUS:
        want.update(_ref_segment(t, ref_rules))
    got = bpe_vocab_counts(ds, merges).to_pandas()
    got_c = dict(zip(got["token"], got["n"]))
    assert got_c == dict(want)
    assert any(len(tok) > 1 for tok in got_c), "no multi-char BPE token"


def test_bpe_train_matches_duckdb_oracle_chain(ray_session):
    """The engine merge table equals a DuckDB CTE chain replaying the
    same procedure (pair counts over the wrapped word-freq table, argmax
    with the wrapped tie-break, single replace per round) on the driver
    test corpus — the same construction the flatten_tokens oracle arm
    uses."""
    import duckdb

    from crawlray.ops.bpe import bpe_train

    DOCS = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    K = 6
    got = bpe_train(ds, num_merges=K).to_pylist()

    parts = [
        """
        WITH wf AS (
            SELECT token, COUNT(*) AS freq
            FROM (SELECT UNNEST(str_split(text, ' ')) AS token
                  FROM documents)
            WHERE regexp_matches(token, '^[a-z]+$')
            GROUP BY token),
        w0 AS (SELECT rtrim(regexp_replace(token, '(.)', '|\\1| ', 'g'))
                      AS sym, freq FROM wf)
        """
    ]
    for r in range(K):
        parts.append(
            f"""
        , p{r} AS (
            SELECT t[i] AS w1, t[i+1] AS w2, SUM(freq) AS cnt
            FROM (SELECT str_split(sym, ' ') AS t, freq FROM w{r}),
                 UNNEST(range(1, len(t))) u(i)
            GROUP BY w1, w2)
        , b{r} AS (
            SELECT w1, w2, cnt, w1 || ' ' || w2 AS pat,
                   '|' || trim(w1, '|') || trim(w2, '|') || '|' AS rep
            FROM p{r} ORDER BY cnt DESC, w1, w2 LIMIT 1)
        , w{r + 1} AS (
            SELECT replace(w{r}.sym, b{r}.pat, b{r}.rep) AS sym, freq
            FROM w{r}, b{r})
        """
        )
    sel = " UNION ALL ".join(
        f"SELECT {r} AS rank, trim(w1,'|') AS l, trim(w2,'|') AS rt, cnt "
        f"FROM b{r}"
        for r in range(K)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')"
    )
    want = con.sql("".join(parts) + sel + " ORDER BY rank").fetchall()
    assert [(g["left"], g["right"], g["cnt"]) for g in got] == [
        (w[1], w[2], w[3]) for w in want
    ]
