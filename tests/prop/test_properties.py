"""Property-based tests (SURVEY.md §5.2.2, hypothesis)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlray.kernels.html import parse_page
from crawlray.kernels.url import canonicalize, in_scope
from crawlray.synthgraph import SynthWeb


@given(st.integers(0, 10_000), st.integers(0, 7))
@settings(max_examples=60, deadline=None)
def test_canonicalize_idempotent_on_messy_hrefs(uid_seed, variant_seed):
    """c(c(u)) == c(u) over the generator's deliberately messy href space."""
    web = SynthWeb(seed=3, shape="zipf_hosts", n_urls=50, n_hosts=5)
    uid = uid_seed % web.n_urls
    targets = web.out_uids(uid)
    if not targets:
        return
    href = web._href_variant(uid, variant_seed % max(1, len(targets)), web.url_of(targets[0]))
    base = web.url_of(uid)
    c1 = canonicalize(href, base=base)
    assert c1 is not None
    assert canonicalize(c1) == c1


@given(st.integers(0, 1 << 30))
@settings(max_examples=25, deadline=None)
def test_parse_outlinks_subset_of_graph_edges(seed):
    """parse(render(url)) outlinks ⊆ the generator's edge set for that url."""
    web = SynthWeb(seed=11, shape="zipf_hosts", n_urls=40, n_hosts=4)
    uid = seed % web.n_urls
    _, links = parse_page(web.page_html(uid), web.url_of(uid))
    edges = {web.url_of(t) for t in web.out_uids(uid)}
    assert set(links) <= edges
    assert all(in_scope(u) for u in links)


@given(perm=st.permutations(list(range(30))))
@settings(max_examples=20, deadline=None)
def test_dedup_keep_first_permutation_invariant(ray_session, perm):
    """O-30/O-38: winners equal python-dict semantics under any row order."""
    import ray.data

    from crawlray.ops.dedup import dedup_keep_first

    keys = [f"k{i % 7}" for i in range(30)]
    orders = list(range(30))
    tbl = pa.table(
        {
            "k": pa.array([keys[i] for i in perm]),
            "o": pa.array([orders[i] for i in perm], pa.int64()),
        }
    )
    got = {
        (r["k"], r["o"])
        for r in dedup_keep_first(ray.data.from_arrow(tbl), "k", "o").take_all()
    }
    want = {}
    for k, o in sorted(zip(keys, orders), key=lambda x: x[1]):
        want.setdefault(k, o)
    assert got == set(want.items())


def test_pack_unpack_roundtrip():
    from crawlray.schema import pack_disc_depth, unpack_disc_depth

    disc = np.array([-(1 << 20), -1, 0, 1, 123456, (1 << 40)], dtype=np.int64)
    depth = np.array([0, 1, 2, 3, 500, 1023], dtype=np.int64)
    p = pack_disc_depth(disc, depth)
    d2, dep2 = unpack_disc_depth(p)
    assert (d2 == disc).all() and (dep2 == depth).all()
    # min(pack) picks min disc_key first
    assert pack_disc_depth(5, 1023) < pack_disc_depth(6, 0)


def test_mg_summary_merge_guarantee_property():
    """MGSummary is a mergeable summary: for ANY split of a stream into
    blocks and any merge order, every estimate undershoots the true count
    by at most the accumulated decrement, which stays <= n/(k+1)."""
    import collections

    import numpy as np

    from crawlray.ops.sketch import MGSummary

    rng = np.random.RandomState(23)
    for trial in range(10):
        n = int(rng.randint(200, 3000))
        vals = [f"v{int(x)}" for x in rng.zipf(1.4, n) % 60]
        true = collections.Counter(vals)
        k = int(rng.randint(4, 24))
        # random split into blocks
        n_blocks = int(rng.randint(1, 9))
        cuts = sorted(rng.randint(0, n, n_blocks - 1).tolist()) if n_blocks > 1 else []
        blocks, prev = [], 0
        for c in cuts + [n]:
            blocks.append(vals[prev:c])
            prev = c
        summaries = []
        for b in blocks:
            s = MGSummary(k)
            cnt = collections.Counter(b)
            s.add_counts(list(cnt.keys()), np.array(list(cnt.values()), np.int64))
            summaries.append(s)
        rng.shuffle(summaries)
        total = summaries[0]
        for s in summaries[1:]:
            total = total.merge(s)
        assert total.n_total == n
        assert total.decremented <= n // (k + 1)
        assert len(total.counts) <= k
        for item, est in total.counts.items():
            assert est <= true[item]
            assert true[item] - est <= total.decremented


@given(
    st.lists(
        st.text(
            alphabet="ab1.-@ <>" + "59",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=120, deadline=None)
def test_redact_pii_chain_idempotent(texts):
    """Applying the sequential PII count-then-replace chain twice is a
    no-op the second time: replacement tokens never complete or extend a
    pattern (no '@' or digit-joining survives pass one), so counts are
    all zero and text is unchanged. The alphabet is biased toward
    pattern-forming chars to make hypothesis's search adversarial."""
    import pyarrow.compute as pc

    from crawlray.ops.corpusprep import DEFAULT_PII_PATTERNS

    def chain(arr):
        counts = []
        for _, pattern, token in DEFAULT_PII_PATTERNS:
            counts.append(
                pc.count_substring_regex(arr, pattern=pattern).to_pylist()
            )
            arr = pc.replace_substring_regex(
                arr, pattern=pattern, replacement=token
            )
        return arr, counts

    arr = pa.array(texts, pa.string())
    once, _ = chain(arr)
    twice, counts2 = chain(once)
    assert twice.to_pylist() == once.to_pylist()
    assert all(c == 0 for cs in counts2 for c in cs)
