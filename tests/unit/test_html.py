"""RBC-8 span + outlink extraction on handcrafted HTML (offsets matter)."""

from crawlray.kernels.html import parse_page


def test_spans_interleaved_with_offsets():
    src = '<p>Hello</p> <img src="/a.png"> tail &amp; end'
    spans, links = parse_page(src, "http://h.example/p/1")
    assert [s.kind for s in spans] == ["text", "media", "text"]
    assert spans[0].text == "Hello"
    assert spans[0].offset == src.index("Hello")
    assert spans[1].media_ref == "http://h.example/a.png"
    assert spans[1].offset == src.index('<img')
    assert spans[2].text == "tail & end"  # entity-decoded
    assert spans[2].offset == src.index("tail")
    assert links == []


def test_outlinks_canonical_dedup_order():
    base = "http://h.example/p/2"
    src = (
        '<a href="/p/3">a</a>'
        '<a href="http://H.EXAMPLE:80/p/4#x">b</a>'
        '<a href="../p/3">dup of first</a>'
        '<a href="/style.css">denied ext</a>'
        '<a href="mailto:x@y">no host</a>'
        '<a href="/p/5">c</a>'
    )
    spans, links = parse_page(src, base)
    assert links == [
        "http://h.example/p/3",
        "http://h.example/p/4",
        "http://h.example/p/5",
    ]


def test_comments_and_empty():
    spans, links = parse_page("<!-- <a href='/x'>hidden</a> -->", "http://h.example/")
    assert spans == [] and links == []
    spans, links = parse_page("", "http://h.example/")
    assert spans == [] and links == []
    spans, links = parse_page("   \n\t  ", "http://h.example/")
    assert spans == []


def test_media_only_and_text_only():
    spans, _ = parse_page('<img src="x.png"><img src="y.png">', "http://h.example/d/")
    assert [s.kind for s in spans] == ["media", "media"]
    assert spans[0].media_ref == "http://h.example/d/x.png"
    spans, _ = parse_page("just words", "http://h.example/")
    assert [s.kind for s in spans] == ["text"]
    assert spans[0].offset == 0


def test_self_link_kept():
    base = "http://h.example/p/1"
    _, links = parse_page('<a href="/p/1">self</a>', base)
    assert links == [base]


def test_enrich_batch_matches_enrich_doc():
    """enrich_batch is the vectorized form of enrich_doc — outputs must be
    identical element-wise, including whitespace/empty edge cases."""
    import random

    from crawlray.stages import enrich_batch, enrich_doc

    cases = [
        "", " ", "one", "a b c", "the of and a to in is it",
        "der die das und ist", "le la les et est", "el la los y es",
        "x " * 500, "tab\tsep\nnewline  multi  space ",
    ]
    rng = random.Random(7)
    words = ["alpha", "beta", "the", "of", "und", "der", "le", "la", "es"]
    for _ in range(150):
        cases.append(
            " ".join(rng.choice(words) for _ in range(rng.randint(0, 300)))
        )
    want = [enrich_doc(t) for t in cases]
    got = list(zip(*enrich_batch(cases)))
    assert got == want
    assert enrich_batch([]) == ([], [], [])
