"""HTML span + outlink extraction (SURVEY.md RBC-8).

Produces, in source order:
  * spans — one "text" span per maximal character-data run with
    non-whitespace content (text = run stripped + entity-decoded, offset =
    char offset of the first non-whitespace char of the run), and one
    "media" span per ``<img src=...>`` (media_ref = canonicalized resolved
    src, offset = offset of the ``<`` of the tag). The interleaving of text
    and media spans is the payload invariant checked per-row against the
    oracle (BASELINE.json `input_hint`: span-sequence equality).
  * outlinks — every ``<a href=...>`` resolved + canonicalized (RBC-2),
    scope-filtered (RBC-3), deduped within-page keeping first occurrence;
    ``link_idx`` = index in the deduped list, capped at LINK_STRIDE.

Shared by the oracle and the Ray engine (the Ray side calls these functions
inside `map_batches` tasks over the fetched-page batches). The parser is a
regex tokenizer over the well-formed HTML subset that `crawlray/synthgraph.py`
generates (tags without embedded '>', comments allowed, no script/CDATA) —
sufficient for exact-match verification; a production HttpBackend would swap
in a forgiving parser behind the same function signatures.
"""

from __future__ import annotations

import html as _html
import re
from typing import NamedTuple

from crawlray.kernels.url import canonicalize, in_scope
from crawlray.schema import LINK_STRIDE

_TOKEN_RE = re.compile(r"<!--.*?-->|<[^>]*>", re.S)
_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9_-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))"""
)
_NAME_RE = re.compile(r"<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9]*)")


class Span(NamedTuple):
    kind: str  # "text" | "media"
    text: str
    media_ref: str
    offset: int


def _tag_attr(tag_src: str, want: str) -> str | None:
    for m in _ATTR_RE.finditer(tag_src):
        if m.group(1).lower() == want:
            for g in (m.group(2), m.group(3), m.group(4)):
                if g is not None:
                    return g
    return None


def parse_page(html_src: str, base_url: str) -> tuple[list[Span], list[str]]:
    """Parse one page → (spans in document order, deduped canonical outlinks)."""
    spans: list[Span] = []
    outlinks: list[str] = []
    seen_links: set[str] = set()
    pos = 0

    def emit_text(run: str, start: int) -> None:
        stripped = run.strip()
        if not stripped:
            return
        first = start + (len(run) - len(run.lstrip()))
        spans.append(Span("text", _html.unescape(stripped), "", first))

    for m in _TOKEN_RE.finditer(html_src):
        if m.start() > pos:
            emit_text(html_src[pos : m.start()], pos)
        pos = m.end()
        tag_src = m.group(0)
        if tag_src.startswith("<!--"):
            continue
        nm = _NAME_RE.match(tag_src)
        if not nm or nm.group(1):  # closing tag / not a tag name
            continue
        name = nm.group(2).lower()
        if name == "img":
            src = _tag_attr(tag_src, "src")
            if src is not None:
                ref = canonicalize(_html.unescape(src), base=base_url)
                if ref is not None and (
                    ref.startswith("http://") or ref.startswith("https://")
                ):
                    spans.append(Span("media", "", ref, m.start()))
        elif name == "a":
            href = _tag_attr(tag_src, "href")
            if href is not None and len(outlinks) < LINK_STRIDE:
                link = canonicalize(_html.unescape(href), base=base_url)
                if link is not None and in_scope(link) and link not in seen_links:
                    seen_links.add(link)
                    outlinks.append(link)
    if pos < len(html_src):
        emit_text(html_src[pos:], pos)
    return spans, outlinks


def spans_to_dicts(spans: list[Span]) -> list[dict]:
    return [
        {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
        for s in spans
    ]
