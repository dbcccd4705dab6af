"""Highlighting: fragment selection + match formatting for top-k hits.

Re-creates the reference's simple fragmenter + simple highlighter +
html/ansi formatters (/root/reference/search/highlight/fragmenter/simple/
simple.go, highlighter/simple/highlighter_simple.go, format/{html,ansi}).
The reference highlights per hit on stored text + term locations; here the
analyzer re-runs over just the k page rows inside one Arrow-batched pandas
UDF (k is tiny — this is driver-adjacent work by design, exactly like the
reference's LoadAndHighlightFields, index_impl.go:659-714).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Set, Tuple

# ref: search/highlight/format/html/html.go:22-27
HTML_PRE, HTML_POST = "<mark>", "</mark>"
# ref: search/highlight/format/ansi/fragment_formatter_ansi.go (bg yellow)
ANSI_PRE, ANSI_POST = "\x1b[43m", "\x1b[0m"

DEFAULT_FRAGMENT_SIZE = 200  # ref: fragmenter/simple/simple.go:25


@dataclass
class HighlightRequest:
    """ref: search/highlight/highlighter.go:40-58 (HighlightRequest)."""

    fields: Sequence[str] = ()
    style: str = "html"  # "html" | "ansi"
    fragment_size: int = DEFAULT_FRAGMENT_SIZE
    max_fragments: int = 1

    def tags(self) -> Tuple[str, str]:
        if self.style == "ansi":
            return ANSI_PRE, ANSI_POST
        return HTML_PRE, HTML_POST

    def escape_content(self) -> bool:
        return self.style == "html"


def term_locations(
    text: str, analyzer, terms: Set[str]
) -> List[Tuple[int, int]]:
    """(start, end) character offsets of analyzed tokens whose term is in
    the query term set — the re-derived equivalent of the reference's
    stored term vectors."""
    if not text or not terms:
        return []
    return sorted(
        {(t[2], t[3]) for t in analyzer.analyze(text) if t[0] in terms}
    )


def best_fragments(
    text: str,
    locations: List[Tuple[int, int]],
    size: int,
    max_fragments: int,
) -> List[Tuple[int, int, List[Tuple[int, int]]]]:
    """Pick up to max_fragments non-overlapping windows of ~size chars,
    each scored by how many term locations it covers (the reference's
    fragment scorer counts covered locations,
    highlighter/simple/fragment_scorer_simple.go)."""
    if not locations:
        return [(0, min(len(text), size), [])] if text else []
    candidates = []
    for ls, le in locations:
        half = max((size - (le - ls)) // 2, 0)
        start = max(0, ls - half)
        end = min(len(text), start + size)
        start = max(0, min(start, end - size if end - size > 0 else 0))
        covered = [(s, e) for s, e in locations if s >= start and e <= end]
        candidates.append((len(covered), start, end, covered))
    candidates.sort(key=lambda c: (-c[0], c[1]))
    out: List[Tuple[int, int, List[Tuple[int, int]]]] = []
    for _score, start, end, covered in candidates:
        if any(not (end <= s or start >= e) for s, e, _ in out):
            continue  # overlaps an already-chosen fragment
        out.append((start, end, covered))
        if len(out) >= max_fragments:
            break
    return out


def format_fragment(
    text: str,
    start: int,
    end: int,
    covered: List[Tuple[int, int]],
    pre: str,
    post: str,
    escape: bool = False,
) -> str:
    """Wrap covered locations in pre/post tags, with ellipses on clipped
    edges. In html style the document text is entity-escaped while the
    injected tags are not (ref: format/html/html.go Format)."""
    import html as _html

    def seg(s: str) -> str:
        return _html.escape(s, quote=False) if escape else s

    parts = []
    if start > 0:
        parts.append("…")
    cur = start
    for s, e in covered:
        parts.append(seg(text[cur:s]))
        parts.append(pre)
        parts.append(seg(text[s:e]))
        parts.append(post)
        cur = e
    parts.append(seg(text[cur:end]))
    if end < len(text):
        parts.append("…")
    return "".join(parts)


def highlight_text(
    text: str,
    analyzer,
    terms: Set[str],
    size: int = DEFAULT_FRAGMENT_SIZE,
    max_fragments: int = 1,
    pre: str = HTML_PRE,
    post: str = HTML_POST,
    escape: bool = False,
) -> List[str]:
    """Full per-document pipeline: locations -> fragments -> formatted."""
    if text is None:
        return []
    locs = term_locations(text, analyzer, terms)
    frags = best_fragments(text, locs, size, max_fragments)
    return [
        format_fragment(text, s, e, cov, pre, post, escape)
        for s, e, cov in frags
    ]


def highlight_value(
    value,
    analyzer,
    terms: Set[str],
    size: int = DEFAULT_FRAGMENT_SIZE,
    max_fragments: int = 1,
    pre: str = HTML_PRE,
    post: str = HTML_POST,
    escape: bool = False,
) -> List[str]:
    """String or array-of-strings field value -> fragments. For arrays,
    each element is its own Field (ref: document/field.go:26-30): matched
    elements contribute fragments; if none match, every element yields an
    unhighlighted fragment (mirrors whole-value output for non-matching
    highlight fields)."""
    if value is None:
        return []
    if isinstance(value, str):
        return highlight_text(
            value, analyzer, terms, size, max_fragments, pre, post, escape
        )
    matched, plain = [], []
    for el in value:
        if el is None:
            continue
        locs = term_locations(el, analyzer, terms)
        frags = best_fragments(el, locs, size, max_fragments)
        out = [
            format_fragment(el, s, e, cov, pre, post, escape)
            for s, e, cov in frags
        ]
        (matched if locs else plain).extend(out)
    return matched if matched else plain
