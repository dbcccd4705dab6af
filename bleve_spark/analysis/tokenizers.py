"""Tokenizers.

Each tokenizer maps ``text -> list[(term, position, start, end)]`` with
1-based positions and character offsets. Mirrors the behavior of the
reference's tokenizer set (/root/reference/analysis/tokenizer/*), re-done
as regex passes suitable for batch execution inside pandas UDFs.

Offsets note: the reference reports byte offsets
(/root/reference/analysis/tokenizer/unicode/unicode.go:33-131); we report
character offsets, which coincide on ASCII (the parity corpora are ASCII).
"""

from __future__ import annotations

import re
from typing import Callable, List, Tuple

Token = Tuple[str, int, int, int]  # (term, position, start, end)

# UAX#29-style word runs: \w covers ALetter/Numeric/ExtendNumLet (underscore
# glues words, as in UAX#29 WB13a/b — "snake_case" is ONE token, split later
# by the camelCase filter for the code chain). MidLetter apostrophes kept
# inside words ("can't"), matching blevesearch/segment behavior
# (/root/reference/analysis/tokenizer/unicode/unicode.go:113-131).
# Combining marks (category M*) are UAX#29 Extend characters — part of
# the word — but Python's \w excludes them, which would shatter Indic
# and Arabic diacritic-bearing words; fold them into the class.


def _combining_mark_class() -> str:
    """Character-class ranges for BMP combining marks (category M*)."""
    import unicodedata

    ranges = []
    start = prev = None
    for cp in range(0x0300, 0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if start is None:
                start = cp
            prev = cp
        elif start is not None:
            ranges.append((start, prev))
            start = None
    if start is not None:
        ranges.append((start, prev))
    return "".join(
        f"\\u{a:04x}-\\u{b:04x}" if b > a else f"\\u{a:04x}"
        for a, b in ranges
    )


_MARKS = _combining_mark_class()
_W = f"[\\w{_MARKS}]"
_UNICODE_WORD = re.compile(rf"\w{_W}*(?:['’]\w{_W}*)*", re.UNICODE)
_LETTER = re.compile(r"[^\W\d_]+", re.UNICODE)
_NONSPACE = re.compile(r"\S+", re.UNICODE)


def _regex_tokenize(pattern: re.Pattern, text: str) -> List[Token]:
    out = []
    pos = 0
    for m in pattern.finditer(text):
        pos += 1
        out.append((m.group(0), pos, m.start(), m.end()))
    return out


def unicode_tokenize(text: str) -> List[Token]:
    """UAX#29-ish word tokenizer (ref: tokenizer/unicode/unicode.go:33-131)."""
    return _regex_tokenize(_UNICODE_WORD, text)


def letter_tokenize(text: str) -> List[Token]:
    """Runs of letters (ref: tokenizer/letter/letter.go)."""
    return _regex_tokenize(_LETTER, text)


def whitespace_tokenize(text: str) -> List[Token]:
    """Runs of non-space (ref: tokenizer/whitespace/whitespace.go)."""
    return _regex_tokenize(_NONSPACE, text)


def single_tokenize(text: str) -> List[Token]:
    """Whole input as one token (ref: tokenizer/single/single.go)."""
    if text == "":
        return []
    return [(text, 1, 0, len(text))]


def make_regexp_tokenizer(pattern: str) -> Callable[[str], List[Token]]:
    """Tokens are regex matches (ref: tokenizer/regexp/regexp.go)."""
    compiled = re.compile(pattern)

    def tok(text: str) -> List[Token]:
        return _regex_tokenize(compiled, text)

    return tok


# web tokenizer: protect URLs/emails, delegate the rest to unicode
# (ref: tokenizer/web/web.go + tokenizer/exception/exception.go)
_WEB_EXCEPTIONS = re.compile(
    r"""(?:[A-Za-z][A-Za-z0-9+.\-]*://\S+)    # URL
      | (?:[\w.%+\-]+@[\w.\-]+\.[A-Za-z]{2,}) # email
      | (?:@\w+)                              # twitter handle
    """,
    re.VERBOSE,
)


def web_tokenize(text: str) -> List[Token]:
    out: List[Token] = []
    pos = 0
    last = 0

    def emit_plain(seg: str, base: int):
        nonlocal pos
        for m in _UNICODE_WORD.finditer(seg):
            pos += 1
            out.append((m.group(0), pos, base + m.start(), base + m.end()))

    for m in _WEB_EXCEPTIONS.finditer(text):
        emit_plain(text[last : m.start()], last)
        pos += 1
        out.append((m.group(0), pos, m.start(), m.end()))
        last = m.end()
    emit_plain(text[last:], last)
    return out
