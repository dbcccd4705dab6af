"""Token filters.

Each filter maps ``list[Token] -> list[Token]`` where
``Token = (term, position, start, end)``. Behavior mirrors the reference's
token-filter set (/root/reference/analysis/token/*); citations inline.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable, List

from .porter import porter_stem
from .stopwords_en import ENGLISH_STOP_WORDS
from .tokenizers import Token


def lowercase_filter(tokens: List[Token]) -> List[Token]:
    """Unicode lowercase (ref: token/lowercase/lowercase.go:37-42)."""
    return [(t[0].lower(), t[1], t[2], t[3]) for t in tokens]


def make_stop_filter(stopset: Iterable[str] = ENGLISH_STOP_WORDS):
    """Drop stop terms, keep survivors' original positions — position gaps
    are load-bearing for phrase semantics (ref: token/stop/stop.go:40-52)."""
    s = frozenset(stopset)

    def stop_filter(tokens: List[Token]) -> List[Token]:
        return [t for t in tokens if t[0] not in s]

    return stop_filter


stop_en_filter = make_stop_filter()


def porter_filter(tokens: List[Token]) -> List[Token]:
    """Porter stemming (ref: token/porter/porter.go:35-45)."""
    return [(porter_stem(t[0]), t[1], t[2], t[3]) for t in tokens]


def _rune_class(ch: str) -> str:
    if ch.islower():
        return "lower"
    if ch.isupper():
        return "upper"
    if ch.isnumeric():
        return "number"
    return "other"


# ASCII fast path: one regex alternation encodes the same greedy class
# split as the reference parser. [A-Z]+(?![a-z]) backtracks so that an
# upper followed by a lower starts a new Word (HTTPServer -> HTTP, Server).
_CAMEL_ASCII = re.compile(r"[a-z]+|[A-Z][a-z]+|[A-Z]+(?![a-z])|[0-9]+|[^a-zA-Z0-9]+")


def _camel_split(term: str) -> List[str]:
    if term.isascii():
        return _CAMEL_ASCII.findall(term)
    return _camel_split_slow(term)


def _camel_split_slow(term: str) -> List[str]:
    """Greedy one-pass class split, faithful to the reference parser
    (ref: token/camelcase/parser.go + states.go): classes are
    lower-run, Upper[+lower-run | +UPPER-run], number-run, symbol-run;
    an upper followed by a lower starts a new Word (HTTPServer -> HTTP,
    Server)."""
    if not term:
        return []
    parts: List[str] = []
    buf = [term[0]]
    # state: class of current run; for upper-started runs track whether
    # we're collecting uppers or went Upper+lower (states.go:42-67)
    cls = _rune_class(term[0])
    collecting_upper = cls == "upper"
    started = False
    for i in range(1, len(term)):
        ch = term[i]
        peek = term[i + 1] if i + 1 < len(term) else None
        c = _rune_class(ch)
        if cls == "upper":
            member = c in ("upper", "lower")
            if member and c == "upper" and peek is not None and _rune_class(peek) == "lower":
                member = False
            if member and started:
                member = collecting_upper == (c == "upper")
            if member and not started:
                started = True
                collecting_upper = c == "upper"
        else:
            member = c == cls
        if member:
            buf.append(ch)
        else:
            parts.append("".join(buf))
            buf = [ch]
            cls = c
            collecting_upper = c == "upper"
            started = False
    parts.append("".join(buf))
    return parts


def camelcase_filter(tokens: List[Token]) -> List[Token]:
    """Split identifiers by case/digit/symbol classes — the key filter for
    the source-code payload (ref: token/camelcase/camelcase.go:27-70).
    Positions are renumbered sequentially across all emitted sub-tokens,
    exactly as the reference parser does (camelcase.go:55-70)."""
    out: List[Token] = []
    pos = 0
    for term, _p, start, _e in tokens:
        if term == "":
            pos += 1
            out.append(("", pos, start, start))
            continue
        idx = start
        for part in _camel_split(term):
            pos += 1
            out.append((part, pos, idx, idx + len(part)))
            idx += len(part)
    return out


def make_length_filter(min_len: int = 1, max_len: int = 0):
    """Drop tokens outside [min,max] rune length (ref: token/length/length.go)."""

    def length_filter(tokens: List[Token]) -> List[Token]:
        return [
            t
            for t in tokens
            if len(t[0]) >= min_len and (max_len <= 0 or len(t[0]) <= max_len)
        ]

    return length_filter


def unique_filter(tokens: List[Token]) -> List[Token]:
    """Keep first occurrence of each term (ref: token/unique/unique.go)."""
    seen = set()
    out = []
    for t in tokens:
        if t[0] not in seen:
            seen.add(t[0])
            out.append(t)
    return out


def reverse_filter(tokens: List[Token]) -> List[Token]:
    """Reverse term runes (ref: token/reverse/reverse.go)."""
    return [(t[0][::-1], t[1], t[2], t[3]) for t in tokens]


def make_truncate_filter(length: int):
    """Cap term length (ref: token/truncate/truncate.go)."""

    def truncate_filter(tokens: List[Token]) -> List[Token]:
        return [(t[0][:length], t[1], t[2], t[3]) for t in tokens]

    return truncate_filter


def apostrophe_filter(tokens: List[Token]) -> List[Token]:
    """Truncate at apostrophe (ref: token/apostrophe/apostrophe.go)."""
    out = []
    for t in tokens:
        term = t[0]
        for ap in ("'", "’"):
            i = term.find(ap)
            if i >= 0:
                term = term[:i]
        out.append((term, t[1], t[2], t[3]))
    return out


def make_unicodenorm_filter(form: str = "NFKC"):
    """NFC/NFD/NFKC/NFKD (ref: token/unicodenorm/unicodenorm.go)."""

    def unicodenorm(tokens: List[Token]) -> List[Token]:
        return [(unicodedata.normalize(form, t[0]), t[1], t[2], t[3]) for t in tokens]

    return unicodenorm


def make_edge_ngram_filter(min_n: int, max_n: int, back: bool = False):
    """Front/back edge n-grams (ref: token/edgengram/edgengram.go:47)."""

    def edge_ngram(tokens: List[Token]) -> List[Token]:
        out = []
        for term, pos, start, end in tokens:
            for n in range(min_n, max_n + 1):
                if n > len(term):
                    break
                gram = term[-n:] if back else term[:n]
                out.append((gram, pos, start, end))
        return out

    return edge_ngram


def make_ngram_filter(min_n: int, max_n: int):
    """All n-grams min..max per term (ref: token/ngram/ngram.go)."""

    def ngram(tokens: List[Token]) -> List[Token]:
        out = []
        for term, pos, start, end in tokens:
            for n in range(min_n, max_n + 1):
                for i in range(0, len(term) - n + 1):
                    out.append((term[i : i + n], pos, start, end))
        return out

    return ngram


def make_shingle_filter(
    min_n: int, max_n: int, sep: str = " ", output_original: bool = False
):
    """Word n-grams over adjacent tokens (ref: token/shingle/shingle.go:35-169)."""

    def shingle(tokens: List[Token]) -> List[Token]:
        out = []
        for i, tok in enumerate(tokens):
            if output_original:
                out.append(tok)
            for n in range(min_n, max_n + 1):
                if i + n > len(tokens):
                    break
                window = tokens[i : i + n]
                term = sep.join(w[0] for w in window)
                out.append((term, tok[1], tok[2], window[-1][3]))
        return out

    return shingle


def make_hierarchy_filter(delimiter: str = "/"):
    """Path hierarchy: a/b/c -> a, a/b, a/b/c (ref: token/hierarchy/hierarchy.go)."""

    def hierarchy(tokens: List[Token]) -> List[Token]:
        out = []
        for term, pos, start, _end in tokens:
            parts = term.split(delimiter)
            acc = []
            for part in parts:
                acc.append(part)
                joined = delimiter.join(acc)
                out.append((joined, pos, start, start + len(joined)))
        return out

    return hierarchy


def make_keyword_marker_filter(keywords: Iterable[str]):
    """Mark terms as keywords by exempting them from downstream stemming;
    we model it as a wrapper that protects matching terms
    (ref: token/keyword/keyword.go)."""
    kw = frozenset(keywords)

    def wrap(stemmer):
        def filt(tokens: List[Token]) -> List[Token]:
            out = []
            for t in tokens:
                if t[0] in kw:
                    out.append(t)
                else:
                    out.extend(stemmer([t]))
            return out

        return filt

    return wrap


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF  # CJK unified
        or 0x3400 <= cp <= 0x4DBF  # ext A
        or 0xF900 <= cp <= 0xFAFF  # compat ideographs
        or 0x3040 <= cp <= 0x30FF  # hiragana + katakana
        or 0x31F0 <= cp <= 0x31FF  # katakana ext
        or 0xAC00 <= cp <= 0xD7AF  # hangul
    )


def cjk_width_filter(tokens: List[Token]) -> List[Token]:
    """Fold full-width ASCII to half-width and half-width katakana to
    full-width (ref: analysis/lang/cjk/cjk_width.go) — NFKC performs
    exactly these two foldings."""
    import unicodedata

    return [
        (unicodedata.normalize("NFKC", t[0]), t[1], t[2], t[3])
        for t in tokens
    ]


def make_cjk_bigram_filter(output_unigram: bool = False):
    """Bigram consecutive CJK ideographs (ref: analysis/lang/cjk/
    cjk_bigram.go). The unicode tokenizer emits CJK runs as one token;
    this splits each run into overlapping bigrams (plus unigrams when
    requested or for isolated single ideographs); non-CJK tokens pass
    through unchanged."""

    def cjk_bigram(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        pos = 0
        for term, _p, start, end in tokens:
            if len(term) >= 1 and all(_is_cjk(c) for c in term):
                if len(term) == 1:
                    pos += 1
                    out.append((term, pos, start, end))
                    continue
                for i in range(len(term) - 1):
                    pos += 1
                    if output_unigram:
                        out.append((term[i], pos, start + i, start + i + 1))
                    out.append((term[i : i + 2], pos, start + i, start + i + 2))
                if output_unigram:
                    pos += 1
                    out.append((term[-1], pos, end - 1, end))
            else:
                pos += 1
                out.append((term, pos, start, end))
        return out

    return cjk_bigram


def make_dict_compound_filter(
    words: Iterable[str], min_sub_len: int = 3, max_sub_len: int = 15,
    only_longest: bool = False,
):
    """Decompose compound words via a dictionary (ref: analysis/token/
    compound/dict.go): every dictionary word of length [min,max] found as
    a substring of a token is emitted as an extra token at the same
    position; the original token is kept."""
    dictionary = frozenset(w.lower() for w in words)

    def dict_compound(tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        for term, p, start, end in tokens:
            out.append((term, p, start, end))
            low = term.lower()
            found = []
            for i in range(len(low)):
                for n in range(min_sub_len, min(max_sub_len, len(low) - i) + 1):
                    sub = low[i : i + n]
                    if sub in dictionary and sub != low:
                        found.append((sub, i, n))
            if only_longest and found:
                found = [max(found, key=lambda f: f[2])]
            for sub, i, n in found:
                out.append((sub, p, start + i, start + i + n))
        return out

    return dict_compound


def make_elision_filter(articles: Iterable[str]):
    """Strip leading article + apostrophe: l'avion -> avion
    (ref: token/elision/elision.go)."""
    arts = frozenset(a.lower() for a in articles)

    def elision(tokens: List[Token]) -> List[Token]:
        out = []
        for term, pos, start, end in tokens:
            for ap in ("'", "’"):
                i = term.find(ap)
                if i >= 0 and term[:i].lower() in arts:
                    term = term[i + 1 :]
                    break
            out.append((term, pos, start, end))
        return out

    return elision
