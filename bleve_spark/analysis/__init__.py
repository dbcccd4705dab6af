"""Analysis framework: CharFilters -> Tokenizer -> TokenFilters.

Mirrors the reference's analyzer pipeline (/root/reference/analysis/
type.go:79-98) and named-component registry (/root/reference/registry/
registry.go). Analyzers execute batch-at-a-time inside Arrow-backed pandas
UDFs (see udfs.py) — no per-row Python dispatch from the JVM side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List

from .filters import (
    camelcase_filter,
    lowercase_filter,
    porter_filter,
    stop_en_filter,
)
from .tokenizers import (
    Token,
    letter_tokenize,
    single_tokenize,
    unicode_tokenize,
    web_tokenize,
    whitespace_tokenize,
)

CharFilter = Callable[[str], str]
Tokenizer = Callable[[str], List[Token]]
TokenFilter = Callable[[List[Token]], List[Token]]

# -- char filters (ref: analysis/char/*) -----------------------------------

_HTML_TAG = re.compile(r"<[^>]*>")


def html_char_filter(text: str) -> str:
    """Replace HTML tags with spaces (ref: char/html/html.go) so offsets of
    the remaining text are preserved."""
    return _HTML_TAG.sub(lambda m: " " * len(m.group(0)), text)


def make_regexp_char_filter(pattern: str, replacement: str) -> CharFilter:
    compiled = re.compile(pattern)
    return lambda text: compiled.sub(replacement, text)


def zero_width_char_filter(text: str) -> str:
    """Replace zero-width (non-)joiners with spaces
    (ref: char/zerowidthnonjoiner)."""
    return text.replace("‌", " ").replace("‍", " ")


# asciifolding: NFKD decomposition + combining-mark strip covers the bulk
# of the reference's 3570-line fold table (char/asciifolding); the
# supplement handles the common codepoints that do not decompose.
_ASCII_SUPPLEMENT = str.maketrans(
    {
        "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
        "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
        "ŋ": "n", "Ŋ": "N", "ı": "i", "ĸ": "q",
        "‘": "'", "’": "'", "‚": "'", "‛": "'",
        "“": '"', "”": '"', "„": '"', "‟": '"',
        "–": "-", "—": "-", "‐": "-", "‑": "-",
        "…": "...", "№": "No",
    }
)


def asciifolding_char_filter(text: str) -> str:
    """Fold accented/decorated characters to their ASCII base
    (ref: analysis/char/asciifolding/asciifolding.go)."""
    import unicodedata

    text = text.translate(_ASCII_SUPPLEMENT)
    decomposed = unicodedata.normalize("NFKD", text)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


# -- analyzer --------------------------------------------------------------


@dataclass
class Analyzer:
    """A named analysis chain (ref: analysis/type.go:79-98)."""

    name: str
    tokenizer: Tokenizer
    char_filters: List[CharFilter] = field(default_factory=list)
    token_filters: List[TokenFilter] = field(default_factory=list)

    fast_termfreq: Callable = None  # optional fused hot path (see below)

    def analyze(self, text: str) -> List[Token]:
        if text is None:
            return []
        for cf in self.char_filters:
            text = cf(text)
        tokens = self.tokenizer(text)
        for tf in self.token_filters:
            tokens = tf(tokens)
        return tokens

    def terms(self, text: str) -> List[str]:
        return [t[0] for t in self.analyze(text)]

    def termfreq(self, text: str):
        """(analyzed_length, {term: [positions]}) — the build path's unit.

        Uses the fused fast path when one exists for this chain (must be
        behavior-identical to the generic path; tested in
        tests/test_analysis.py)."""
        if self.fast_termfreq is not None:
            return self.fast_termfreq(text)
        tokens = self.analyze(text)
        freqs: dict = {}
        for t in tokens:
            freqs.setdefault(t[0], []).append(t[1])
        return len(tokens), freqs


# -- registry (ref: registry/registry.go:23, mapping/index.go:61-147) ------

_REGISTRY: Dict[str, Analyzer] = {}


def register_analyzer(analyzer: Analyzer) -> Analyzer:
    _REGISTRY[analyzer.name] = analyzer
    return analyzer


def get_analyzer(name: str) -> Analyzer:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"no analyzer named {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def analyzer_names() -> List[str]:
    return sorted(_REGISTRY)


# -- fused termfreq fast paths ---------------------------------------------
# Behavior-identical to running the full chain then aggregating; they skip
# building intermediate token tuple lists. Positions are 1-based and, for
# stop-filtered chains, keep their pre-removal numbering (gap semantics,
# ref token/stop/stop.go:40-52); analyzed length counts surviving tokens.

from .filters import _camel_split  # noqa: E402
from .stopwords_en import ENGLISH_STOP_WORDS as _STOP  # noqa: E402
from .tokenizers import _LETTER, _NONSPACE, _UNICODE_WORD  # noqa: E402


def _ft_code(text):
    if not text:
        return 0, {}
    freqs: Dict[str, list] = {}
    pos = 0
    for m in _UNICODE_WORD.finditer(text):
        for part in _camel_split(m.group(0)):
            pos += 1
            freqs.setdefault(part.lower(), []).append(pos)
    return pos, freqs


def _ft_regex_lower_stop(pattern, stopset):
    def ft(text):
        if not text:
            return 0, {}
        freqs: Dict[str, list] = {}
        pos = 0
        n = 0
        for m in pattern.finditer(text):
            pos += 1
            term = m.group(0).lower()
            if term in stopset:
                continue
            n += 1
            freqs.setdefault(term, []).append(pos)
        return n, freqs

    return ft


def _ft_keyword(text):
    if not text:
        return 0, {}
    return 1, {text: [1]}


_FAST_TERMFREQ = {
    "code": _ft_code,
    "standard": _ft_regex_lower_stop(_UNICODE_WORD, _STOP),
    "simple": _ft_regex_lower_stop(_LETTER, frozenset()),
    "whitespace_lower": _ft_regex_lower_stop(_NONSPACE, frozenset()),
    "keyword": _ft_keyword,
}


# built-in analyzers
register_analyzer(
    Analyzer(  # ref: analysis/analyzer/standard/standard.go:27-49
        "standard",
        unicode_tokenize,
        token_filters=[lowercase_filter, stop_en_filter],
    )
)
register_analyzer(
    Analyzer(  # ref: analysis/analyzer/simple/simple.go:26-44
        "simple", letter_tokenize, token_filters=[lowercase_filter]
    )
)
register_analyzer(
    Analyzer("keyword", single_tokenize)  # ref: analyzer/keyword/keyword.go
)
register_analyzer(
    Analyzer(  # ref: analysis/analyzer/web/web.go
        "web", web_tokenize, token_filters=[lowercase_filter, stop_en_filter]
    )
)
def _possessive_en(tokens):
    from .lang_extra import possessive_filter_en

    return possessive_filter_en(tokens)


register_analyzer(
    Analyzer(  # ref: analysis/lang/en/analyzer_en.go:35-66
        # (possessive -> lower -> stop -> porter)
        "en",
        unicode_tokenize,
        token_filters=[
            _possessive_en,
            lowercase_filter,
            stop_en_filter,
            porter_filter,
        ],
    )
)
register_analyzer(
    # The "code" chain for the source-code payload per SURVEY.md §7 stage 1:
    # unicode -> camelCase -> lowercase.
    Analyzer(
        "code",
        unicode_tokenize,
        token_filters=[camelcase_filter, lowercase_filter],
    )
)
register_analyzer(
    # whitespace+lowercase: exact DuckDB-oracle-reproducible chain
    # (string_split on space) used for the driver correctness gate.
    Analyzer("whitespace_lower", whitespace_tokenize, token_filters=[lowercase_filter])
)

for _name, _ft in _FAST_TERMFREQ.items():
    _REGISTRY[_name].fast_termfreq = _ft

# language packs (ref: analysis/lang/*): de/fr/es/it/pt light-stemmer
# chains, ar/fa/hi/ckb normalizer chains, per-language stop filters
from .lang import register_language_analyzers  # noqa: E402
from .lang_extra import register_extended_analyzers  # noqa: E402
from .lang_hr import register_hr_analyzer  # noqa: E402
from .snowball import (  # noqa: E402
    register_nl_analyzer,
    register_snowball_analyzers,
)
from .snowball_ext import register_ext_snowball_analyzers  # noqa: E402

register_language_analyzers()
register_extended_analyzers()
register_hr_analyzer()
register_snowball_analyzers()
register_nl_analyzer()
register_ext_snowball_analyzers()
