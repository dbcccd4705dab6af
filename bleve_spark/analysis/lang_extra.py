"""Extended language packs: ar / fa / hi / ckb analyzers, the EN
possessive filter, ca/ga elision filters, and named stop filters for
every remaining reference language pack.

Chains (all lowercase via the shared filter unless noted):
  ar:  unicode -> lower -> unicodenorm(NFKC) -> stop_ar -> normalize_ar
       -> stemmer_ar                  (ref: analysis/lang/ar/*)
  fa:  charfilter zero-width -> unicode -> lower -> normalize_ar ->
       normalize_fa -> stop_fa        (ref: analysis/lang/fa/*)
  hi:  unicode -> lower -> normalize_in -> normalize_hi -> stop_hi ->
       stemmer_hi                     (ref: analysis/lang/hi/*, lang/in/*)
  ckb: unicode -> normalize_ckb -> lower -> stop_ckb -> stemmer_ckb
                                        (ref: analysis/lang/ckb/*)

Snowball-dependent analyzers: da/no/sv/nl/ru are registered via
analysis/snowball.py (hand-implemented Snowball algorithms); hr via
lang_hr.py (native rule stemmer). fi/hu/ro/tr/pl expose their stop
lists as named filters (stop_filter('fi') etc.) for custom chains but
register no analyzer — a stop-only chain would silently diverge from
the reference's stemmed output, and those four Snowball algorithms
(plus pl's stempel trie) are too intricate to re-derive reliably
without a conformance vocabulary to verify against.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, List

from . import stopwords_lang as SW
from .filters import make_elision_filter, make_stop_filter
from .tokenizers import Token

# -- EN possessive (ref: lang/en/possessive_filter_en.go) -------------------

_APOSTROPHES = ("\u2019", "'", "\uff07")


def possessive_filter_en(tokens: List[Token]) -> List[Token]:
    out = []
    for term, pos, start, end in tokens:
        if len(term) >= 2 and term[-1] in ("s", "S") and term[-2] in _APOSTROPHES:
            term = term[:-2]
        out.append((term, pos, start, end))
    return out


# -- Arabic (ref: lang/ar/arabic_normalize.go, stemmer_ar.go) ---------------

_AR_MAP = {
    "\u0622": "\u0627", "\u0623": "\u0627", "\u0625": "\u0627",  # alef forms
    "\u0649": "\u064A",  # dotless yeh -> yeh
    "\u0629": "\u0647",  # teh marbuta -> heh
}
_AR_DELETE = frozenset(
    "\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652"
)  # tatweel + harakat


def arabic_normalize(term: str) -> str:
    return "".join(
        _AR_MAP.get(c, c) for c in term if c not in _AR_DELETE
    )


_AR_PREFIXES = ("\u0627\u0644", "\u0648\u0627\u0644", "\u0628\u0627\u0644",
                "\u0643\u0627\u0644", "\u0641\u0627\u0644", "\u0644\u0644",
                "\u0648")
_AR_SUFFIXES = ("\u0647\u0627", "\u0627\u0646", "\u0627\u062A",
                "\u0648\u0646", "\u064A\u0646", "\u064A\u0647",
                "\u064A\u0629", "\u0647", "\u0629", "\u064A")


def arabic_stem(term: str) -> str:
    s = term
    for p in _AR_PREFIXES:
        # wa- (single-char) prefix needs >=4 chars; others leave >=2
        if len(p) == 1 and len(s) < 4:
            continue
        if len(s) - len(p) >= 2 and s.startswith(p):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) - len(suf) >= 2 and s.endswith(suf):
            s = s[: -len(suf)]
    return s


# -- Persian (ref: lang/fa/persian_normalize.go) ----------------------------

_FA_MAP = {
    "\u06CC": "\u064A", "\u06D2": "\u064A",  # farsi yeh / yeh barree -> yeh
    "\u06A9": "\u0643",  # keheh -> kaf
    "\u06C0": "\u0647", "\u06C1": "\u0647",  # heh forms -> heh
}


def persian_normalize(term: str) -> str:
    return "".join(
        _FA_MAP.get(c, c) for c in term if c != "\u0654"  # hamza above
    )


# -- Sorani / Kurdish (ref: lang/ckb/sorani_normalize.go, stemmer) ----------


def sorani_normalize(term: str) -> str:
    out: List[str] = []
    last = len(term) - 1
    for j, c in enumerate(term):
        if c in ("\u064A", "\u0649"):
            out.append("\u06CC")  # yeh forms -> farsi yeh
        elif c == "\u0643":
            out.append("\u06A9")  # kaf -> keheh
        elif c == "\u200C":  # zwnj deleted; preceding heh -> ae
            if out and out[-1] == "\u0647":
                out[-1] = "\u06D5"
        elif c == "\u0647":
            # heh at the end of the (not-yet-shortened) term -> ae,
            # mirroring the reference's in-place index check
            out.append("\u06D5" if j == last else c)
        elif c == "\u0629":
            out.append("\u06D5")  # teh marbuta -> ae
        elif c == "\u06BE":
            out.append("\u0647")  # heh doachashmee -> heh
        elif c == "\u0631":
            out.append("\u0695" if not out else c)  # initial reh -> rreh
        elif c == "\u0692":
            out.append("\u0695")  # rreh-above -> rreh
        elif c in "\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652":
            continue  # tatweel + harakat deleted
        elif unicodedata.category(c) == "Cf":
            continue  # other format chars deleted
        else:
            out.append(c)
    return "".join(out)


def sorani_stem(term: str) -> str:
    s = term
    # postposition
    if len(s) > 5 and s.endswith("\u062F\u0627"):
        s = s[:-2]
    elif len(s) > 4 and s.endswith("\u0646\u0627"):
        s = s[:-1]
    elif len(s) > 6 and s.endswith("\u06D5\u0648\u06D5"):
        s = s[:-3]
    # possessive pronoun
    if len(s) > 6 and (
        s.endswith("\u0645\u0627\u0646")
        or s.endswith("\u06CC\u0627\u0646")
        or s.endswith("\u062A\u0627\u0646")
    ):
        s = s[:-3]
    # ezafe / definiteness / plurality ladder (ref stem():33-80)
    n = len(s)
    if n > 6 and s.endswith("\u06CE\u06A9\u06CC"):
        return s[:-3]
    if n > 7 and s.endswith("\u06CC\u06D5\u06A9\u06CC"):
        return s[:-4]
    if n > 5 and s.endswith("\u06CE\u06A9"):
        return s[:-2]
    if n > 6 and s.endswith("\u06CC\u06D5\u06A9"):
        return s[:-3]
    if n > 6 and s.endswith("\u06D5\u06A9\u06D5"):
        return s[:-3]
    if n > 5 and s.endswith("\u06A9\u06D5"):
        return s[:-2]
    if n > 7 and s.endswith("\u06D5\u06A9\u0627\u0646"):
        return s[:-4]
    if n > 6 and s.endswith("\u06A9\u0627\u0646"):
        return s[:-3]
    if n > 7 and s.endswith("\u06CC\u0627\u0646\u06CC"):
        return s[:-4]
    if n > 6 and s.endswith("\u0627\u0646\u06CC"):
        return s[:-3]
    if n > 6 and s.endswith("\u06CC\u0627\u0646"):
        return s[:-3]
    if n > 5 and s.endswith("\u0627\u0646"):
        return s[:-2]
    if n > 7 and s.endswith("\u06CC\u0627\u0646\u06D5"):
        return s[:-4]
    if n > 6 and s.endswith("\u0627\u0646\u06D5"):
        return s[:-3]
    if n > 5 and (
        s.endswith("\u0627\u06CC\u06D5") or s.endswith("\u06D5\u06CC\u06D5")
    ):
        return s[:-2]
    if n > 4 and s.endswith("\u06D5"):
        return s[:-1]
    if n > 4 and s.endswith("\u06CC"):
        return s[:-1]
    return s


# -- Hindi (ref: lang/hi/hindi_normalize.go, hindi_stemmer_filter.go) -------

_HI_MAP = {
    "\u0901": "\u0902",
    "\u0929": "\u0928", "\u0931": "\u0930", "\u0934": "\u0933",
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095A": "\u0917",
    "\u095B": "\u091C", "\u095C": "\u0921", "\u095D": "\u0922",
    "\u095E": "\u092B", "\u095F": "\u092F",
    "\u0945": "\u0947", "\u0946": "\u0947",
    "\u0949": "\u094B", "\u094A": "\u094B",
    "\u090D": "\u090F", "\u090E": "\u090F",
    "\u0911": "\u0913", "\u0912": "\u0913",
    "\u0972": "\u0905",
    "\u0906": "\u0905", "\u0908": "\u0907", "\u090A": "\u0909",
    "\u0960": "\u090B", "\u0961": "\u090C",
    "\u0910": "\u090F", "\u0914": "\u0913",
    "\u0940": "\u093F", "\u0942": "\u0941", "\u0944": "\u0943",
    "\u0963": "\u0962", "\u0948": "\u0947", "\u094C": "\u094B",
}
_HI_DELETE = frozenset(("\u093C", "\u200D", "\u200C", "\u094D"))


def hindi_normalize(term: str) -> str:
    out: List[str] = []
    i = 0
    while i < len(term):
        c = term[i]
        if c == "\u0928" and i + 1 < len(term) and term[i + 1] == "\u094D":
            out.append("\u0902")  # dead n -> bindu
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(c, c))
        i += 1
    return "".join(out)


_HI_STEM_GROUPS = (
    (6, 5, ('ाएंगी', 'ाएंगे', 'ाऊंगी', 'ाऊंगा', 'ाइयाँ', 'ाइयों', 'ाइयां')),
    (5, 4, ('ाएगी', 'ाएगा', 'ाओगी', 'ाओगे', 'एंगी', 'ेंगी', 'एंगे', 'ेंगे', 'ूंगी', 'ूंगा', 'ातीं', 'नाओं', 'नाएं', 'ताओं', 'ताएं', 'ियाँ', 'ियों', 'ियां')),
    (4, 3, ('ाकर', 'ाइए', 'ाईं', 'ाया', 'ेगी', 'ेगा', 'ोगी', 'ोगे', 'ाने', 'ाना', 'ाते', 'ाती', 'ाता', 'तीं', 'ाओं', 'ाएं', 'ुओं', 'ुएं', 'ुआं')),
    (3, 2, ('कर', 'ाओ', 'िए', 'ाई', 'ाए', 'ने', 'नी', 'ना', 'ते', 'ीं', 'ती', 'ता', 'ाँ', 'ां', 'ों', 'ें')),
    (2, 1, ('ो', 'े', 'ू', 'ु', 'ी', 'ि', 'ा')),
)


def hindi_stem(term: str) -> str:
    n = len(term)
    for minlen, trunc, sufs in _HI_STEM_GROUPS:
        if n > minlen and term.endswith(sufs):
            return term[:-trunc]
    return term


# -- Indic script normalization (ref: lang/in/scripts.go) -------------------

_INDIC_BASES = (
    0x0900, 0x0980, 0x0A00, 0x0A80, 0x0B00, 0x0B80, 0x0C00, 0x0C80, 0x0D00,
)
_DEVA, _BENG, _GURM, _GUJA, _ORIYA, _TAMIL, _TELU, _KANN, _MALA = (
    1, 2, 4, 8, 16, 32, 64, 128, 256,
)
_BASE_FLAG = {
    0x0900: _DEVA, 0x0980: _BENG, 0x0A00: _GURM, 0x0A80: _GUJA,
    0x0B00: _ORIYA, 0x0B80: _TAMIL, 0x0C00: _TELU, 0x0C80: _KANN,
    0x0D00: _MALA,
}
# (ch0, ch1, ch2-or-neg, composed, script-flags); 0xFF ch2 = ZWJ
_INDIC_DECOMP = (
    (0x05, 0x3E, 0x45, 0x11, _DEVA | _GUJA),
    (0x05, 0x3E, 0x46, 0x12, _DEVA),
    (0x05, 0x3E, 0x47, 0x13, _DEVA | _GUJA),
    (0x05, 0x3E, 0x48, 0x14, _DEVA | _GUJA),
    (0x05, 0x3E, -1, 0x06, _DEVA | _BENG | _GURM | _GUJA | _ORIYA),
    (0x05, 0x45, -1, 0x72, _DEVA),
    (0x05, 0x45, -1, 0x0D, _GUJA),
    (0x05, 0x46, -1, 0x04, _DEVA),
    (0x05, 0x47, -1, 0x0F, _GUJA),
    (0x05, 0x48, -1, 0x10, _GURM | _GUJA),
    (0x05, 0x49, -1, 0x11, _DEVA | _GUJA),
    (0x05, 0x4A, -1, 0x12, _DEVA),
    (0x05, 0x4B, -1, 0x13, _DEVA | _GUJA),
    (0x05, 0x4C, -1, 0x14, _DEVA | _GURM | _GUJA),
    (0x06, 0x45, -1, 0x11, _DEVA | _GUJA),
    (0x06, 0x46, -1, 0x12, _DEVA),
    (0x06, 0x47, -1, 0x13, _DEVA | _GUJA),
    (0x06, 0x48, -1, 0x14, _DEVA | _GUJA),
    (0x07, 0x57, -1, 0x08, _MALA),
    (0x09, 0x41, -1, 0x0A, _DEVA),
    (0x09, 0x57, -1, 0x0A, _TAMIL | _MALA),
    (0x0E, 0x46, -1, 0x10, _MALA),
    (0x0F, 0x45, -1, 0x0D, _DEVA),
    (0x0F, 0x46, -1, 0x0E, _DEVA),
    (0x0F, 0x47, -1, 0x10, _DEVA),
    (0x0F, 0x57, -1, 0x10, _ORIYA),
    (0x12, 0x3E, -1, 0x13, _MALA),
    (0x12, 0x4C, -1, 0x14, _TELU | _KANN),
    (0x12, 0x55, -1, 0x13, _TELU),
    (0x12, 0x57, -1, 0x14, _TAMIL | _MALA),
    (0x13, 0x57, -1, 0x14, _ORIYA),
    (0x15, 0x3C, -1, 0x58, _DEVA),
    (0x16, 0x3C, -1, 0x59, _DEVA | _GURM),
    (0x17, 0x3C, -1, 0x5A, _DEVA | _GURM),
    (0x1C, 0x3C, -1, 0x5B, _DEVA | _GURM),
    (0x21, 0x3C, -1, 0x5C, _DEVA | _BENG | _ORIYA),
    (0x22, 0x3C, -1, 0x5D, _DEVA | _BENG | _ORIYA),
    (0x23, 0x4D, 0xFF, 0x7A, _MALA),
    (0x24, 0x4D, 0xFF, 0x4E, _BENG),
    (0x28, 0x3C, -1, 0x29, _DEVA),
    (0x28, 0x4D, 0xFF, 0x7B, _MALA),
    (0x2B, 0x3C, -1, 0x5E, _DEVA | _GURM),
    (0x2F, 0x3C, -1, 0x5F, _DEVA | _BENG),
    (0x2C, 0x41, 0x41, 0x0B, _TELU),
    (0x30, 0x3C, -1, 0x31, _DEVA),
    (0x30, 0x4D, 0xFF, 0x7C, _MALA),
    (0x32, 0x4D, 0xFF, 0x7D, _MALA),
    (0x33, 0x3C, -1, 0x34, _DEVA),
    (0x33, 0x4D, 0xFF, 0x7E, _MALA),
    (0x35, 0x41, -1, 0x2E, _TELU),
    (0x3E, 0x45, -1, 0x49, _DEVA | _GUJA),
    (0x3E, 0x46, -1, 0x4A, _DEVA),
    (0x3E, 0x47, -1, 0x4B, _DEVA | _GUJA),
    (0x3E, 0x48, -1, 0x4C, _DEVA | _GUJA),
    (0x3F, 0x55, -1, 0x40, _KANN),
    (0x41, 0x41, -1, 0x42, _GURM),
    (0x46, 0x3E, -1, 0x4A, _TAMIL | _MALA),
    (0x46, 0x42, 0x55, 0x4B, _KANN),
    (0x46, 0x42, -1, 0x4A, _KANN),
    (0x46, 0x46, -1, 0x48, _MALA),
    (0x46, 0x55, -1, 0x47, _TELU | _KANN),
    (0x46, 0x56, -1, 0x48, _TELU | _KANN),
    (0x46, 0x57, -1, 0x4C, _TAMIL | _MALA),
    (0x47, 0x3E, -1, 0x4B, _BENG | _ORIYA | _TAMIL | _MALA),
    (0x47, 0x57, -1, 0x4C, _BENG | _ORIYA),
    (0x4A, 0x55, -1, 0x4B, _KANN),
    (0x72, 0x3F, -1, 0x07, _GURM),
    (0x72, 0x40, -1, 0x08, _GURM),
    (0x72, 0x47, -1, 0x0F, _GURM),
    (0x73, 0x41, -1, 0x09, _GURM),
    (0x73, 0x42, -1, 0x0A, _GURM),
    (0x73, 0x4B, -1, 0x13, _GURM),
)


def _indic_base(cp: int):
    for b in _INDIC_BASES:
        if b <= cp < b + 0x80:
            return b
    return None


def indic_normalize(term: str) -> str:
    runes = list(term)
    i = 0
    while i < len(runes):
        cp = ord(runes[i])
        base = _indic_base(cp)
        if base is not None:
            flag = _BASE_FLAG[base]
            ch0 = cp - base
            if i + 1 < len(runes):
                b1 = _indic_base(ord(runes[i + 1]))
                if b1 == base:
                    ch1 = ord(runes[i + 1]) - base
                    ch2 = -1
                    if i + 2 < len(runes):
                        if runes[i + 2] == "\u200D":
                            ch2 = 0xFF
                        elif _indic_base(ord(runes[i + 2])) == base:
                            ch2 = ord(runes[i + 2]) - base
                    for d0, d1, d2, comp, flags in _INDIC_DECOMP:
                        if (
                            d0 == ch0
                            and (flags & flag)
                            and d1 == ch1
                            and (d2 < 0 or d2 == ch2)
                        ):
                            runes[i] = chr(base + comp)
                            del runes[i + 1]
                            if d2 >= 0:
                                del runes[i + 1]
                            break
        i += 1
    return "".join(runes)


# -- token-filter wrappers + registration ----------------------------------


def _term_filter(fn):
    def filt(tokens: List[Token]) -> List[Token]:
        return [(fn(t), p, s, e) for t, p, s, e in tokens]

    return filt


arabic_normalize_filter = _term_filter(arabic_normalize)
arabic_stem_filter = _term_filter(arabic_stem)
persian_normalize_filter = _term_filter(persian_normalize)
sorani_normalize_filter = _term_filter(sorani_normalize)
sorani_stem_filter = _term_filter(sorani_stem)
hindi_normalize_filter = _term_filter(hindi_normalize)
hindi_stem_filter = _term_filter(hindi_stem)
indic_normalize_filter = _term_filter(indic_normalize)

_STOP_SETS: Dict[str, frozenset] = {
    lang.lower(): getattr(SW, f"{lang}_STOP_WORDS")
    for lang in (
        "AR BG CA CS CKB DA DE EL ES EU FA FI FR GA GL HI HR HU HY ID IT "
        "NL NO PT RO RU SV TR"
    ).split()
}
_STOP_FILTERS: Dict[str, object] = {}


def stop_filter(lang: str):
    """Named per-language stop filter (ref: lang/*/stop_filter_*.go)."""
    lang = lang.lower()
    if lang not in _STOP_FILTERS:
        _STOP_FILTERS[lang] = make_stop_filter(_STOP_SETS[lang])
    return _STOP_FILTERS[lang]


elision_ca_filter = make_elision_filter(SW.CA_ARTICLES)
elision_ga_filter = make_elision_filter(SW.GA_ARTICLES)


def register_extended_analyzers():
    from . import Analyzer, register_analyzer, zero_width_char_filter
    from .filters import lowercase_filter, make_unicodenorm_filter
    from .tokenizers import unicode_tokenize

    nfkc = make_unicodenorm_filter("NFKC")
    register_analyzer(
        Analyzer(  # ref: lang/ar/analyzer_ar.go
            "ar",
            unicode_tokenize,
            token_filters=[
                lowercase_filter,
                nfkc,
                stop_filter("ar"),
                arabic_normalize_filter,
                arabic_stem_filter,
            ],
        )
    )
    register_analyzer(
        Analyzer(  # ref: lang/fa/analyzer_fa.go
            "fa",
            unicode_tokenize,
            char_filters=[zero_width_char_filter],
            token_filters=[
                lowercase_filter,
                arabic_normalize_filter,
                persian_normalize_filter,
                stop_filter("fa"),
            ],
        )
    )
    register_analyzer(
        Analyzer(  # ref: lang/hi/analyzer_hi.go
            "hi",
            unicode_tokenize,
            token_filters=[
                lowercase_filter,
                indic_normalize_filter,
                hindi_normalize_filter,
                stop_filter("hi"),
                hindi_stem_filter,
            ],
        )
    )
    register_analyzer(
        Analyzer(  # ref: lang/ckb/analyzer_ckb.go
            "ckb",
            unicode_tokenize,
            token_filters=[
                sorani_normalize_filter,
                lowercase_filter,
                stop_filter("ckb"),
                sorani_stem_filter,
            ],
        )
    )


# -- EN plural stemmer (ref: lang/en/plural_stemmer.go, "stemmer_en_plural")

_OES_EXCEPTIONS = ("shoes", "canoes", "oboes")
_CHES_EXCEPTIONS = (
    "cliches", "avalanches", "mustaches", "moustaches", "quiches",
    "headaches", "heartaches", "porsches", "tranches", "caches",
)


def english_plural_stem(word: str) -> str:
    """S-stemmer variant: strip plural s/es/ies with the reference's
    exception lists (suffix match)."""
    w = word.lower()
    if len(w) < 3 or w[-1] != "s":
        return w
    second = w[-2]
    if second in ("u", "s"):
        return w
    if second == "e":
        if len(w) > 4 and w[-3] == "i":
            return w[:-3] + "y"
        if len(w) > 3:
            if len(w) > 4 and w[-3] == "x":
                return w[:-2]
            if w[-3] == "o":
                if w.endswith(_OES_EXCEPTIONS):
                    return w[:-1]
                return w[:-2]
            if len(w) > 4:
                if w[-4] == "s" and w[-3] in ("h", "s"):
                    return w[:-2]
                if w[-4] == "c" and w[-3] == "h":
                    if w.endswith(_CHES_EXCEPTIONS):
                        return w[:-1]
                    return w[:-2]
        return w[:-1]
    return w[:-1]


english_plural_stem_filter = _term_filter(english_plural_stem)
